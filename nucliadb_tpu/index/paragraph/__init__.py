"""Fuzzy paragraph index: BM25 + fuzzy matching + phrases + ematches.

Parity surface with the reference's nidx_paragraph crate
(nidx_paragraph/src/lib.rs, schema.rs:89-111, fuzzy_query.rs): one document
per paragraph carrying id, text, field, split, position metadata and facets;
searched with fuzzy BM25 (distance 1), quoted-phrase constraints, exact-match
reporting (ematches) and facet filtering.
"""

from __future__ import annotations

import re
import numpy as np

from dataclasses import dataclass, field as dc_field
from typing import Optional

from ...models.internal import ResourceDoc
from ...query_language import BooleanExpression
from ...types import (
    FieldId,
    OpenIndexMetadata,
    PrefilterResult,
    SegmentMetadata,
)
from ..text_engine import DeviceTextEngine, TextQuery
from ..text_engine.builder import DocEntry, build_segment, merge_text_segments, open_text_segment
from ..text_engine.tokenizer import tokenize

_PHRASE_RE = re.compile(r'"([^"]*)"')
_EXCLUDE_RE = re.compile(r'(?:(?<=\s)|^)-(\S+)')


def split_phrases(query: str) -> tuple[str, list[str]]:
    """Extract quoted phrases; returns (remaining query text, phrases)."""
    phrases = [p for p in _PHRASE_RE.findall(query) if p.strip()]
    rest = _PHRASE_RE.sub(" ", query)
    return rest, phrases


def parse_query(query: str) -> tuple[str, list[str], list[str]]:
    """The nidx keyword query grammar (query_parser/tokenizer.rs): literal
    terms, quoted phrases ("..."), excluded terms (-word). Lenient: unclosed
    quotes are dropped. Returns (literal text, phrases, excluded terms)."""
    rest, phrases = split_phrases(query)
    excluded: list[str] = []
    for raw in _EXCLUDE_RE.findall(rest):
        excluded.extend(tokenize(raw))
    rest = _EXCLUDE_RE.sub(" ", rest)
    return rest, phrases, excluded


def phrase_docs_mask(engine, pt: "list[str]") -> np.ndarray:
    """[n_docs] bool: docs containing the phrase terms CONSECUTIVELY.

    Native path (`phrase_scan`, phrase.cpp): one GIL-free pass per
    segment — the rarest term's postings drive a galloping conjunction
    with inline position verification. Python fallback: posting
    intersection + batch verification."""
    n = engine.n_docs
    pm = np.zeros(n, dtype=bool)
    if not pt:
        return pm
    try:
        import nucliadb_tpu_native as _native

        scan = getattr(_native, "phrase_scan", None)
    except ImportError:
        scan = None
    if scan is not None:
        seg_lens = [len(s.dlen) for s in engine.segments]
        offsets = np.concatenate([[0], np.cumsum(seg_lens)]).astype(np.int64)
        for si, seg in enumerate(engine.segments):
            term_docs, term_lo, missing = [], [], False
            for t in pt:
                docs, lo = engine._term_postings_host(si, t)
                if docs is None:
                    missing = True
                    break
                term_docs.append(np.ascontiguousarray(docs, np.int32))
                term_lo.append(int(lo))
            if missing:
                continue
            ids_b = scan(
                term_docs, term_lo,
                np.ascontiguousarray(seg.positions_offsets, np.int64),
                np.ascontiguousarray(seg.positions, np.int32),
            )
            ids = np.frombuffer(ids_b, np.int32)
            if ids.size:
                pm[ids.astype(np.int64) + offsets[si]] = True
        return pm
    cand: "np.ndarray | None" = None
    for t in pt:
        ids = engine.term_doc_ids(t)
        cand = ids if cand is None else np.intersect1d(cand, ids)
        if cand.size == 0:
            break
    if cand is not None and cand.size:
        flags = engine.phrase_match_many(cand.tolist(), pt)
        pm[cand[np.asarray(flags, bool)]] = True
    return pm


def advanced_query_mask(engine, advanced: str) -> np.ndarray:
    """Boolean doc mask for an advanced (tantivy-grammar) query used as a
    Must() filter (parity: nidx_paragraph search_query.rs:202-210 — the
    lenient QueryParser output joins the main query with Occur::Must).
    Tantivy default semantics: positive terms are Should (match >= 1),
    quoted phrases must appear consecutively, -terms must not appear."""
    rest, phrases, excluded = parse_query(advanced)
    terms = tokenize(rest)
    mask = np.zeros(engine.n_docs, dtype=bool)
    if not terms and not phrases:
        mask[:] = True  # nothing positive parsed -> every doc matches
    for t in terms:
        mask[engine.term_doc_ids(t)] = True
    for p in phrases:  # each phrase is a Should peer of the loose terms
        mask |= phrase_docs_mask(engine, tokenize(p))
    for t in excluded:
        mask[engine.term_doc_ids(t)] = False
    return mask


class ParagraphIndexer:
    """Builds paragraph segments from resources (one doc per paragraph)."""

    def index_resource(
        self, resource: ResourceDoc, output_dir: str
    ) -> Optional[SegmentMetadata]:
        if resource.skip_paragraphs:
            return None
        docs: list[DocEntry] = []
        for fid, paragraphs in resource.paragraphs.items():
            field_text = resource.texts.get(fid)
            field_labels = field_text.labels if field_text else []
            for pid, para in paragraphs.items():
                text = ""
                if field_text is not None:
                    text = field_text.text[para.start : para.end]
                # /f/{type} facet (parity: the `field` facet; "/field/x"
                # filters translate to /f/x via the query alias table)
                facets = sorted(
                    set(resource.labels) | set(field_labels) | set(para.labels)
                    | {f"/f/{fid.split('/', 1)[0]}"}
                )
                docs.append(
                    DocEntry(
                        key=pid,
                        text=text,
                        facets=facets,
                        attrs={
                            "field": fid,
                            "rid": resource.resource_id,
                            "split": para.split,
                            "index": para.index,
                            "repeated_in_field": para.repeated_in_field,
                            "start": para.start,
                            "end": para.end,
                            "page": para.position.page_number if para.position else 0,
                        },
                        columns={"created": int(resource.created)},
                    )
                )
        if not docs:
            return None
        return build_segment(output_dir, docs, kind="paragraph")

    def deletions_for_resource(self, resource: ResourceDoc) -> list[str]:
        if resource.paragraphs_to_delete:
            return list(resource.paragraphs_to_delete)
        return [resource.resource_id + "/"]

    def merge(self, open_index: OpenIndexMetadata, output_dir: str) -> SegmentMetadata:
        return merge_text_segments(output_dir, open_index, kind="paragraph")


@dataclass
class SearchAfter:
    """Deep-pagination cursor (parity: nodereader SearchAfter +
    nidx_paragraph SearchAfterTieBreak): keep hits strictly after
    (score desc, docaddr asc). ``tie`` handles hits at exactly
    ``score``: "keep" (cursor shard sorts before this one), "drop"
    (cursor shard sorts after), or an int docaddr (same shard — keep
    docaddr > cursor)."""

    score: float
    tie: "str | int" = "keep"


@dataclass
class ParagraphSearchRequest:
    """Parity: nodereader ParagraphSearchRequest."""

    query: str = ""
    top_k: int = 20
    fuzzy: bool = True
    filter: Optional[BooleanExpression] = None
    field_filter: PrefilterResult = dc_field(default_factory=PrefilterResult.all)
    # boundary-aware key-prefix restriction (the /find `fields=` filter);
    # ANDs with field_filter
    key_prefixes: Optional[list[str]] = None
    min_score: Optional[float] = None
    all_terms: bool = False
    offset: int = 0
    # extra Must() query in tantivy grammar (nodereader
    # SearchRequest.advanced_query; combined per nidx_paragraph
    # search_query.rs:202-210 — the doc must match the parsed query)
    advanced_query: Optional[str] = None
    search_after: Optional[SearchAfter] = None
    # how ``filter`` combines with the ``field_filter`` prefilter: "or"
    # matches EITHER side (FilterOperator::Or making both Should clauses,
    # nidx_paragraph/src/search_query.rs:87-103)
    filter_operator: str = "and"
    # False skips computing the corpus-wide matched total (the /find
    # product path never reads it; /search and the proto plane do)
    need_total: bool = True


@dataclass
class ParagraphHit:
    paragraph_id: str
    rid: str
    field: str
    score: float
    start: int
    end: int
    split: str
    index: int
    ematch: bool
    labels: list[str] = dc_field(default_factory=list)
    # engine doc id — the stable tiebreak address served as ResultScore.
    # docaddr on the proto plane and compared by SearchAfter cursors
    doc_id: int = 0


@dataclass
class ParagraphSearchResponse:
    hits: list[ParagraphHit]
    total: int
    ematches: list[str]
    query_terms: list[str]


class ParagraphSearcher:
    def __init__(
        self, open_index: OpenIndexMetadata, prev: "ParagraphSearcher | None" = None
    ):
        segments = [
            (open_text_segment(m.path), seq) for m, seq in open_index.segments()
        ]
        self.engine = DeviceTextEngine(
            segments, open_index.deletions(),
            prev=prev.engine if prev is not None else None,
        )

    def _leg_masks(self, request: ParagraphSearchRequest):
        """(extra_mask, para_filter) for one request — the prefilter fields
        AND key_prefixes are separate constraints and both restrict BEFORE
        scoring (a post-cut startswith filter both broke path boundaries and
        silently emptied pages when matches ranked below top_k)."""
        extra_mask = None
        para_filter = request.filter
        if not request.field_filter.is_all:
            prefixes = [f.as_key_prefix() for f in request.field_filter.fields]
            m = np.zeros(self.engine.n_docs, dtype=bool)
            m[self.engine.key_prefix_postings(prefixes)] = True
            if para_filter is not None and request.filter_operator == "or":
                # FilterOperator::Or — match EITHER the prefilter's fields
                # or the paragraph filter (search_query.rs:87-103 Should)
                from ...query_language import evaluate_bitset

                m = m | evaluate_bitset(
                    para_filter, self.engine.n_docs, self.engine._resolve_atom
                )
                para_filter = None
            extra_mask = m
        if request.key_prefixes:
            m = np.zeros(self.engine.n_docs, dtype=bool)
            m[self.engine.key_prefix_postings(list(request.key_prefixes))] = True
            extra_mask = m if extra_mask is None else (extra_mask & m)
        if request.advanced_query:
            m = advanced_query_mask(self.engine, request.advanced_query)
            extra_mask = m if extra_mask is None else (extra_mask & m)
        return extra_mask, para_filter

    def plan_kernel_query(self, request: ParagraphSearchRequest) -> "TextQuery | None":
        """Host-side planning for the mesh text group (parallel/
        text_group.py): the exact TextQuery ``search`` would dispatch, in
        the SIMPLE regime the group program covers — scored text, no
        phrases, no deep-pagination cursor. None = this request needs the
        per-shard path (the caller falls back, results identical)."""
        rest, phrases, excluded = parse_query(request.query)
        if phrases or request.search_after is not None:
            return None
        if not rest.strip():
            return None  # pure filter query: host-only, no kernel to group
        if request.field_filter.is_none:
            return None  # caller short-circuits to the empty response
        extra_mask, para_filter = self._leg_masks(request)
        return TextQuery(
            text=rest,
            phrases=[],
            excluded=excluded,
            top_k=request.top_k + request.offset,
            fuzzy=request.fuzzy,
            filter=para_filter,
            extra_mask=extra_mask,
            min_score=request.min_score,
            all_terms=request.all_terms,
        )

    def finish_kernel(
        self,
        request: ParagraphSearchRequest,
        query: "TextQuery",
        top_s: np.ndarray,
        top_ic: np.ndarray,
        matched_count: int,
    ) -> ParagraphSearchResponse:
        """Build the response from the mesh text group's per-shard cut —
        the same tail ``search`` runs after its kernel dispatch (ematch
        verification, pagination), restricted to the simple regime
        ``plan_kernel_query`` accepted."""
        k = top_ic.shape[0] // 2  # the GROUP's k (its score space may be
        # wider than this shard's n_pad — masked -1 padding makes that safe)
        hits = self.engine.hits_from_cut(query, top_s, top_ic, k)
        from ..text_engine.engine import _CountOnly

        matched = _CountOnly(int(matched_count), self.engine.n_docs)
        return self._finish(
            request, hits, [True] * len(hits), matched, [], [],
            [h.doc_id for h in hits],
        )

    def _phrase_mask(self, phrase_terms: list[list[str]]) -> np.ndarray:
        """[n_docs] bool — docs containing EVERY quoted phrase consecutively.

        The tantivy shape (PhraseQuery as a required clause): per phrase,
        intersect the terms' posting lists, then position-verify only the
        conjunction through the native matcher. Quoted phrases thereby
        become a pre-scoring MUST mask — scoring ranks only satisfying
        docs, pages always fill, and the corpus-wide total is exact with
        no post-hoc verification sweep (the old grow-the-window loop paid
        up to an n_docs-wide fetch + per-hit verification for rare
        phrases: measured 376 ms/query at 100k docs; this path is ~1 ms)."""
        mask = np.ones(self.engine.n_docs, dtype=bool)
        for pt in phrase_terms:
            if not pt:
                continue
            mask &= phrase_docs_mask(self.engine, pt)
        return mask

    def search(self, request: ParagraphSearchRequest) -> ParagraphSearchResponse:
        rest, phrases, excluded = parse_query(request.query)
        if request.field_filter.is_none:
            return ParagraphSearchResponse(hits=[], total=0, ematches=[], query_terms=[])

        extra_mask, para_filter = self._leg_masks(request)
        phrase_terms = [tokenize(p) for p in phrases]
        if phrases:
            pm = self._phrase_mask(phrase_terms)
            extra_mask = pm if extra_mask is None else (extra_mask & pm)

        fetch_k = request.top_k + request.offset
        if request.search_after is not None:
            # the cursor cut happens host-side after scoring, so every
            # scored candidate must be fetched (the reference's collector
            # applies SearchAfter inside tantivy; our kernel cut is top-k)
            fetch_k = self.engine.n_docs

        q = TextQuery(
            text=rest,
            phrases=phrases,  # phrase tokens still contribute to scoring
            excluded=excluded,
            top_k=fetch_k,
            fuzzy=request.fuzzy,
            filter=para_filter,
            extra_mask=extra_mask,
            min_score=request.min_score,
            all_terms=request.all_terms,
        )
        from ..text_engine.batcher import coalescer

        if coalescer.eligible(q):
            # concurrent unfiltered keyword queries share one device
            # dispatch (each dispatch costs a full relay round trip)
            hits, matched = coalescer.search_one(
                self.engine, q, need_total=request.need_total
            )
        else:
            hits, matched = self.engine.search(
                q, need_matched=False, need_total=request.need_total
            )
        hit_docs = [h.doc_id for h in hits]
        # phrases are a pre-scoring mask: every hit already satisfies them,
        # and `matched` (score>0 ∧ mask) already counts only phrase docs
        return self._finish(
            request, hits, [True] * len(hits), matched, [], phrase_terms,
            hit_docs,
        )

    def _finish(
        self, request, hits, phrase_ok, matched, phrases, phrase_terms, hit_docs
    ) -> ParagraphSearchResponse:
        """Everything after the kernel cut: ematch verification, exact
        totals, deep-pagination cursor cut, page slice. Shared by ``search``
        and the mesh group's ``finish_kernel``."""
        # ematch verification runs on the positive query terms only (in
        # their original order) — excluded (-term) tokens are not part of
        # the exact-match phrase
        query_tokens = tokenize(_EXCLUDE_RE.sub(" ", request.query))

        out: list[ParagraphHit] = []
        ematches: list[str] = []
        n_groups = len(set(query_tokens))
        # ematch: the full query appears as a consecutive phrase (parity
        # intent: nidx_paragraph exact-match detection). The kernel's
        # per-hit matched-term count prunes the verification: a doc counting
        # fewer matched term rows than the query has tokens cannot contain
        # them all; candidates batch through the same native verifier.
        ematch_flags = [False] * len(hits)
        if query_tokens:
            cand = [
                i
                for i, h in enumerate(hits)
                if phrase_ok[i] and (h.term_count < 0 or h.term_count >= n_groups)
            ]
            if len(query_tokens) == 1:
                for i in cand:
                    ematch_flags[i] = self.engine.doc_has_term(
                        hits[i].doc_id, query_tokens[0]
                    )
            elif cand:
                flags = self.engine.phrase_match_many(
                    [hits[i].doc_id for i in cand], query_tokens
                )
                for i, f in zip(cand, flags):
                    ematch_flags[i] = f
        for idx, h in enumerate(hits):
            if not phrase_ok[idx]:
                continue
            ematch = ematch_flags[idx]
            attrs = h.attrs
            out.append(
                ParagraphHit(
                    paragraph_id=h.key,
                    rid=attrs.get("rid", ""),
                    field=attrs.get("field", ""),
                    score=h.score,
                    start=int(attrs.get("start", 0)),
                    end=int(attrs.get("end", 0)),
                    split=attrs.get("split", ""),
                    index=int(attrs.get("index", 0)),
                    ematch=ematch,
                    doc_id=int(h.doc_id),
                )
            )
            if ematch:
                ematches.append(h.key)
        if phrases and isinstance(matched, np.ndarray):
            # exact corpus-wide total: phrase-verify every kernel-matched
            # candidate, not just the fetched window (the window-capped
            # count collapsed pagination as soon as a phrase was added)
            n_matched = int(matched.sum())
            if n_matched <= len(hit_docs):
                # the fetched window already contains every candidate —
                # reuse its verification instead of re-running the matcher
                total = sum(phrase_ok)
            else:
                window = dict(zip(hit_docs, phrase_ok))
                rest = [
                    int(d) for d in np.nonzero(matched)[0] if int(d) not in window
                ]
                ok = np.ones(len(rest), dtype=bool)
                for pt in phrase_terms:
                    ok &= np.fromiter(
                        self.engine.phrase_match_many(rest, pt), bool, len(rest)
                    )
                total = sum(phrase_ok) + int(ok.sum())
        elif phrases:
            total = len(out)
        else:
            total = int(matched.sum())
        if request.search_after is not None:
            # deterministic cursor ordering: score desc, docaddr asc
            # (tantivy TopDocs order); then keep only hits strictly after
            # the cursor position
            out.sort(key=lambda h: (-h.score, h.doc_id))
            sa = request.search_after
            kept = []
            for h in out:
                if h.score < sa.score:
                    kept.append(h)
                elif h.score == sa.score:
                    if sa.tie == "keep" or (
                        isinstance(sa.tie, int) and h.doc_id > sa.tie
                    ):
                        kept.append(h)
            out = kept
        out = out[request.offset : request.offset + request.top_k]
        return ParagraphSearchResponse(
            hits=out, total=total, ematches=ematches, query_terms=query_tokens
        )

    def suggest(
        self, prefix: str, top_k: int = 10, *, filter=None
    ) -> list[ParagraphHit]:
        """Prefix suggestion: last token treated as a prefix via fuzzy+prefix
        expansion over the vocabulary (parity intent: suggest endpoint).
        ``filter`` is a BooleanExpression applied like in search (parity:
        nidx suggest honours the request filter, lib.rs:217-262)."""
        toks = tokenize(prefix)
        if not toks:
            return []
        last = toks[-1]
        expansions = self.engine.prefix_terms(last, 10)
        if not expansions:
            expansions = self.engine.fuzzy_expand(last, 1)
        best: dict[str, ParagraphHit] = {}
        for exp in expansions[:5]:
            text = " ".join(toks[:-1] + [exp])
            resp = self.search(
                ParagraphSearchRequest(
                    query=text, top_k=top_k, fuzzy=False, filter=filter
                )
            )
            for hit in resp.hits:
                cur = best.get(hit.paragraph_id)
                if cur is None or hit.score > cur.score:
                    best[hit.paragraph_id] = hit
        return sorted(best.values(), key=lambda h: -h.score)[:top_k]
