"""Consolidated device BM25 engine.

All open segments of one text index consolidate into device arenas (like the
vector index, device.py): a global term dictionary plus **tiered postings**:

- terms are partitioned by document frequency into tiers of padded
  ``[T_tier, L_tier]`` matrices (docs + tfs). Query terms fetch their
  postings with row gathers (fast) and contribute via ONE small scatter-add
  of ~sum-of-postings elements — never a full-corpus scatter.
- terms with df above the top tier get a **dense** uint8 tf column [N_pad]:
  the most frequent (stopword-grade) terms become pure elementwise adds.
  This is the TPU counterpart of WAND skipping: the expensive terms are
  restructured, not skipped.

Per-tier query capacity is fixed (static shapes, one compiled kernel per
top_k); when a query exceeds a tier's capacity the lowest-idf terms of that
tier are dropped — exactly the terms WAND would skip first.

Scoring is Lucene/tantivy-compatible BM25 (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))) so scores are comparable with the
reference's (nidx_text BM25 via tantivy).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.topk import NEG_INF, masked_topk
from ...query_language import BooleanExpression, FacetPrefixAtom, KeyPrefixAtom, LabelAtom, evaluate_bitset
from ...types import Seq
from ...utils.platform import configure_jax
from .builder import TextSegmentData, alive_mask_text
from .fuzzy import FuzzyIndex
from .tokenizer import tokenize

K1 = 1.2
B = 0.75
FUZZY_WEIGHT = 0.7  # score discount for fuzzy-expanded terms

TIER_WIDTHS = (32, 256, 2048, 16384)  # postings padded length per tier
TIER_QUERY_CAP = (32, 32, 8, 8)  # query terms per tier per query
DENSE_QUERY_CAP = 4
IMPOSSIBLE_REQUIRED = 1_000_000  # AND queries with unknown terms match nothing


from ...utils.buckets import bucket as _bucket  # shared {2^k, 1.5*2^k} ladder


@dataclass
class TextQuery:
    """A parsed keyword query against the engine."""

    text: str = ""
    top_k: int = 20
    only_faceted: bool = False  # no text -> pure filter/facet query
    fuzzy: bool = False
    fuzzy_distance: int = 1
    phrases: list[str] = dc_field(default_factory=list)  # quoted phrases (must appear)
    all_terms: bool = False  # AND semantics (default OR)
    filter: Optional[BooleanExpression] = None
    key_prefixes: Optional[list[str]] = None  # extra doc-key prefix filter
    min_score: Optional[float] = None
    extra_mask: Optional[np.ndarray] = None  # [n_docs] bool, e.g. security


@dataclass
class TextHit:
    key: str
    score: float
    doc_id: int
    attrs: dict
    # matched term-row count from the kernel (-1 = unknown); a hit with
    # term_count < number-of-query-tokens cannot be an exact match, so the
    # host skips positions verification for it
    term_count: int = -1


class _CountOnly:
    """Stand-in for the matched bitmap when only its sum was downloaded."""

    def __init__(self, count: int, n: int):
        self._count = count
        self._n = n

    def sum(self) -> int:
        return self._count

    def __len__(self) -> int:
        return self._n


class DeviceTextEngine:
    """Consolidated segments of one text index + BM25 device kernels."""

    def __init__(
        self,
        segments: Sequence[tuple[TextSegmentData, Seq]],
        deletions: Sequence[tuple[str, Seq]] = (),
    ):
        configure_jax()
        self.segments = [s for s, _ in segments]

        keys: list[str] = []
        attrs: list[dict] = []
        facet_chunks: dict[str, list[np.ndarray]] = {}
        column_chunks: dict[str, list[np.ndarray]] = {}
        alive_chunks: list[np.ndarray] = []
        dlen_chunks: list[np.ndarray] = []
        self.doc_seg: list[tuple[int, int]] = []  # global doc -> (segment idx, offset)
        total_len = 0

        # Consolidation is pure numpy: per-posting Python loops are a cliff
        # (a 1M-doc segment has ~1e8 postings). Per segment we remap its term
        # ids to the global dictionary and offset its doc ids; a stable sort
        # by global term id then groups every term's postings.
        all_terms: set[str] = set()
        for seg, _ in segments:
            all_terms.update(seg.terms)
        self.terms_sorted = sorted(all_terms)
        term_to_gid = {t: i for i, t in enumerate(self.terms_sorted)}

        gid_chunks: list[np.ndarray] = []
        doc_chunks: list[np.ndarray] = []
        tf_chunks: list[np.ndarray] = []

        offset = 0
        for seg_idx, (seg, seq) in enumerate(segments):
            keys.extend(seg.keys)
            attrs.extend(seg.attrs)
            alive_chunks.append(alive_mask_text(seg, seq, deletions))
            dlen_chunks.append(np.asarray(seg.dlen, dtype=np.int32))
            total_len += int(seg.meta.get("total_len", int(np.sum(seg.dlen))))
            for facet, dids in seg.facets.items():
                facet_chunks.setdefault(facet, []).append(dids + offset)
            for name, col in seg.columns.items():
                column_chunks.setdefault(name, []).append(np.asarray(col))
            self.doc_seg.extend((seg_idx, offset) for _ in range(seg.n_docs))
            po = np.asarray(seg.postings_offsets)
            counts = np.diff(po).astype(np.int64)
            local_gids = np.fromiter(
                (term_to_gid[t] for t in seg.terms), dtype=np.int64, count=len(seg.terms)
            )
            gid_chunks.append(np.repeat(local_gids, counts))
            doc_chunks.append(np.asarray(seg.postings_docs, np.int64) + offset)
            tf_chunks.append(np.asarray(seg.postings_tfs, np.float32))
            offset += seg.n_docs

        if gid_chunks:
            gids = np.concatenate(gid_chunks)
            pdocs = np.concatenate(doc_chunks)
            ptfs = np.concatenate(tf_chunks)
            order = np.argsort(gids, kind="stable")
            gids, pdocs, ptfs = gids[order], pdocs[order], ptfs[order]
            group_counts = np.bincount(gids, minlength=len(self.terms_sorted))
            group_offsets = np.zeros(len(self.terms_sorted) + 1, np.int64)
            np.cumsum(group_counts, out=group_offsets[1:])
        else:
            pdocs = np.zeros(0, np.int64)
            ptfs = np.zeros(0, np.float32)
            group_offsets = np.zeros(len(self.terms_sorted) + 1, np.int64)

        self.keys = keys
        self.attrs = attrs
        self.n_docs = offset
        # per-segment sorted runs of self.keys (prefix bisects must stay
        # within a segment — the concatenation is NOT globally sorted)
        self.seg_bounds: list[tuple[int, int]] = []
        run_lo = 0
        for seg, _ in segments:
            self.seg_bounds.append((run_lo, run_lo + seg.n_docs))
            run_lo += seg.n_docs
        self.alive = np.concatenate(alive_chunks) if alive_chunks else np.zeros(0, bool)
        self.facets = {
            f: np.sort(np.concatenate(c)) for f, c in facet_chunks.items()
        }
        self.columns = {
            n: np.concatenate(c) for n, c in column_chunks.items()
        }
        dlen = np.concatenate(dlen_chunks) if dlen_chunks else np.zeros(0, np.int32)
        self.avgdl = float(total_len) / max(self.n_docs, 1) if self.n_docs else 1.0

        self.n_pad = _bucket(max(self.n_docs, 1))
        dlen_p = np.ones(self.n_pad, np.float32)
        dlen_p[: self.n_docs] = np.maximum(dlen, 1)
        self.dlen = jax.device_put(jnp.asarray(dlen_p))

        # ---- tier the terms (vectorized: no per-posting python) -----------
        dfs = np.diff(group_offsets)
        # tier = first width >= df; beyond the last width -> dense
        tier_idx = np.searchsorted(np.asarray(TIER_WIDTHS), dfs, side="left")

        self.term_info: dict[str, tuple[int, int, int]] = {}  # term -> (tier, row, df)
        self.tier_docs: list[jax.Array] = []
        self.tier_tfs: list[jax.Array] = []
        for tier, width in enumerate(TIER_WIDTHS):
            gids_t = np.nonzero(tier_idx == tier)[0]
            t = max(len(gids_t), 1)  # >=1 row so gathers are well-formed
            docs_m = np.full((t, width), -1, np.int32)
            tfs_m = np.zeros((t, width), np.float32)
            if len(gids_t):
                lengths = dfs[gids_t]
                total = int(lengths.sum())
                excl = np.concatenate([[0], np.cumsum(lengths)[:-1]])
                within = np.arange(total) - np.repeat(excl, lengths)
                dst = np.repeat(np.arange(len(gids_t)) * width, lengths) + within
                src = np.repeat(group_offsets[gids_t], lengths) + within
                docs_m.reshape(-1)[dst] = pdocs[src]
                tfs_m.reshape(-1)[dst] = ptfs[src]
                for row, gid in enumerate(gids_t):
                    self.term_info[self.terms_sorted[gid]] = (tier, row, int(dfs[gid]))
            self.tier_docs.append(jax.device_put(jnp.asarray(docs_m)))
            self.tier_tfs.append(jax.device_put(jnp.asarray(tfs_m)))

        dense_rows: list[np.ndarray] = []  # each [n_pad] uint8
        for row, gid in enumerate(np.nonzero(tier_idx == len(TIER_WIDTHS))[0]):
            lo, hi = int(group_offsets[gid]), int(group_offsets[gid + 1])
            dense = np.zeros(self.n_pad, np.uint8)
            dense[pdocs[lo:hi]] = np.minimum(ptfs[lo:hi], 255).astype(np.uint8)
            self.term_info[self.terms_sorted[gid]] = (-1, row, int(dfs[gid]))
            dense_rows.append(dense)
        dense_m = (
            np.stack(dense_rows) if dense_rows else np.zeros((1, self.n_pad), np.uint8)
        )
        self.dense_tf = jax.device_put(jnp.asarray(dense_m))

        self._base_mask_dev: jax.Array | None = None
        self._fuzzy: FuzzyIndex | None = None

    @property
    def fuzzy_index(self) -> FuzzyIndex:
        if self._fuzzy is None:
            self._fuzzy = FuzzyIndex(self.terms_sorted)
        return self._fuzzy

    # ------------------------------------------------------------------

    def base_mask(self) -> np.ndarray:
        mask = np.zeros(self.n_pad, dtype=bool)
        mask[: self.n_docs] = self.alive
        return mask

    def base_mask_device(self) -> jax.Array:
        if self._base_mask_dev is None:
            self._base_mask_dev = jax.device_put(jnp.asarray(self.base_mask()))
        return self._base_mask_dev

    def idf(self, df: int) -> float:
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def facet_postings(self, facet: str) -> np.ndarray:
        return self.facets.get(facet, np.zeros(0, np.int32))

    def key_prefix_postings(self, prefixes: Sequence[str]) -> np.ndarray:
        from ...utils.keys import key_prefix_ranges

        out = [
            np.arange(lo, hi, dtype=np.int32)
            for lo, hi in key_prefix_ranges(self.keys, prefixes, self.seg_bounds)
        ]
        return np.concatenate(out) if out else np.zeros(0, np.int32)

    def _resolve_atom(self, atom) -> np.ndarray:
        if isinstance(atom, LabelAtom):
            return self.facet_postings(atom.label)
        if isinstance(atom, FacetPrefixAtom):
            prefix = atom.facet.rstrip("/")
            chunks = [
                p
                for f, p in self.facets.items()
                if f == atom.facet or f.startswith(prefix + "/")
            ]
            return np.unique(np.concatenate(chunks)) if chunks else np.zeros(0, np.int32)
        if isinstance(atom, KeyPrefixAtom):
            return self.key_prefix_postings(atom.prefixes)
        raise TypeError(f"unsupported filter atom for text index: {atom!r}")

    def build_mask(self, query: TextQuery) -> np.ndarray:
        mask = self.base_mask()
        if query.filter is not None:
            m = evaluate_bitset(query.filter, self.n_docs, self._resolve_atom)
            mask[: self.n_docs] &= m
        if query.key_prefixes is not None:
            m = np.zeros(self.n_docs, dtype=bool)
            pids = self.key_prefix_postings(query.key_prefixes)
            m[pids] = True
            mask[: self.n_docs] &= m
        if query.extra_mask is not None:
            mask[: self.n_docs] &= query.extra_mask
        return mask

    # ------------------------------------------------------------------

    def _plan_terms(self, query: TextQuery) -> tuple[list[tuple[str, float]], int]:
        """Resolve query text to weighted terms; returns (terms, n_required)."""
        tokens = tokenize(query.text)
        for phrase in query.phrases:
            tokens.extend(tokenize(phrase))
        seen: dict[str, float] = {}
        satisfiable: set[str] = set()
        for tok in tokens:
            if tok in self.term_info:
                satisfiable.add(tok)
                seen[tok] = max(seen.get(tok, 0.0), 1.0)
            if query.fuzzy:
                for cand in self.fuzzy_index.expand(tok, query.fuzzy_distance):
                    if cand != tok:
                        satisfiable.add(tok)
                        seen.setdefault(cand, FUZZY_WEIGHT)
        if query.all_terms:
            distinct = len(set(tokens))
            # a token with no exact or fuzzy variant makes an AND query
            # unsatisfiable (sentinel bypasses the scheduling clamp). The
            # kernel count is a LOWER-BOUND filter: every true match has at
            # least one hit per token group, so counts >= len(satisfiable);
            # exactness comes from the host verify_all_terms pass.
            required = (
                IMPOSSIBLE_REQUIRED if len(satisfiable) < distinct else distinct
            )
        else:
            required = min(1, len(seen))
        return sorted(seen.items()), required

    def search(
        self, query: TextQuery, *, need_matched: bool = True
    ) -> tuple[list[TextHit], np.ndarray]:
        """Run a query; returns (hits, matched bitmap over global docs).

        The bitmap feeds host-side facet counting and date ordering; callers
        that only need the match count pass ``need_matched=False`` and get a
        sum-only proxy (avoids downloading n_pad bytes per search).
        """
        mask = self.build_mask(query)
        scored = bool(query.text.strip() or query.phrases)

        if not scored:
            # pure filter query: matched = mask; order by key
            matched = mask[: self.n_docs].copy()
            dids = np.nonzero(matched)[0][: query.top_k]
            hits = [
                TextHit(key=self.keys[d], score=0.0, doc_id=int(d), attrs=self.attrs[d])
                for d in dids
            ]
            return hits, matched

        terms, required = self._plan_terms(query)
        if not terms:
            return [], np.zeros(self.n_docs, dtype=bool)

        all_rows_np, all_idfs_np, params_np = self._device_inputs_planned(
            terms, required, query
        )
        all_rows = jnp.asarray(all_rows_np)
        all_idfs = jnp.asarray(all_idfs_np)
        params = jnp.asarray(params_np)
        mask_j = (
            self.base_mask_device()
            if (query.filter is None and query.key_prefixes is None and query.extra_mask is None)
            else jnp.asarray(mask)
        )

        k = min(query.top_k, self.n_pad)
        top_s, top_ic, matched = _bm25_search(
            self.tier_docs[0], self.tier_tfs[0],
            self.tier_docs[1], self.tier_tfs[1],
            self.tier_docs[2], self.tier_tfs[2],
            self.tier_docs[3], self.tier_tfs[3],
            self.dense_tf, self.dlen, mask_j, all_rows, all_idfs, params, k,
        )
        top_s = np.asarray(top_s)
        top_ic = np.asarray(top_ic)
        top_i, top_counts = top_ic[:k], top_ic[k:]
        if need_matched:
            matched_np = np.asarray(matched)[: self.n_docs]
        else:
            # only the count crosses the wire (the bitmap is ~n_pad bytes per
            # search through a ~10MB/s link)
            count = int(np.asarray(jnp.sum(matched)))
            matched_np = _CountOnly(count, self.n_docs)

        if query.only_faceted:
            # facets-only: the matched set reflects the query, hits are not
            # materialized (parity: only_faceted skips result building)
            return [], matched_np

        hits = [
            TextHit(key=self.keys[d], score=float(s), doc_id=int(d),
                    attrs=self.attrs[d], term_count=int(c))
            for s, d, c in zip(top_s, top_i, top_counts)
            if d >= 0
        ]
        if query.all_terms and query.fuzzy and query.text.strip():
            # kernel counts are a superset test under fuzzy (variants of one
            # token can satisfy another token's requirement) — exact AND
            # verification happens host-side on the top-k only; the matched
            # bitmap stays the (slightly over-inclusive) kernel set
            hits = [h for h in hits if self.verify_all_terms(h.doc_id, query)]
        return hits, matched_np

    def _device_inputs(self, query: TextQuery):
        """(rows, idfs, params, mask) numpy inputs for one scored query."""
        terms, required = self._plan_terms(query)
        rows, idfs, params = self._device_inputs_planned(terms, required, query)
        return rows, idfs, params, self.build_mask(query)

    def _device_inputs_planned(
        self, terms: list[tuple[str, float]], required: int, query: TextQuery
    ):
        tier_q: list[list[tuple[int, float]]] = [[] for _ in TIER_WIDTHS]
        dense_q: list[tuple[int, float]] = []
        for term, weight in terms:
            tier, row, df = self.term_info[term]
            w_idf = weight * self.idf(df)
            if tier < 0:
                dense_q.append((row, w_idf))
            else:
                tier_q[tier].append((row, w_idf))
        rows_np, idfs_np = [], []
        for tier, cap in enumerate(TIER_QUERY_CAP):
            entries = sorted(tier_q[tier], key=lambda e: -e[1])[:cap]
            rows = np.full(cap, -1, np.int32)
            idfs = np.zeros(cap, np.float32)
            for j, (row, w) in enumerate(entries):
                rows[j] = row
                idfs[j] = w
            rows_np.append(rows)
            idfs_np.append(idfs)
        dense_entries = sorted(dense_q, key=lambda e: -e[1])[:DENSE_QUERY_CAP]
        drows = np.full(DENSE_QUERY_CAP, -1, np.int32)
        didfs = np.zeros(DENSE_QUERY_CAP, np.float32)
        for j, (row, w) in enumerate(dense_entries):
            drows[j] = row
            didfs[j] = w
        all_rows = np.concatenate(rows_np + [drows])
        all_idfs = np.concatenate(idfs_np + [didfs])
        # all_terms queries clamp `required` to the slots actually scheduled:
        # tier caps drop the lowest-idf terms, and an unclamped requirement
        # could exceed the maximum achievable match count (zero results for
        # documents that DO contain every term)
        scheduled = int((all_rows >= 0).sum())
        if required >= IMPOSSIBLE_REQUIRED:
            required_eff = IMPOSSIBLE_REQUIRED  # unsatisfiable AND stays so
        else:
            required_eff = max(min(required, scheduled), 1)
        params = np.array(
            [
                self.avgdl,
                float(required_eff),
                NEG_INF if query.min_score is None else query.min_score,
            ],
            dtype=np.float32,
        )
        return all_rows, all_idfs, params

    def search_batch(
        self, queries: list[TextQuery], *, need_matched: bool = True
    ) -> list[tuple[list[TextHit], np.ndarray]]:
        """Score a batch of keyword queries in ONE device dispatch.

        All queries share top_k (the max of the batch is used). Pure-filter
        queries are not batchable (no scoring) and raise.

        When every query is unfiltered, ONE shared [n_pad] base mask feeds
        the whole batch (vmap in_axes=None) — no per-query mask upload.
        ``need_matched=False`` downloads only per-query match counts instead
        of [B, n_pad] bitmaps (the count-only discipline of ``search``).
        """
        if not queries:
            return []
        if any(not (q.text.strip() or q.phrases) for q in queries):
            raise ValueError("search_batch requires scored (non-empty) queries")
        k = min(max(q.top_k for q in queries), self.n_pad)
        unfiltered = all(
            q.filter is None and q.key_prefixes is None and q.extra_mask is None
            for q in queries
        )
        if unfiltered:
            planned = [self._plan_terms(q) for q in queries]
            rip = [
                self._device_inputs_planned(terms, req, q)
                for (terms, req), q in zip(planned, queries)
            ]
            rows, idfs, params = zip(*rip)
            masks_in = self.base_mask_device()
        else:
            rows, idfs, params, masks = zip(*(self._device_inputs(q) for q in queries))
            masks_in = jnp.asarray(np.stack(masks))
        top_s, top_ic, matched = _bm25_search_batch(
            self.tier_docs[0], self.tier_tfs[0],
            self.tier_docs[1], self.tier_tfs[1],
            self.tier_docs[2], self.tier_tfs[2],
            self.tier_docs[3], self.tier_tfs[3],
            self.dense_tf, self.dlen,
            masks_in, jnp.asarray(np.stack(rows)),
            jnp.asarray(np.stack(idfs)), jnp.asarray(np.stack(params)), k,
            shared_mask=unfiltered, count_only=not need_matched,
        )
        top_s, top_ic = np.asarray(top_s), np.asarray(top_ic)
        top_i, top_counts = top_ic[:, :k], top_ic[:, k:]
        if need_matched:
            matched_rows = list(np.asarray(matched)[:, : self.n_docs])
        else:
            counts = np.asarray(matched)
            matched_rows = [_CountOnly(int(c), self.n_docs) for c in counts]
        out = []
        for b, query in enumerate(queries):
            hits = [
                TextHit(
                    key=self.keys[d], score=float(s), doc_id=int(d),
                    attrs=self.attrs[d], term_count=int(c),
                )
                for s, d, c in zip(
                    top_s[b][: query.top_k], top_i[b][: query.top_k],
                    top_counts[b][: query.top_k],
                )
                if d >= 0
            ]
            if query.all_terms and query.fuzzy and query.text.strip():
                hits = [h for h in hits if self.verify_all_terms(h.doc_id, query)]
            out.append((hits, matched_rows[b]))
        return out

    # ------------------------------------------------------------------
    # positions (host) for phrase verification
    # ------------------------------------------------------------------

    def _term_postings_host(self, seg_idx: int, term: str):
        """(docs array in RAM, postings base offset) for one segment term,
        memoized — ematch/phrase verification hits the same few query terms
        for every scored hit, and re-bisecting + re-slicing the memmap per
        hit was a top host cost in the keyword-find profile."""
        cache = getattr(self, "_host_postings_cache", None)
        if cache is None:
            cache = self._host_postings_cache = {}
        key = (seg_idx, term)
        entry = cache.get(key)
        if entry is None:
            import bisect

            seg = self.segments[seg_idx]
            ti = bisect.bisect_left(seg.terms, term)
            if ti >= len(seg.terms) or seg.terms[ti] != term:
                entry = (None, 0)
            else:
                lo, hi = int(seg.postings_offsets[ti]), int(seg.postings_offsets[ti + 1])
                entry = (np.asarray(seg.postings_docs[lo:hi]), lo)
            if len(cache) > 4096:
                cache.clear()
            cache[key] = entry
        return entry

    def doc_positions(self, global_doc: int, term: str) -> np.ndarray:
        """Token positions of ``term`` in one document (host, mmap reads)."""
        seg_idx, offset = self.doc_seg[global_doc]
        seg = self.segments[seg_idx]
        local = global_doc - offset
        docs, lo = self._term_postings_host(seg_idx, term)
        if docs is None:
            return np.zeros(0, np.int32)
        j = np.searchsorted(docs, local)
        if j >= len(docs) or docs[j] != local:
            return np.zeros(0, np.int32)
        plo = int(seg.positions_offsets[lo + j])
        phi = int(seg.positions_offsets[lo + j + 1])
        return np.asarray(seg.positions[plo:phi])

    def doc_has_term(self, global_doc: int, term: str) -> bool:
        """Membership test via the per-segment CSR postings (host)."""
        seg_idx, offset = self.doc_seg[global_doc]
        local = global_doc - offset
        docs, _ = self._term_postings_host(seg_idx, term)
        if docs is None:
            return False
        j = np.searchsorted(docs, local)
        return bool(j < len(docs) and docs[j] == local)

    def _token_variant_groups(self, query: TextQuery) -> list[list[str]]:
        """Per distinct query token: the token + its fuzzy expansions."""
        groups: dict[str, list[str]] = {}
        for tok in tokenize(query.text):
            if tok in groups:
                continue
            variants = [tok] if tok in self.term_info else []
            if query.fuzzy:
                variants.extend(
                    c for c in self.fuzzy_index.expand(tok, query.fuzzy_distance)
                    if c != tok
                )
            groups[tok] = variants
        return list(groups.values())

    def verify_all_terms(self, global_doc: int, query: TextQuery) -> bool:
        """Exact AND semantics: every query token must match via itself or
        one of ITS OWN fuzzy variants. The device kernel's match count is a
        superset test (two variants of one token can reach the required
        count), so all_terms hits re-verify here before they surface."""
        for variants in self._token_variant_groups(query):
            if not variants:
                return False
            if not any(self.doc_has_term(global_doc, v) for v in variants):
                return False
        return True

    def phrase_match_many(
        self, global_docs: Sequence[int], phrase_terms: list[str]
    ) -> list[bool]:
        """Consecutive-phrase membership for many docs in one pass. Uses the
        native GIL-free verifier (native/phrase.cpp) when built; falls back
        to per-doc ``phrase_match``."""
        if not phrase_terms:
            return [True] * len(global_docs)
        try:
            import nucliadb_tpu_native as _native
        except ImportError:
            return [self.phrase_match(d, phrase_terms) for d in global_docs]

        out = [False] * len(global_docs)
        # group by segment: postings arrays and position CSRs are per-segment
        by_seg: dict[int, list[int]] = {}
        for i, gd in enumerate(global_docs):
            by_seg.setdefault(self.doc_seg[gd][0], []).append(i)
        for seg_idx, idxs in by_seg.items():
            seg = self.segments[seg_idx]
            offset = self.doc_seg[global_docs[idxs[0]]][1]
            term_docs = []
            term_lo = []
            missing = False
            for term in phrase_terms:
                docs, lo = self._term_postings_host(seg_idx, term)
                if docs is None:
                    missing = True
                    break
                term_docs.append(np.ascontiguousarray(docs, np.int32))
                term_lo.append(lo)
            if missing:
                continue
            locals_i64 = np.asarray(
                [global_docs[i] - offset for i in idxs], np.int64
            )
            flags = _native.phrase_match_batch(
                locals_i64, term_docs, term_lo,
                np.ascontiguousarray(seg.positions_offsets, np.int64),
                seg.positions,
            )
            for pos, i in enumerate(idxs):
                out[i] = flags[pos] == 1
        return out

    def phrase_match(self, global_doc: int, phrase_terms: list[str]) -> bool:
        """True if the terms appear consecutively in the document."""
        if not phrase_terms:
            return True
        positions = self.doc_positions(global_doc, phrase_terms[0])
        current = set(positions.tolist())
        for step, term in enumerate(phrase_terms[1:], start=1):
            nxt = set((self.doc_positions(global_doc, term) - step).tolist())
            current &= nxt
            if not current:
                return False
        return bool(current)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "shared_mask", "count_only"))
def _bm25_search_batch(
    docs0, tfs0, docs1, tfs1, docs2, tfs2, docs3, tfs3,
    dense_tf, dlen, masks, all_rows, all_idfs, params, k,
    shared_mask: bool = False, count_only: bool = False,
):
    """Batched variant: per-query rows/idfs/params (+masks) stacked on axis 0.

    One dispatch scores B queries (the serving-side batching the reference
    gets from concurrent tantivy searchers; here it is one vmapped program).
    ``shared_mask``: ``masks`` is one [n_pad] mask broadcast over the batch.
    ``count_only``: the third output is [B] match counts, not bitmaps.
    """

    def core(mask, rows, idfs, p):
        return _bm25_search.__wrapped__(
            docs0, tfs0, docs1, tfs1, docs2, tfs2, docs3, tfs3,
            dense_tf, dlen, mask, rows, idfs, p, k,
        )

    mask_axis = None if shared_mask else 0
    top_s, top_ic, matched = jax.vmap(core, in_axes=(mask_axis, 0, 0, 0))(
        masks, all_rows, all_idfs, params
    )
    if count_only:
        return top_s, top_ic, jnp.sum(matched, axis=-1)
    return top_s, top_ic, matched


def _tier_contrib(docs_m, tfs_m, rows, idfs, dlen, avgdl):
    """Gather one tier's query postings; returns (doc ids, weights, hits)."""
    safe_rows = jnp.maximum(rows, 0)
    d = docs_m[safe_rows]  # [Q, L]
    tf = tfs_m[safe_rows]
    dl = dlen[jnp.maximum(d, 0)]
    norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    valid = (d >= 0) & (rows >= 0)[:, None]
    w = jnp.where(valid, idfs[:, None] * norm, 0.0)
    hit = jnp.where(valid, 1.0, 0.0)
    return d.reshape(-1), w.reshape(-1), hit.reshape(-1)


@partial(jax.jit, static_argnames=("k",))
def _bm25_search(
    docs0, tfs0, docs1, tfs1, docs2, tfs2, docs3, tfs3,
    dense_tf, dlen, mask, all_rows, all_idfs, params, k,
):
    avgdl = params[0]
    required = params[1]
    min_score = params[2]
    n_pad = dlen.shape[0]

    caps = list(TIER_QUERY_CAP)
    splits = np.cumsum(caps).tolist()
    r0, r1, r2, r3, rd = jnp.split(all_rows, splits)
    i0, i1, i2, i3, idn = jnp.split(all_idfs, splits)

    ds, ws, hs = [], [], []
    for docs_m, tfs_m, rows, idfs in (
        (docs0, tfs0, r0, i0),
        (docs1, tfs1, r1, i1),
        (docs2, tfs2, r2, i2),
        (docs3, tfs3, r3, i3),
    ):
        d, w, h = _tier_contrib(docs_m, tfs_m, rows, idfs, dlen, avgdl)
        ds.append(d)
        ws.append(w)
        hs.append(h)
    d_all = jnp.concatenate(ds)
    d_all = jnp.where(d_all >= 0, d_all, n_pad)  # out-of-range -> dropped
    w_all = jnp.concatenate(ws)
    h_all = jnp.concatenate(hs)

    acc = jnp.zeros((2, n_pad), jnp.float32)
    acc = acc.at[:, d_all].add(jnp.stack([w_all, h_all]), mode="drop")
    scores, counts = acc[0], acc[1]

    # dense (stopword-grade) terms: elementwise
    for j in range(DENSE_QUERY_CAP):
        row = rd[j]
        idf_w = idn[j]
        tf = dense_tf[jnp.maximum(row, 0)].astype(jnp.float32)
        norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dlen / avgdl))
        active = (row >= 0) & (tf > 0)
        scores = scores + jnp.where(active, idf_w * norm, 0.0)
        counts = counts + jnp.where(active, 1.0, 0.0)

    matched = (counts >= jnp.maximum(required, 1.0)) & mask
    final = jnp.where(matched, scores, NEG_INF)
    top_s, top_i = masked_topk(final, k, min_score=min_score)
    # per-hit matched-term-row counts ride along, PACKED into the ids
    # array ([k ids | k counts] -> one download instead of two): the host
    # uses them to skip exact-match/phrase verification for hits that
    # cannot contain every query token (count < G is a safe pruner — a doc
    # holding all G tokens always counts >= G)
    top_counts = counts[jnp.maximum(top_i, 0)].astype(jnp.int32)
    return top_s, jnp.concatenate([top_i, top_counts]), matched
