"""Per-segment postings builder + disk format for the text engine.

Replaces the tantivy single-segment writer (nidx_tantivy/src/lib.rs:40-80
TantivyIndexer) with a numpy CSR build. One segment = one immutable
directory; the searcher consolidates many segments into device arenas.

Layout:
    meta.json               records, total_len, kind, extra
    keys.msgpack            [N] doc keys (sorted — prefix deletions/filters)
    terms.msgpack           [T] terms (sorted)
    postings_offsets.npy    [T+1] int64 into docs/tfs/pos_offsets
    postings_docs.npy       [nnz] int32 (local doc ids, ascending per term)
    postings_tfs.npy        [nnz] uint16 (term frequency, clipped)
    positions_offsets.npy   [nnz+1] int64 into positions
    positions.npy           [npos] int32 (token ordinals)
    dlen.npy                [N] int32 (doc length in tokens)
    facets.msgpack          {facet -> [doc ids]} postings
    attrs.msgpack           [N] small per-doc attribute dicts
    columns.npz             named int64 per-doc columns (created, modified, …)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Sequence

import msgpack
import numpy as np

from ...types import SegmentMetadata, Seq
from .tokenizer import tokenize_with_positions

# v2: docs carry /f/{field_type} facets (field-type filters + catalog title
# matching); older segments lack them and need a reindex
TEXT_FORMAT_VERSION = 2

try:  # native postings builder (native/postings.cpp) — same output, ~30x faster
    import nucliadb_tpu_native as _native
except ImportError:
    _native = None


@dataclass
class DocEntry:
    """One document to index: a field (text index) or a paragraph."""

    key: str
    text: str
    facets: list[str] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    columns: dict[str, int] = field(default_factory=dict)  # int64 columns


@dataclass
class TextSegmentData:
    """An open (mmap-backed) text segment."""

    path: str
    keys: list[str]
    terms: list[str]
    postings_offsets: np.ndarray
    postings_docs: np.ndarray
    postings_tfs: np.ndarray
    positions_offsets: np.ndarray
    positions: np.ndarray
    dlen: np.ndarray
    facets: dict[str, np.ndarray]
    attrs: list[dict]
    columns: dict[str, np.ndarray]
    tags: frozenset[str] = frozenset()
    meta: dict = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.keys)

    def key_prefix_mask(self, prefixes: Sequence[str]) -> np.ndarray:
        from ...utils.keys import key_prefix_ranges

        mask = np.zeros(self.n_docs, dtype=bool)
        for lo, hi in key_prefix_ranges(self.keys, prefixes):
            mask[lo:hi] = True
        return mask


def build_segment(
    path: str,
    docs: list[DocEntry],
    *,
    kind: str,
    tags: Sequence[str] = (),
    extra_meta: dict | None = None,
) -> SegmentMetadata:
    docs = sorted(docs, key=lambda d: d.key)
    keys = [d.key for d in docs]
    attrs = [d.attrs for d in docs]
    facets: dict[str, list[int]] = {}
    col_names = sorted({name for d in docs for name in d.columns})
    columns = {name: np.zeros(len(docs), dtype=np.int64) for name in col_names}

    for did, doc in enumerate(docs):
        for facet in set(doc.facets):
            facets.setdefault(facet, []).append(did)
        for name, value in doc.columns.items():
            columns[name][did] = value

    if _native is not None:
        terms, off_b, docs_b, tfs_b, poff_b, pos_b, dlen_b = _native.build_postings(
            [d.text for d in docs]
        )
        offsets = np.frombuffer(off_b, np.int64)
        docs_np = np.frombuffer(docs_b, np.int32)
        tfs_np = np.frombuffer(tfs_b, np.uint16)
        pos_offsets_np = np.frombuffer(poff_b, np.int64)
        pos_np = np.frombuffer(pos_b, np.int32)
        dlen = np.frombuffer(dlen_b, np.int32)
    else:
        # term -> {doc -> [positions]}
        term_docs: dict[str, dict[int, list[int]]] = {}
        dlen = np.zeros(len(docs), dtype=np.int32)
        for did, doc in enumerate(docs):
            toks = tokenize_with_positions(doc.text)
            dlen[did] = len(toks)
            for tok, pos in toks:
                term_docs.setdefault(tok, {}).setdefault(did, []).append(pos)
        terms = sorted(term_docs)
        offsets = np.zeros(len(terms) + 1, dtype=np.int64)
        docs_arr: list[int] = []
        tfs_arr: list[int] = []
        pos_offsets: list[int] = [0]
        pos_arr: list[int] = []
        for ti, term in enumerate(terms):
            entries = sorted(term_docs[term].items())
            for did, positions in entries:
                docs_arr.append(did)
                tfs_arr.append(min(len(positions), 65535))
                pos_arr.extend(positions)
                pos_offsets.append(len(pos_arr))
            offsets[ti + 1] = len(docs_arr)
        docs_np = np.asarray(docs_arr, np.int32)
        tfs_np = np.asarray(tfs_arr, np.uint16)
        pos_offsets_np = np.asarray(pos_offsets, np.int64)
        pos_np = np.asarray(pos_arr, np.int32)

    total_len = int(dlen.sum())
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "postings_offsets.npy"), offsets)
    np.save(os.path.join(path, "postings_docs.npy"), docs_np)
    np.save(os.path.join(path, "postings_tfs.npy"), tfs_np)
    np.save(os.path.join(path, "positions_offsets.npy"), pos_offsets_np)
    np.save(os.path.join(path, "positions.npy"), pos_np)
    np.save(os.path.join(path, "dlen.npy"), dlen)
    np.savez(os.path.join(path, "columns.npz"), **columns)
    with open(os.path.join(path, "keys.msgpack"), "wb") as f:
        f.write(msgpack.packb(keys))
    with open(os.path.join(path, "terms.msgpack"), "wb") as f:
        f.write(msgpack.packb(terms))
    with open(os.path.join(path, "facets.msgpack"), "wb") as f:
        f.write(msgpack.packb(facets))
    with open(os.path.join(path, "attrs.msgpack"), "wb") as f:
        f.write(msgpack.packb(attrs, default=str))
    meta = {
        "records": len(keys),
        "total_len": int(total_len),
        "kind": kind,
        "tags": sorted(tags),
        # bumped when indexed content/facets change shape in a way that
        # needs a reindex (v2 added /f/{field_type} facets); the
        # stale-format migration rolls affected KBs forward
        "format_version": TEXT_FORMAT_VERSION,
        **(extra_meta or {}),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return SegmentMetadata(
        path=path, records=len(keys), tags=frozenset(tags), index_metadata=meta
    )


# Open-segment cache: segments are immutable once written (meta.json is the
# last file build_segment writes), so re-opens on every searcher refresh —
# msgpack-unpacking O(corpus) keys/attrs each sync — are pure waste. Keyed
# by (path, meta.json stat) so a rewritten directory is never served stale.
_OPEN_CACHE: "dict[tuple, TextSegmentData]" = {}
_OPEN_CACHE_MAX = 1024

import threading as _threading

_OPEN_CACHE_LOCK = _threading.Lock()


def open_text_segment(path: str) -> TextSegmentData:
    meta_path = os.path.join(path, "meta.json")
    st = os.stat(meta_path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    with _OPEN_CACHE_LOCK:
        hit = _OPEN_CACHE.get(key)
    if hit is not None:
        return hit
    seg = _open_text_segment_uncached(path)
    with _OPEN_CACHE_LOCK:
        while len(_OPEN_CACHE) >= _OPEN_CACHE_MAX:
            _OPEN_CACHE.pop(next(iter(_OPEN_CACHE)))
        _OPEN_CACHE[key] = seg
    return seg


def _open_text_segment_uncached(path: str) -> TextSegmentData:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "keys.msgpack"), "rb") as f:
        keys = msgpack.unpackb(f.read())
    with open(os.path.join(path, "terms.msgpack"), "rb") as f:
        terms = msgpack.unpackb(f.read())
    with open(os.path.join(path, "facets.msgpack"), "rb") as f:
        facets_raw = msgpack.unpackb(f.read())
    with open(os.path.join(path, "attrs.msgpack"), "rb") as f:
        attrs = msgpack.unpackb(f.read())
    columns_npz = np.load(os.path.join(path, "columns.npz"))
    return TextSegmentData(
        path=path,
        keys=keys,
        terms=terms,
        # offset tables load into RAM: the hot host paths (phrase/ematch
        # verification, doc_positions) do scalar indexing, and per-scalar
        # memmap reads were the top host cost in the keyword-find profile;
        # the big postings/positions payloads stay memmap'd
        postings_offsets=np.load(os.path.join(path, "postings_offsets.npy")),
        postings_docs=np.load(os.path.join(path, "postings_docs.npy"), mmap_mode="r"),
        postings_tfs=np.load(os.path.join(path, "postings_tfs.npy"), mmap_mode="r"),
        positions_offsets=np.load(os.path.join(path, "positions_offsets.npy")),
        positions=np.load(os.path.join(path, "positions.npy"), mmap_mode="r"),
        dlen=np.load(os.path.join(path, "dlen.npy")),
        facets={k: np.asarray(v, dtype=np.int32) for k, v in facets_raw.items()},
        attrs=attrs,
        columns={k: columns_npz[k] for k in columns_npz.files},
        tags=frozenset(meta.get("tags", [])),
        meta=meta,
    )


def alive_mask_text(
    segment: TextSegmentData, segment_seq: Seq, deletions: Sequence[tuple[str, Seq]]
) -> np.ndarray:
    """Key-prefix deletions with seq > segment seq (same rule as vector)."""
    mask = np.ones(segment.n_docs, dtype=bool)
    applicable = [key for key, seq in deletions if seq > segment_seq]
    if applicable:
        mask &= ~segment.key_prefix_mask(applicable)
    return mask


def merge_text_segments(out_path, open_index, *, kind: str):
    """Merge text segments: re-tokenization-free concatenation of postings
    would need global term remap anyway, so we rebuild from stored postings.

    Replaces nidx_tantivy's merge (index_reader.rs merge) — same semantics:
    alive docs of all operants, deletions applied by seq.

    Known divergence: documents are reconstructed from their token streams,
    so position gaps left by dropped over-long tokens (>40 chars) collapse —
    a phrase spanning such a gap can start matching after a merge. Bounded
    to documents containing 40+ character tokens.
    """
    # Rebuild DocEntries from postings (text is not stored; reconstruct a
    # positional token stream per doc).
    out_docs: list[DocEntry] = []
    tags: set[str] = set()
    deletions = list(open_index.deletions())
    for seg_meta, seq in open_index.segments():
        seg = open_text_segment(seg_meta.path)
        tags |= set(seg.tags)
        keep = alive_mask_text(seg, seq, deletions)
        doc_tokens: dict[int, list[tuple[int, str]]] = {}
        for ti, term in enumerate(seg.terms):
            lo, hi = seg.postings_offsets[ti], seg.postings_offsets[ti + 1]
            for pi in range(lo, hi):
                did = int(seg.postings_docs[pi])
                if not keep[did]:
                    continue
                plo, phi = seg.positions_offsets[pi], seg.positions_offsets[pi + 1]
                for p in np.asarray(seg.positions[plo:phi]):
                    doc_tokens.setdefault(did, []).append((int(p), term))
        inv_facets: dict[int, list[str]] = {}
        for facet, dids in seg.facets.items():
            for did in dids:
                inv_facets.setdefault(int(did), []).append(facet)
        for did in np.nonzero(keep)[0]:
            did = int(did)
            toks = [t for _, t in sorted(doc_tokens.get(did, []))]
            out_docs.append(
                DocEntry(
                    key=seg.keys[did],
                    text=" ".join(toks),
                    facets=inv_facets.get(did, []),
                    attrs=seg.attrs[did],
                    columns={name: int(col[did]) for name, col in seg.columns.items()},
                )
            )
    return build_segment(out_path, out_docs, kind=kind, tags=tags)
