"""Device-resident consolidated vector index + fused search kernels.

The reference searches each segment separately and merges on the host
(nidx_vector/src/searcher.rs:201-394). On TPU that design would pay one
dispatch round-trip per segment; instead the searcher consolidates all open
segments of an index into ONE set of padded device buffers at sync time —
segments stay an immutable *storage* concept, device state is a single
scan-friendly arena:

    vectors   [Nv_pad, D]  f32    all alive+dead vectors, zero-padded
    vec_para  [Nv_pad]     int32  owner paragraph (padding rows -> pad slot)
    codes     int8 / binary codes over the same arena (per config)

One fused jitted program then does: (quantized scan -> candidates ->) exact
scores -> per-paragraph max (multivector dedup, replaces per-result dedup in
Fssc, searcher.rs:150-199) -> filter mask -> top-k. Query batches and arena
sizes are bucketed to powers of two so the jit cache stays small.

Filters arrive as a single boolean paragraph mask built on the host from
label postings / key-prefix ranges / segment tags / deletions — the kernel
input replacing the reference's FilterBitSet + NodeFilter machinery
(inverted_index.rs, hnsw/search.rs NodeFilter).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import quant
from ...ops.distance import prepare_query, scores_matmul
from ...ops.topk import NEG_INF, masked_topk
from ...types import Seq
from .config import EXACT_SCAN_THRESHOLD, Quantization, VectorConfig
from .segment import LoadedSegment, alive_mask, key_prefix_ranges


def bucket(n: int, minimum: int = 128) -> int:
    """Next power-of-two size >= n (>= minimum), bounding jit recompiles."""
    size = minimum
    while size < n:
        size *= 2
    return size


@dataclass
class VectorHit:
    key: str
    score: float
    labels: list[str]
    metadata: dict


class DeviceVectorIndex:
    """All open segments of one vector index, resident on device."""

    def __init__(
        self,
        config: VectorConfig,
        segments: Sequence[tuple[LoadedSegment, Seq]],
        deletions: Sequence[tuple[str, Seq]] = (),
    ):
        self.config = config
        dim = config.dimension

        keys: list[str] = []
        para_meta: list[dict] = []
        para_labels_postings: dict[str, list[np.ndarray]] = {}
        seg_tags: list[frozenset[str]] = []
        para_seg_chunks: list[np.ndarray] = []
        alive_chunks: list[np.ndarray] = []
        vec_chunks: list[np.ndarray] = []
        vec_para_chunks: list[np.ndarray] = []

        para_offset = 0
        for seg_idx, (seg, seq) in enumerate(segments):
            seg_tags.append(seg.tags)
            keys.extend(seg.keys)
            para_meta.extend(seg.para_meta)
            for label, pids in seg.labels.items():
                para_labels_postings.setdefault(label, []).append(pids + para_offset)
            para_seg_chunks.append(np.full(seg.n_paragraphs, seg_idx, dtype=np.int32))
            alive_chunks.append(alive_mask(seg, seq, deletions))
            vec_chunks.append(np.asarray(seg.vectors, dtype=np.float32))
            vec_para_chunks.append(np.asarray(seg.vec_para, dtype=np.int32) + para_offset)
            para_offset += seg.n_paragraphs

        self.keys = keys
        self.para_meta = para_meta
        self.seg_tags = seg_tags
        self.labels = {
            label: np.sort(np.concatenate(chunks))
            for label, chunks in para_labels_postings.items()
        }
        self.n_para = para_offset
        self.para_seg = (
            np.concatenate(para_seg_chunks) if para_seg_chunks else np.zeros(0, np.int32)
        )
        self.alive = (
            np.concatenate(alive_chunks) if alive_chunks else np.zeros(0, bool)
        )

        vectors = (
            np.concatenate(vec_chunks) if vec_chunks else np.zeros((0, dim), np.float32)
        )
        vec_para = (
            np.concatenate(vec_para_chunks) if vec_para_chunks else np.zeros(0, np.int32)
        )
        self.n_vec = vectors.shape[0]

        # pad paragraph space, reserving the last slot as the always-masked
        # "padding paragraph" every padding vector points at
        self.p_pad = bucket(self.n_para + 1)
        self.nv_pad = bucket(max(self.n_vec, 1))
        pad_rows = self.nv_pad - self.n_vec
        vectors_p = np.concatenate([vectors, np.zeros((pad_rows, dim), np.float32)])
        vec_para_p = np.concatenate(
            [vec_para, np.full(pad_rows, self.p_pad - 1, np.int32)]
        )

        self.vectors = jax.device_put(jnp.asarray(vectors_p))
        self.vec_para = jax.device_put(jnp.asarray(vec_para_p))

        self.codes: quant.Int8Codes | quant.BinaryCodes | None = None
        if self.n_vec > EXACT_SCAN_THRESHOLD:
            if config.quantization == Quantization.INT8:
                self.codes = quant.Int8Codes.encode(self.vectors)
            elif config.quantization == Quantization.BINARY:
                self.codes = quant.BinaryCodes.encode(self.vectors)

    # ------------------------------------------------------------------
    # Masks (host side)
    # ------------------------------------------------------------------

    def base_mask(self) -> np.ndarray:
        """alive ∧ not-padding, padded to p_pad."""
        mask = np.zeros(self.p_pad, dtype=bool)
        mask[: self.n_para] = self.alive
        return mask

    def label_postings(self, label: str) -> np.ndarray:
        return self.labels.get(label, np.zeros(0, np.int32))

    def key_prefix_postings(self, prefixes: Sequence[str]) -> np.ndarray:
        out = []
        for lo, hi in key_prefix_ranges(self.keys, prefixes):
            out.append(np.arange(lo, hi, dtype=np.int32))
        return np.concatenate(out) if out else np.zeros(0, np.int32)

    def segment_tag_mask(self, allowed: Sequence[int]) -> np.ndarray:
        """Mask keeping only paragraphs from the given segment indices."""
        keep = np.zeros(len(self.seg_tags), dtype=bool)
        keep[list(allowed)] = True
        mask = np.zeros(self.p_pad, dtype=bool)
        mask[: self.n_para] = keep[self.para_seg]
        return mask

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        *,
        para_mask: np.ndarray | None = None,
        min_score: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k paragraphs per query.

        queries: [B, D] (single) or [B, M, D] (multivector MaxSim query).
        para_mask: [p_pad] or [n_para] bool (combined with base mask).
        Returns ([B, k] scores, [B, k] paragraph ids, -1 = empty).
        """
        mask = self.base_mask()
        if para_mask is not None:
            if para_mask.shape[0] == self.n_para:
                full = np.zeros(self.p_pad, dtype=bool)
                full[: self.n_para] = para_mask
                para_mask = full
            mask &= para_mask
        mask_j = jnp.asarray(mask)
        ms = jnp.float32(NEG_INF if min_score is None else min_score)

        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 3:
            b_pad = bucket(q.shape[0], minimum=1)
            m = q.shape[1]
            qp = np.zeros((b_pad, m, q.shape[2]), np.float32)
            qp[: q.shape[0]] = q
            qmask = np.zeros((b_pad, m), dtype=bool)
            qmask[: q.shape[0]] = np.abs(q).sum(-1) > 0
            s, i = _search_maxsim(
                self.vectors, self.vec_para, jnp.asarray(qp), jnp.asarray(qmask),
                mask_j, ms, top_k, self.p_pad, self.config.similarity.value,
            )
        else:
            b_pad = bucket(q.shape[0], minimum=8)
            qp = np.zeros((b_pad, q.shape[1]), np.float32)
            qp[: q.shape[0]] = q
            qj = jnp.asarray(qp)
            if isinstance(self.codes, quant.Int8Codes):
                s, i = _search_int8(
                    self.codes, self.vectors, self.vec_para, qj, mask_j, ms,
                    top_k, self.p_pad, self.config.similarity.value,
                )
            elif isinstance(self.codes, quant.BinaryCodes):
                s, i = _search_binary(
                    self.codes, self.vectors, self.vec_para, qj, mask_j, ms,
                    top_k, self.p_pad, self.config.similarity.value,
                )
            else:
                s, i = _search_exact(
                    self.vectors, self.vec_para, qj, mask_j, ms,
                    top_k, self.p_pad, self.config.similarity.value,
                )
        b = q.shape[0]
        return np.asarray(s)[:b], np.asarray(i)[:b]

    def hits(self, scores_row: np.ndarray, ids_row: np.ndarray) -> list[VectorHit]:
        """Materialize one query's results as VectorHits (host)."""
        out = []
        inv_labels: dict[int, list[str]] = {}
        for pid, score in zip(ids_row.tolist(), scores_row.tolist()):
            if pid < 0:
                continue
            if pid not in inv_labels:
                inv_labels[pid] = [
                    label
                    for label, pids in self.labels.items()
                    if np.searchsorted(pids, pid) < len(pids)
                    and pids[np.searchsorted(pids, pid)] == pid
                ]
            out.append(
                VectorHit(
                    key=self.keys[pid],
                    score=float(score),
                    labels=inv_labels[pid],
                    metadata=self.para_meta[pid],
                )
            )
        return out


# --------------------------------------------------------------------------
# Fused kernels
# --------------------------------------------------------------------------


def _para_scatter_max(
    scores: jax.Array, para_ids: jax.Array, p_pad: int
) -> jax.Array:
    """[..., C] scores + [..., C] or [C] paragraph ids -> [..., p_pad] max."""
    init = jnp.full((*scores.shape[:-1], p_pad), NEG_INF, dtype=jnp.float32)
    if para_ids.ndim == 1:
        idx = (Ellipsis, para_ids)
        return init.at[idx].max(scores, mode="drop")

    def one(row_scores, row_ids):
        return jnp.full((p_pad,), NEG_INF, jnp.float32).at[row_ids].max(
            row_scores, mode="drop"
        )

    for _ in range(scores.ndim - 1):
        one = jax.vmap(one)
    return one(scores, para_ids)


def _final_topk(para_scores, para_mask, min_score, k):
    return masked_topk(para_scores, k, mask=para_mask, min_score=min_score)


@partial(jax.jit, static_argnames=("k", "p_pad", "similarity"))
def _search_exact(vectors, vec_para, queries, para_mask, min_score, k, p_pad, similarity):
    q = prepare_query(queries, similarity)
    scores = scores_matmul(q, vectors)  # [B, Nv]
    para_scores = _para_scatter_max(scores, vec_para, p_pad)
    return _final_topk(para_scores, para_mask, min_score, k)


def _rerank_and_cut(vectors, vec_para, q, cand_ids, para_mask, min_score, k, p_pad):
    safe = jnp.maximum(cand_ids, 0)
    cand_vecs = vectors[safe]  # [B, C, D]
    exact = jnp.einsum(
        "bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cand_para = vec_para[safe]
    cand_para = jnp.where(cand_ids >= 0, cand_para, p_pad - 1)
    para_scores = _para_scatter_max(exact, cand_para, p_pad)
    return _final_topk(para_scores, para_mask, min_score, k)


@partial(jax.jit, static_argnames=("k", "p_pad", "similarity"))
def _search_int8(codes, vectors, vec_para, queries, para_mask, min_score, k, p_pad, similarity):
    q = prepare_query(queries, similarity)
    vec_mask = para_mask[vec_para]  # padding vectors point at the masked pad slot
    est = quant.int8_estimate_scores(codes, q)
    # oversample candidates: the paragraph dedup can collapse several vectors
    c = min(quant.int8_rerank_budget(k) + k, est.shape[-1])
    _, cand = quant.approx_candidates(est, c, mask=vec_mask)
    return _rerank_and_cut(vectors, vec_para, q, cand, para_mask, min_score, k, p_pad)


@partial(jax.jit, static_argnames=("k", "p_pad", "similarity"))
def _search_binary(codes, vectors, vec_para, queries, para_mask, min_score, k, p_pad, similarity):
    q = prepare_query(queries, similarity)
    vec_mask = para_mask[vec_para]
    est, bound = quant.binary_estimate_scores(codes, q)
    c = min(quant.binary_rerank_budget(k) + k, est.shape[-1])
    _, cand = quant.approx_candidates(est + bound, c, mask=vec_mask)
    return _rerank_and_cut(vectors, vec_para, q, cand, para_mask, min_score, k, p_pad)


@partial(jax.jit, static_argnames=("k", "p_pad", "similarity"))
def _search_maxsim(vectors, vec_para, queries, qmask, para_mask, min_score, k, p_pad, similarity):
    """Multivector MaxSim: sum over query sub-vectors of the per-paragraph max.

    Parity with nidx_vector/src/multivector.rs:33-46 (maxsim_similarity),
    computed as one batched contraction + scatter-max instead of per-sub-
    vector searches.
    """
    b, m, d = queries.shape
    q = prepare_query(queries.reshape(b * m, d), similarity).reshape(b, m, d)
    scores = jnp.einsum(
        "bmd,nd->bmn", q, vectors, preferred_element_type=jnp.float32
    )  # [B, M, Nv]
    para_scores = _para_scatter_max(scores, vec_para, p_pad)  # [B, M, P]
    # zero out padded sub-vectors AND the NEG_INF slots of vector-less
    # (padding) paragraphs so the sum over M stays finite; padding paragraphs
    # are excluded by para_mask at the final cut anyway
    contrib = jnp.where(
        qmask[:, :, None] & (para_scores > NEG_INF / 2), para_scores, 0.0
    )
    maxsim = contrib.sum(axis=1)  # [B, P]
    return _final_topk(maxsim, para_mask, min_score, k)
