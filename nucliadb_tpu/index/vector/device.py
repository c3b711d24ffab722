"""Device-resident consolidated vector index + fused search kernels.

The reference searches each segment separately and merges on the host
(nidx_vector/src/searcher.rs:201-394). On TPU that design would pay one
dispatch round-trip per segment; instead the searcher consolidates all open
segments of an index into ONE set of padded device buffers at sync time —
segments stay an immutable *storage* concept, device state is a single
scan-friendly arena.

Layout (chosen so paragraph dedup never needs a scatter — XLA TPU scatters
are both slow at runtime and expensive to compile):

- SINGLE cardinality: one vector per record, so the vector arena IS the
  paragraph arena: ``vectors [P_pad, D]``; ids returned by top-k are
  paragraph ids directly.
- MULTI cardinality (multivector / MaxSim): uniform slots
  ``vectors [P_pad * m_max, D]`` where slot ``p * m_max + j`` is the j-th
  vector of paragraph p (zero-padded); per-paragraph reduction is a
  reshape + masked max, the slot count per paragraph lives in
  ``m_count [P_pad]``.

One fused jitted program per query batch does: (quantized scan ->
candidates -> exact rerank ->) masked top-k. Query batches and arena sizes
are bucketed to powers of two so the jit cache stays small.

Platform rules baked into this module (measured on the axon-tunneled v5e):
- NEVER close over device arrays in a jitted function — they are inlined as
  constants and shipped to the compile service (a 512 MB HLO).
- No scatters in the search path; gathers are fine.
- Everything per query is ONE jit call; eager dispatches cost ~1-3ms each.

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
from ...utils.platform import configure_jax, device_fetch, device_scalar_f32
from .config import (
    EXACT_SCAN_THRESHOLD,
    Quantization,
    VectorCardinality,
    VectorConfig,
)
from .segment import LoadedSegment, alive_mask, key_prefix_ranges


from ...utils.buckets import bucket  # shared {2^k, 1.5*2^k} ladder

import os as _os_mod

# host numpy exact tier eligibility: p_pad * dim at or below this runs the
# exact scan on host BLAS instead of dispatching a device program (default
# 2M elements ≈ 16k×128 / 2.7k×768 — a scan of tens of µs vs ~1-2 ms of
# CPU-backend dispatch overhead or a ~25 ms tunneled-TPU relay RTT).
# 0 disables the tier.
HOST_SCAN_ELEMS = int(
    _os_mod.environ.get("NDBTPU_VECTOR_HOST_SCAN_ELEMS", 2_097_152) or 0
)


@dataclass
class VectorHit:
    key: str
    score: float
    labels: list[str]
    metadata: dict


@jax.jit
def _arena_append(arena, delta, start):
    """Write delta rows into the (padded) arena at ``start`` on device —
    the incremental-refresh path uploads only the NEW rows instead of the
    whole corpus (host->device moves ~10 MB/s through the deployment
    relay; a full re-upload per searcher refresh was the sync cost)."""
    return jax.lax.dynamic_update_slice(arena, delta, (start, 0))


@jax.jit
def _scale_append(arr, delta, start):
    """1-D companion of _arena_append (per-row quantization scales)."""
    return jax.lax.dynamic_update_slice(arr, delta, (start,))


class DeviceVectorIndex:
    """All open segments of one vector index, resident on device."""

    def __init__(
        self,
        config: VectorConfig,
        segments: Sequence[tuple[LoadedSegment, Seq]],
        deletions: Sequence[tuple[str, Seq]] = (),
        prev: "DeviceVectorIndex | None" = None,
    ):
        configure_jax()
        self.config = config
        self.multi = config.cardinality == VectorCardinality.MULTI
        dim = config.dimension

        keys: list[str] = []
        para_meta: list[dict] = []
        para_labels_postings: dict[str, list[np.ndarray]] = {}
        seg_tags: list[frozenset[str]] = []
        para_seg_chunks: list[np.ndarray] = []
        alive_chunks: list[np.ndarray] = []
        per_para_vecs: list[np.ndarray] = []  # multi: one [m_i, D] array per paragraph
        vec_chunks: list[np.ndarray] = []  # single: [n_i, D] per segment

        para_offset = 0
        for seg_idx, (seg, seq) in enumerate(segments):
            seg_tags.append(seg.tags)
            keys.extend(seg.keys)
            para_meta.extend(seg.para_meta)
            for label, pids in seg.labels.items():
                para_labels_postings.setdefault(label, []).append(pids + para_offset)
            para_seg_chunks.append(np.full(seg.n_paragraphs, seg_idx, dtype=np.int32))
            alive_chunks.append(alive_mask(seg, seq, deletions))
            sv = np.asarray(seg.vectors, dtype=np.float32)
            if self.multi:
                vp = np.asarray(seg.vec_para)
                first = np.searchsorted(vp, np.arange(seg.n_paragraphs), side="left")
                last = np.searchsorted(vp, np.arange(seg.n_paragraphs), side="right")
                for p in range(seg.n_paragraphs):
                    per_para_vecs.append(sv[first[p] : last[p]])
            else:
                if sv.shape[0] != seg.n_paragraphs:
                    raise ValueError(
                        "single-cardinality index with multi-vector segment"
                    )
                vec_chunks.append(sv)
            para_offset += seg.n_paragraphs

        self.keys = keys
        # per-segment identity for the incremental-refresh prefix check
        # (comparing key lists would be O(corpus) strings per refresh)
        self._seg_sig = tuple(
            (seg.path, int(seq), seg.n_paragraphs) for seg, seq in segments
        )
        self.para_meta = para_meta
        self.seg_tags = seg_tags
        self.labels = {
            label: np.sort(np.concatenate(chunks))
            for label, chunks in para_labels_postings.items()
        }
        self.n_para = para_offset
        # per-segment sorted key runs (see key_prefix_postings)
        self.seg_bounds: list[tuple[int, int]] = []
        run_lo = 0
        for seg, _ in segments:
            self.seg_bounds.append((run_lo, run_lo + seg.n_paragraphs))
            run_lo += seg.n_paragraphs
        self.para_seg = (
            np.concatenate(para_seg_chunks) if para_seg_chunks else np.zeros(0, np.int32)
        )
        self.alive = np.concatenate(alive_chunks) if alive_chunks else np.zeros(0, bool)

        # reserve >=1 padding slot so the pad paragraph is always maskable
        self.p_pad = bucket(self.n_para + 1)

        if self.multi:
            counts = np.array([v.shape[0] for v in per_para_vecs], dtype=np.int32)
            self.m_max = bucket(int(counts.max()) if counts.size else 1, minimum=1)
            arena = np.zeros((self.p_pad * self.m_max, dim), np.float32)
            for p, v in enumerate(per_para_vecs):
                arena[p * self.m_max : p * self.m_max + v.shape[0]] = v
            m_count = np.zeros(self.p_pad, np.int32)
            m_count[: self.n_para] = counts
            self.m_count = jax.device_put(jnp.asarray(m_count))
        else:
            self.m_max = 1
            flat = (
                np.concatenate(vec_chunks) if vec_chunks else np.zeros((0, dim), np.float32)
            )
            arena = None  # built lazily: the incremental path never needs it
            self.m_count = None

        # flag "bf16": store the rerank arena in bfloat16 — halves the
        # dominant HBM cost (f32 vectors are 3 GB per 1M x 768; codes are
        # 0.77 GB) so one chip holds ~2x the corpus. Scores still accumulate
        # in f32 on the MXU (preferred_element_type), so recall impact is
        # the bf16 rounding of inputs only (~1e-3 on normalized dots).
        store_dtype = jnp.bfloat16 if "bf16" in config.flags else jnp.float32

        # ---- beyond-HBM paging -------------------------------------------
        # NDBTPU_VECTOR_ARENA_BUDGET (bytes of device memory this index may
        # hold) selects the residency tier when the corpus outgrows it
        # (the counterpart of the reference's mmap'd stores + segment paging,
        # nidx_vector/src/data_store.rs + nidx/src/searcher/sync.rs:57-219):
        #
        #   resident     codes + f32 arena in HBM (default; budget unset/fits)
        #   host_rerank  int8 codes in HBM, f32 rows PAGE from host RAM —
        #                the estimate pass stays an MXU scan; only the
        #                ~rerank-budget candidate rows per query cross the
        #                relay (int8 codes are 1/4 the f32 bytes, so this
        #                tier serves ~5x the resident corpus per chip)
        #   stream       nothing resident: chunked device scan over host
        #                RAM (correct at any size; multi-chip mesh placement
        #                is the production answer at this scale)
        import os as _os

        self.paging: "str | None" = None
        self.vectors_host: "np.ndarray | None" = None
        self._host_arena: "np.ndarray | None" = None
        budget = int(_os.environ.get("NDBTPU_VECTOR_ARENA_BUDGET", "0") or 0)
        if not self.multi and budget > 0:
            itemsize = 2 if store_dtype == jnp.bfloat16 else 4
            vec_bytes = self.p_pad * dim * itemsize
            code_bytes = self.p_pad * (dim + 4)  # int8 codes + f32 scale
            if vec_bytes + code_bytes > budget:
                arena_np = np.zeros((self.p_pad, dim), np.float32)
                arena_np[: self.n_para] = flat
                self.vectors_host = arena_np
                self.vectors = None
                self._base_mask_dev = None
                self.ivf = None
                self.graph = None
                self.m_count = None
                if (
                    config.quantization == Quantization.INT8
                    and code_bytes <= budget
                ):
                    self.paging = "host_rerank"
                    codes_np, scale_np = _host_int8_encode(arena_np)
                    self.codes = quant.Int8Codes(
                        codes=jax.device_put(jnp.asarray(codes_np)),
                        scale=jax.device_put(jnp.asarray(scale_np)),
                    )
                else:
                    self.paging = "stream"
                    self.codes = None
                    # largest power-of-two row chunk within budget (stable
                    # compiled shapes across chunks and corpora)
                    rows = max(budget // (dim * 4), 8)
                    self.chunk_rows = 1 << (rows.bit_length() - 1)
                return

        extended = None
        if not self.multi and self._can_extend(prev, store_dtype):
            # incremental refresh: the previous index's rows are a prefix of
            # ours (updates/deletes only APPEND segments and extend the
            # deletion list — rows never mutate), so only the delta crosses
            # the relay and the arena updates on device. Delta row counts
            # pad to a small ladder to bound compiled shapes; an unfittable
            # pad falls back to the full build (dynamic_update_slice CLAMPS
            # out-of-range starts, which would silently corrupt tail rows).
            delta = flat[prev.n_para :]
            pad_rows = bucket(max(delta.shape[0], 1), minimum=64)
            if prev.n_para + pad_rows <= self.p_pad:
                delta_padded = np.zeros((pad_rows, dim), np.float32)
                delta_padded[: delta.shape[0]] = delta
                delta_dev = jnp.asarray(delta_padded, dtype=store_dtype)
                extended = _arena_append(
                    prev.vectors, delta_dev, jnp.int32(prev.n_para)
                )
        if extended is not None:
            self.vectors = extended
        else:
            if not self.multi:
                arena = np.zeros((self.p_pad, dim), np.float32)
                arena[: self.n_para] = flat
            self.vectors = jax.device_put(jnp.asarray(arena, dtype=store_dtype))
        self._base_mask_dev: jax.Array | None = None

        # host numpy exact tier (the cost-model sibling of the text engine's
        # host WAND tier): a corpus this small is bounded by the per-call
        # device dispatch cost, not FLOPs — on the CPU backend that is
        # ~1-2 ms of jit/device_put/fetch per call, and through a tunneled
        # TPU it is the ~25 ms relay round trip — while the same exact scan
        # runs in tens of microseconds of BLAS on host. Results mirror
        # _search_exact (stable tie order, Fssc dedup window, min_score)
        # within f32 rounding. Disabled for bf16 arenas (the kernel's bf16
        # input rounding changes scores materially) and by
        # NDBTPU_VECTOR_HOST_SCAN_ELEMS=0.
        if (
            not self.multi
            and store_dtype == jnp.float32
            and self.p_pad * dim <= HOST_SCAN_ELEMS
        ):
            host_arena = np.zeros((self.p_pad, dim), np.float32)
            host_arena[: self.n_para] = flat
            self._host_arena = host_arena

        self.codes: quant.Int8Codes | quant.BinaryCodes | None = None
        if not self.multi and self.n_para > EXACT_SCAN_THRESHOLD:
            if config.quantization == Quantization.INT8:
                if (
                    extended is not None
                    and isinstance(prev.codes, quant.Int8Codes)
                ):
                    # int8 encoding is per-row independent: encode only the
                    # delta and splice, instead of re-reading the whole
                    # arena every refresh
                    dcodes = quant.Int8Codes.encode(delta_dev)
                    self.codes = quant.Int8Codes(
                        codes=_arena_append(
                            prev.codes.codes, dcodes.codes, jnp.int32(prev.n_para)
                        ),
                        scale=_scale_append(
                            prev.codes.scale, dcodes.scale, jnp.int32(prev.n_para)
                        ),
                    )
                else:
                    self.codes = quant.Int8Codes.encode(self.vectors)
            elif config.quantization == Quantization.BINARY:
                self.codes = quant.BinaryCodes.encode(self.vectors)

        # IVF strategy (flag "ivf"): cluster-blocked scan reading nprobe/K of
        # the corpus per query (see ops/ivf.py)
        self.ivf = None
        if not self.multi and "ivf" in config.flags and self.n_para > 0:
            from ...ops import ivf as ivf_ops

            # reuse the biggest segment's persisted centroids when that
            # segment describes enough of the corpus (>= 1/4); k-means then
            # reduces to one assignment pass over the arena
            centroids = None
            best = max(
                (s for s, _ in segments if s.ivf_centroids is not None),
                key=lambda s: s.n_paragraphs,
                default=None,
            )
            if best is not None and best.n_paragraphs * 4 >= self.n_para:
                centroids = jnp.asarray(np.asarray(best.ivf_centroids))
            self.ivf = ivf_ops.build_ivf(
                self.vectors, self.n_para, centroids=centroids
            )

        # graph strategy (flag "hnsw"): batched proximity-graph search for
        # corpora beyond the scan sweet spot (see ops/hnsw.py)
        self.graph = None
        if not self.multi and "hnsw" in config.flags and self.n_para > 0:
            from ...ops import hnsw as hnsw_ops

            stitched = self._stitch_segment_graphs(segments)
            if stitched is not None:
                adj, entry_ids = stitched
                n_components = len(segments)
            else:
                flat = arena[: self.n_para]
                adj, entry_ids = hnsw_ops.build_graph(flat, vectors_dev=self.vectors)
                n_components = 1
            adj_pad = np.full((self.p_pad, adj.shape[1]), -1, np.int32)
            adj_pad[: self.n_para] = adj
            seg_of = None
            if n_components > 1:
                seg_pad = np.zeros(self.p_pad, np.int32)
                seg_pad[: self.n_para] = self.para_seg
                seg_of = jax.device_put(jnp.asarray(seg_pad))
            self.graph = hnsw_ops.DeviceHnsw(
                adj=jax.device_put(jnp.asarray(adj_pad)),
                entry_ids=jax.device_put(jnp.asarray(entry_ids)),
                n_nodes=self.n_para,
                seg_of=seg_of,
                n_segments=n_components,
            )

    def _can_extend(self, prev: "DeviceVectorIndex | None", store_dtype) -> bool:
        if prev is not None and getattr(prev, "paging", None) is not None:
            return False  # paged arenas have no device prefix to extend
        return self._can_extend_resident(prev, store_dtype)

    def _can_extend_resident(self, prev, store_dtype) -> bool:
        """True when ``prev``'s device arena is reusable as a prefix of this
        one: same shape/dtype/padding and identical leading keys (segments
        only ever append — updates add a new segment plus deletions, so
        existing rows never change content, only aliveness)."""
        if prev is None or prev.multi or self.multi:
            return False
        if prev.config.dimension != self.config.dimension:
            return False
        if set(prev.config.flags) != set(self.config.flags):
            return False
        if "ivf" in self.config.flags or "hnsw" in self.config.flags:
            return False  # those strategies hold derived per-arena state
        if prev.p_pad != self.p_pad or prev.n_para > self.n_para:
            return False
        if prev.vectors.dtype != store_dtype:
            return False
        return self._seg_sig[: len(prev._seg_sig)] == prev._seg_sig

    @staticmethod
    def _stitch_segment_graphs(
        segments: Sequence[tuple[LoadedSegment, Seq]],
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Disjoint union of the segments' persisted graphs (parity: disk
        HNSW reuse, hnsw/disk.rs). Node ids shift by each segment's paragraph
        base offset; entry sets union. No cross-segment edges exist — the
        beam expands every segment's subgraph in the same fixed-trip search,
        which matches the reference's per-segment HNSW search + host merge
        semantics. Returns None (→ rebuild) if any segment lacks a graph."""
        # beyond ~8 components the per-component beam slots stop paying for
        # themselves (the merge policy keeps open segment counts below this)
        if (
            not segments
            or len(segments) > 8
            or any(seg.hnsw_adj is None for seg, _ in segments)
        ):
            return None
        m_max = max(seg.hnsw_adj.shape[1] for seg, _ in segments)
        adj_parts: list[np.ndarray] = []
        entry_parts: list[np.ndarray] = []
        offset = 0
        for seg, _ in segments:
            adj = np.asarray(seg.hnsw_adj, dtype=np.int32)
            if adj.shape[1] < m_max:
                adj = np.pad(
                    adj, ((0, 0), (0, m_max - adj.shape[1])), constant_values=-1
                )
            adj_parts.append(np.where(adj >= 0, adj + offset, -1))
            entry_parts.append(np.asarray(seg.hnsw_entry, dtype=np.int32) + offset)
            offset += seg.n_paragraphs
        return np.concatenate(adj_parts), np.concatenate(entry_parts)

    # ------------------------------------------------------------------
    # Masks (host side)
    # ------------------------------------------------------------------

    def base_mask(self) -> np.ndarray:
        """alive ∧ not-padding, padded to p_pad."""
        mask = np.zeros(self.p_pad, dtype=bool)
        mask[: self.n_para] = self.alive
        return mask

    def base_mask_device(self) -> jax.Array:
        if self._base_mask_dev is None:
            self._base_mask_dev = jax.device_put(jnp.asarray(self.base_mask()))
        return self._base_mask_dev

    def label_postings(self, label: str) -> np.ndarray:
        return self.labels.get(label, np.zeros(0, np.int32))

    def key_prefix_postings(self, prefixes: Sequence[str]) -> np.ndarray:
        out = []
        # bisect within each segment's sorted run — the concatenated key
        # list is NOT globally sorted across segments
        for lo, hi in key_prefix_ranges(self.keys, prefixes, self.seg_bounds):
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
        with_duplicates: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k paragraphs per query.

        queries: [B, D] (single) or [B, M, D] (multivector MaxSim query).
        para_mask: [p_pad] or [n_para] bool (combined with base mask).
        ``with_duplicates=False`` drops results repeating an identical
        vector (the reference's Fssc dedup, searcher.rs:150-199).
        Returns ([B, k] scores, [B, k] paragraph ids, -1 = empty).
        """
        dedup = not with_duplicates
        q_np = np.asarray(queries, dtype=np.float32)
        if (
            q_np.ndim == 2
            and self._host_arena is not None
            and self.codes is None
            and self.ivf is None
            and self.graph is None
            and self.paging is None
        ):
            # host numpy exact tier: identical results to _search_exact
            # without a device dispatch (see __init__)
            if para_mask is None:
                mask_np = self.base_mask()
            else:
                if para_mask.shape[0] == self.n_para:
                    full = np.zeros(self.p_pad, dtype=bool)
                    full[: self.n_para] = para_mask
                    para_mask = full
                mask_np = self.base_mask() & para_mask
            s, i = self._search_host_exact(
                q_np, top_k, mask_np,
                float(NEG_INF) if min_score is None else float(min_score),
                dedup,
            )
            return s, i
        if para_mask is None:
            mask_j = self.base_mask_device()
            matching = int(self.alive.sum())
        else:
            if para_mask.shape[0] == self.n_para:
                full = np.zeros(self.p_pad, dtype=bool)
                full[: self.n_para] = para_mask
                para_mask = full
            combined = self.base_mask() & para_mask
            matching = int(combined.sum())
            mask_j = jnp.asarray(combined)
        ms = device_scalar_f32(float(NEG_INF) if min_score is None else float(min_score))

        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 3:
            if not self.multi:
                raise ValueError("multivector query against a single-vector index")
            b_pad = bucket(q.shape[0], minimum=1)
            m = q.shape[1]
            qp = np.zeros((b_pad, m, q.shape[2]), np.float32)
            qp[: q.shape[0]] = q
            qmask = np.zeros((b_pad, m), dtype=bool)
            qmask[: q.shape[0]] = np.abs(q).sum(-1) > 0
            s, i = _search_maxsim(
                self.vectors, self.m_count, jnp.asarray(qp), jnp.asarray(qmask),
                mask_j, ms, top_k, self.m_max, self.config.similarity.value,
                dedup=dedup,
            )
        elif self.multi:
            # single query vector against a multivector index: MaxSim with M=1
            return self.search(
                q[:, None, :], top_k, para_mask=para_mask, min_score=min_score,
                with_duplicates=with_duplicates,
            )
        elif self.paging is not None:
            combined_np = (
                self.base_mask()
                if para_mask is None
                else np.asarray(mask_j)
            )
            s, i = self._search_paged(q, top_k, combined_np, min_score, dedup)
            return s[: q.shape[0]], i[: q.shape[0]]
        else:
            b_pad = bucket(q.shape[0], minimum=8)
            qp = np.zeros((b_pad, q.shape[1]), np.float32)
            qp[: q.shape[0]] = q
            qj = jnp.asarray(qp)
            # ivf/hnsw honor dedup by over-fetching candidates and running
            # the shared exact-rescore + duplicate-mask cut (the walk/probe
            # kernels themselves don't know about Fssc semantics)
            k1 = min(2 * top_k + 8, self.p_pad) if dedup else top_k
            if self.ivf is not None:
                from ...ops import ivf as ivf_ops

                pq = prepare_query(qj, self.config.similarity.value)
                s, i = ivf_ops.ivf_search(
                    self.ivf, self.vectors, pq, mask_j, ms, k1
                )
                if dedup:
                    s, i = _exact_dedup_cut(
                        self.vectors, qj, i, ms, top_k,
                        self.config.similarity.value,
                    )
            elif self.graph is not None and self._use_graph(matching, top_k):
                from ...ops import hnsw as hnsw_ops

                # size-scaled default regime: big corpora need the wider
                # beam to hold the reference's >= 0.95 recall@10 bar
                ef, trips = hnsw_ops.default_search_params(self.graph.n_nodes)
                s, i = hnsw_ops.hnsw_search(
                    self.vectors, self.graph.adj, self.graph.entry_ids, qj,
                    mask_j, ms, k1, ef=ef, trips=trips,
                    similarity=self.config.similarity.value,
                    seg_of=self.graph.seg_of, n_segments=self.graph.n_segments,
                )
                if dedup:
                    s, i = _exact_dedup_cut(
                        self.vectors, qj, i, ms, top_k,
                        self.config.similarity.value,
                    )
            elif isinstance(self.codes, quant.Int8Codes):
                from ...ops import pallas_scan

                if "pallas" in self.config.flags and pallas_scan.eligible(
                    self.p_pad, self.config.dimension, self.multi
                ):
                    s, i = _search_int8_pallas(
                        self.codes, self.vectors, qj, mask_j, ms, top_k,
                        self.config.similarity.value,
                        interpret=jax.default_backend() == "cpu",
                        dedup=dedup,
                    )
                else:
                    s, i = _search_int8(
                        self.codes, self.vectors, qj, mask_j, ms, top_k,
                        self.config.similarity.value, dedup=dedup,
                    )
            elif isinstance(self.codes, quant.BinaryCodes):
                from ...ops import pallas_scan

                # batch cap 64: beyond that the adaptive block shrinks and
                # the measured kernel falls behind XLA (47 vs 66 ms/call at
                # 1M x 768 batch 256 on the v5e)
                if (
                    "pallas" in self.config.flags
                    and qj.shape[0] <= 64
                    and pallas_scan.binary_eligible(
                        self.p_pad, self.config.dimension, self.multi,
                        block_n=pallas_scan.binary_block_for(
                            self.p_pad, qj.shape[0], pallas_scan.SLOTS
                        ),
                    )
                ):
                    s, i = _search_binary_pallas(
                        self.codes, self.vectors, qj, mask_j, ms, top_k,
                        self.config.similarity.value,
                        interpret=jax.default_backend() == "cpu",
                        dedup=dedup,
                    )
                else:
                    s, i = _search_binary(
                        self.codes, self.vectors, qj, mask_j, ms, top_k,
                        self.config.similarity.value, dedup=dedup,
                    )
            else:
                s, i = _search_exact(
                    self.vectors, qj, mask_j, ms, top_k,
                    self.config.similarity.value, dedup=dedup,
                )
        b = q.shape[0] if q.ndim == 2 else queries.shape[0]
        # one blocking wait for both output buffers (two serial np.asarray
        # fetches pay two relay round trips)
        s, i = device_fetch(s, i)
        return s[:b], i[:b]

    # ---- beyond-HBM search tiers ----------------------------------------

    def _search_paged(
        self, q: np.ndarray, k: int, mask_np: np.ndarray,
        min_score: "float | None", dedup: bool,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Search when the f32 arena lives in host RAM (see __init__).

        host_rerank: device int8 estimate scan -> candidate ids -> host
        gather + exact f32 rescore/dedup/cut (only ~rerank-budget rows per
        query ever leave host RAM).
        stream: chunked exact device scans over the host arena -> merged
        candidates -> the same host rescore."""
        sim = self.config.similarity.value
        b_pad = bucket(q.shape[0], minimum=8)
        qp = np.zeros((b_pad, q.shape[1]), np.float32)
        qp[: q.shape[0]] = q
        if self.paging == "host_rerank":
            qj = prepare_query(jnp.asarray(qp), sim)
            c = min(quant.int8_rerank_budget(k), self.p_pad)
            cand = _int8_candidates_jit(self.codes, qj, c, jnp.asarray(mask_np))
            qj, cand = device_fetch(qj, cand)
            return self._host_rerank_cut(qj, cand, k, min_score, dedup)
        # stream: per-chunk exact top-k on device, host merge. Pipelined one
        # chunk ahead: chunk n+1's upload+kernel dispatch overlaps chunk n's
        # device→host fetch, while at most TWO chunks are live on device
        # (this tier exists because the arena exceeds HBM — dispatching all
        # chunks up front would queue every chunk's upload at once)
        qj = prepare_query(jnp.asarray(qp), sim)
        k2 = min((2 * k + 8) if dedup else k, self.p_pad)
        parts_s, parts_i = [], []
        rows = self.chunk_rows
        pending = None  # (chunk start, device scores, device ids)

        def _collect(p):
            s, i = device_fetch(p[1], p[2])
            parts_s.append(s)
            parts_i.append(np.where(i >= 0, i + p[0], -1))

        for start in range(0, self.p_pad, rows):
            chunk = self.vectors_host[start : start + rows]
            if chunk.shape[0] < rows:  # stable compiled shape for the tail
                pad = np.zeros((rows, chunk.shape[1]), np.float32)
                pad[: chunk.shape[0]] = chunk
                chunk = pad
            m = np.zeros(rows, dtype=bool)
            m[: min(rows, self.p_pad - start)] = mask_np[start : start + rows]
            s, i = _stream_chunk_topk(
                jnp.asarray(chunk), qj, jnp.asarray(m), min(k2, rows)
            )
            if pending is not None:
                _collect(pending)
            pending = (start, s, i)
        if pending is not None:
            _collect(pending)
        all_s = np.concatenate(parts_s, axis=-1)
        all_i = np.concatenate(parts_i, axis=-1)
        order = np.argsort(-all_s, axis=-1, kind="stable")[:, :k2]
        cand = np.take_along_axis(all_i, order, axis=-1)
        return self._host_rerank_cut(
            np.asarray(qj), cand, k, min_score, dedup
        )

    def _search_host_exact(
        self, q: np.ndarray, k: int, mask_np: np.ndarray,
        min_score_f: float, dedup: bool,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host numpy mirror of _search_exact: full f32 scan + stable top-k
        (+ the same 2k+8 Fssc dedup window). Used below the host-scan
        threshold, where per-call device dispatch cost dominates."""
        arena = self._host_arena
        if self.config.similarity.value == "cosine":
            n = np.linalg.norm(q, axis=-1, keepdims=True)
            q = q / np.maximum(n, np.float32(1e-12))
        neg = np.float32(NEG_INF)
        scores = (q @ arena.T).astype(np.float32, copy=False)  # [B, p_pad]
        scores = np.where(mask_np[None, :], scores, neg)
        if min_score_f > float(NEG_INF):
            scores = np.where(scores >= np.float32(min_score_f), scores, neg)
        if dedup:
            k2 = min(2 * k + 8, scores.shape[-1])
            order = np.argsort(-scores, axis=-1, kind="stable")[:, :k2]
            cand_s = np.take_along_axis(scores, order, axis=-1)
            cand = np.where(cand_s > neg / 2, order, -1)
            rows = arena[np.maximum(cand, 0)]
            valid = cand >= 0
            valid = valid & ~_host_duplicate_mask(rows, valid)
            scored = np.where(valid, cand_s, neg)
            order2 = np.argsort(-scored, axis=-1, kind="stable")[:, :k]
            top_s = np.take_along_axis(scored, order2, axis=-1)
            top_i = np.take_along_axis(cand, order2, axis=-1)
            top_i = np.where(top_s > neg / 2, top_i, -1)
        else:
            order = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
            top_s = np.take_along_axis(scores, order, axis=-1)
            top_i = np.where(top_s > neg / 2, order, -1)
        if k > top_s.shape[1]:
            pad_s = np.full((top_s.shape[0], k - top_s.shape[1]), NEG_INF, np.float32)
            pad_i = np.full((top_i.shape[0], k - top_i.shape[1]), -1, np.int64)
            top_s = np.concatenate([top_s, pad_s], axis=-1)
            top_i = np.concatenate([top_i, pad_i], axis=-1)
        return top_s.astype(np.float32), top_i.astype(np.int64)

    def _host_rerank_cut(
        self, q: np.ndarray, cand: np.ndarray, k: int,
        min_score: "float | None", dedup: bool,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact f32 rescore + Fssc dedup + top-k cut over host-gathered
        candidate rows (the host mirror of _rerank_and_cut)."""
        safe = np.maximum(cand, 0)
        rows = self.vectors_host[safe]  # [B, C, D]
        exact = np.einsum("bd,bcd->bc", q, rows, dtype=np.float32)
        valid = cand >= 0
        if dedup:
            valid = valid & ~_host_duplicate_mask(rows, valid)
        scored = np.where(valid, exact, np.float32(NEG_INF))
        if min_score is not None:
            scored = np.where(scored >= min_score, scored, np.float32(NEG_INF))
        order = np.argsort(-scored, axis=-1, kind="stable")[:, :k]
        top_s = np.take_along_axis(scored, order, axis=-1)
        top_i = np.take_along_axis(cand, order, axis=-1)
        top_i = np.where(top_s > np.float32(NEG_INF) / 2, top_i, -1)
        if k > top_s.shape[1]:  # pad to the requested width
            pad_s = np.full((top_s.shape[0], k - top_s.shape[1]), NEG_INF, np.float32)
            pad_i = np.full((top_i.shape[0], k - top_i.shape[1]), -1, np.int64)
            top_s = np.concatenate([top_s, pad_s], axis=-1)
            top_i = np.concatenate([top_i, pad_i], axis=-1)
        return top_s.astype(np.float32), top_i.astype(np.int64)

    def _use_graph(self, matching: int, top_k: int) -> bool:
        """Per-query graph-vs-scan choice (parity: the reference's analytic
        use_hnsw cost model, nidx_vector/src/segment.rs:626-660): a graph
        walk under a selective filter wastes its visits on masked nodes —
        below ~10% matching ratio (or below the exact-scan sweet spot) the
        scan path wins, and the scan is the recall-exact choice anyway."""
        if self.n_para == 0:
            return False
        # the size-based choice already happened at build time (the graph
        # only exists under the explicit "hnsw" flag); per query only the
        # filter selectivity matters: a walk over a sparse mask wastes its
        # fixed visit budget on dead nodes while the scan reads the same
        # arena either way
        return matching / self.n_para >= 0.1

    def _labels_of(self, pid: int) -> list[str]:
        """Labels of one paragraph. The inverted per-paragraph lists build
        lazily ONCE (scanning every posting list per hit made each response
        O(top_k * n_labels) binary searches on the hot path)."""
        inv = getattr(self, "_para_labels", None)
        if inv is None:
            inv = [[] for _ in range(self.n_para)]
            for label, pids in self.labels.items():
                for p in pids.tolist():
                    inv[p].append(label)
            self._para_labels = inv
        return inv[pid]

    def hits(self, scores_row: np.ndarray, ids_row: np.ndarray) -> list[VectorHit]:
        """Materialize one query's results as VectorHits (host)."""
        out = []
        inv_labels: dict[int, list[str]] = {}
        for pid, score in zip(ids_row.tolist(), scores_row.tolist()):
            if pid < 0:
                continue
            if pid not in inv_labels:
                inv_labels[pid] = self._labels_of(pid)
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
# Fused kernels — paragraph ids == arena slots (single) or slots // m_max
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k",))
def _stream_chunk_topk(chunk, queries, mask, k):
    """One streamed-scan chunk: exact scores + local top-k (HIGHEST
    precision so the device chunk scores agree with the host rescore)."""
    scores = scores_matmul(queries, chunk, precision=jax.lax.Precision.HIGHEST)
    return masked_topk(scores, k, mask=mask)


def _host_int8_encode(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side mirror of quant.Int8Codes.encode — the paged tiers must
    never upload the f32 arena just to quantize it on device."""
    v = vectors.astype(np.float32)
    s = np.maximum(np.abs(v).max(axis=-1), 1e-12) / 127.0
    codes = np.clip(np.round(v / s[:, None]), -127, 127).astype(np.int8)
    return codes, s.astype(np.float32)


def _host_duplicate_mask(cand_vecs: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host mirror of _duplicate_mask (same double-hash projections, f32)."""
    d = cand_vecs.shape[-1]
    idx = np.arange(d, dtype=np.float32)
    w1 = np.sin(idx * 0.7310585) + 1.0
    w2 = np.cos(idx * 0.4142135) - 0.5
    h1 = (cand_vecs @ w1).astype(np.float32)
    h2 = (cand_vecs @ w2).astype(np.float32)
    same = (h1[:, :, None] == h1[:, None, :]) & (h2[:, :, None] == h2[:, None, :])
    c = cand_vecs.shape[1]
    earlier = np.tril(np.ones((c, c), bool), k=-1)[None]
    return np.any(same & earlier & valid[:, None, :], axis=-1)


@partial(jax.jit, static_argnames=("k", "similarity", "dedup"))
def _search_exact(vectors, queries, para_mask, min_score, k, similarity, dedup=False):
    q = prepare_query(queries, similarity)
    scores = scores_matmul(q, vectors)  # [B, P]
    if not dedup:
        return masked_topk(scores, k, mask=para_mask, min_score=min_score)
    # over-fetch, drop identical-vector duplicates, cut back to k
    k2 = min(2 * k + 8, scores.shape[-1])
    _, cand = masked_topk(scores, k2, mask=para_mask, min_score=min_score)
    return _rerank_and_cut(vectors, q, cand, min_score, k, dedup=True)


def _duplicate_mask(cand_vecs: jax.Array, valid: jax.Array) -> jax.Array:
    """[B, C] bool — True where a candidate repeats an EARLIER candidate's
    vector (parity: the reference's Fssc vector dedup, searcher.rs:150-199;
    default result semantics exclude identical-vector duplicates).

    Comparing [B, C, C] vector pairs directly would materialize a huge
    intermediate, so equality is detected through two deterministic
    projections: equal vectors collide on both hashes; distinct f32 vectors
    collide on BOTH with probability ~2^-48 — below any practical concern.
    """
    d = cand_vecs.shape[-1]
    idx = jnp.arange(d, dtype=jnp.float32)
    w1 = jnp.sin(idx * 0.7310585) + 1.0
    w2 = jnp.cos(idx * 0.4142135) - 0.5
    h1 = cand_vecs @ w1  # [B, C]
    h2 = cand_vecs @ w2
    same = (h1[:, :, None] == h1[:, None, :]) & (h2[:, :, None] == h2[:, None, :])
    c = cand_vecs.shape[1]
    earlier = jnp.tril(jnp.ones((c, c), bool), k=-1)[None]
    return jnp.any(same & earlier & valid[:, None, :], axis=-1)


def _rerank_and_cut(vectors, q, cand_ids, min_score, k, dedup=False):
    """Exact rescoring of candidates; candidate ids are paragraph ids."""
    safe = jnp.maximum(cand_ids, 0)
    cand_vecs = vectors[safe]  # [B, C, D]
    exact = jnp.einsum(
        "bd,bcd->bc", q, cand_vecs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    valid = cand_ids >= 0
    if dedup:
        valid = valid & ~_duplicate_mask(cand_vecs, valid)
    top_s, pos = masked_topk(exact, k, mask=valid, min_score=min_score)
    safe_pos = jnp.maximum(pos, 0)
    top_ids = jnp.where(pos >= 0, jnp.take_along_axis(cand_ids, safe_pos, axis=-1), -1)
    return top_s, top_ids


@partial(jax.jit, static_argnames=("k", "similarity"))
def _exact_dedup_cut(vectors, queries, cand_ids, min_score, k, similarity):
    """Exact rescore + Fssc duplicate cut over externally-found candidates
    (the ivf/hnsw dedup leg)."""
    q = prepare_query(queries, similarity)
    return _rerank_and_cut(vectors, q, cand_ids, min_score, k, dedup=True)


def _int8_candidates(codes, q, budget, para_mask):
    """Int8 estimate scan -> [B, C] candidate ids (traced helper).

    Candidate selection routes to the top-2-per-slot resident Pallas kernel
    on TPU backends when shapes and the rerank budget allow: it reaches
    recall@10 1.0 where `approx_max_k`'s top-1-per-bin partial reduction
    saturates at 0.970, at measured cost parity (ops/pallas_scan.py
    resident2 notes). XLA amk remains the fallback (odd shapes, k > 2*S,
    CPU runs where interpret-mode Pallas would crawl).
    """
    from ...ops import pallas_scan

    n, b = codes.codes.shape[0], q.shape[0]
    if (
        jax.default_backend() != "cpu"
        and budget <= 2 * pallas_scan.RESIDENT2_SLOTS
        and pallas_scan.resident2_eligible(n, codes.codes.shape[1], b, False)
    ):
        qs = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-12) / 127.0
        qc = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)
        slot_s, slot_i = pallas_scan.int8_scan_slots_resident2(
            qc, codes.codes, codes.scale, para_mask
        )
        c = min(budget, slot_s.shape[-1])
        top_s, pos = jax.lax.top_k(slot_s, c)
        return jnp.where(
            top_s > pallas_scan.NEG_INF / 2,
            jnp.take_along_axis(slot_i, pos, axis=-1),
            -1,
        )
    est = quant.int8_estimate_scores(codes, q)
    c = min(budget, est.shape[-1])
    _, cand = quant.approx_candidates(est, c, mask=para_mask)
    return cand


@partial(jax.jit, static_argnames=("budget",))
def _int8_candidates_jit(codes, q, budget, para_mask):
    return _int8_candidates(codes, q, budget, para_mask)


@partial(jax.jit, static_argnames=("k", "similarity", "dedup"))
def _search_int8(codes, vectors, queries, para_mask, min_score, k, similarity, dedup=False):
    """Int8 estimate scan -> candidates -> exact rerank (see _int8_candidates)."""
    q = prepare_query(queries, similarity)
    cand = _int8_candidates(codes, q, quant.int8_rerank_budget(k), para_mask)
    return _rerank_and_cut(vectors, q, cand, min_score, k, dedup=dedup)


@partial(jax.jit, static_argnames=("k", "similarity", "interpret", "dedup"))
def _search_int8_pallas(
    codes, vectors, queries, para_mask, min_score, k, similarity, interpret=False,
    dedup=False,
):
    """Int8 candidates via the fused Pallas scan (config flag "pallas").

    Measured on the tunneled v5e at 1M x 768 batch 32 it is within run-to-run
    noise of the XLA matmul + approx_max_k path (both 1-3 ms/batch across
    runs; XLA already streams bucketed arenas near the HBM roofline), so the
    XLA path stays the default — this kernel avoids materializing the [B, N]
    score matrix in HBM and is kept for shapes/chips where that matters.
    """
    from ...ops import pallas_scan

    q = prepare_query(queries, similarity)
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-12) / 127.0
    qc = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)
    slot_s, slot_i = pallas_scan.int8_scan_slots(
        qc, codes.codes, codes.scale, para_mask,
        block_n=pallas_scan.BLOCK_N, slots=pallas_scan.SLOTS,
        interpret=interpret,
    )
    c = min(quant.int8_rerank_budget(k), slot_s.shape[-1])
    top_s, pos = jax.lax.top_k(slot_s, c)
    cand = jnp.where(
        top_s > pallas_scan.NEG_INF / 2,
        jnp.take_along_axis(slot_i, pos, axis=-1),
        -1,
    )
    return _rerank_and_cut(vectors, q, cand, min_score, k, dedup=dedup)


def _search_binary_pallas(
    codes, vectors, queries, para_mask, min_score, k, similarity, interpret=False,
    dedup=False,
):
    """Binary candidates via the fused Pallas popcount scan (config flag
    "pallas"): the [B, N] estimate/bound matrices never reach HBM — only
    the [B, S] slot table does, then the usual exact f32 rerank."""
    from ...ops import pallas_scan

    q = prepare_query(queries, similarity)
    planes, qmin, qstep, qsum = quant.quantize_query_planes(q)
    qnorm = jnp.linalg.norm(q.astype(jnp.float32), axis=-1)
    n = codes.codes_t.shape[1]
    block_n = pallas_scan.binary_block_for(n, queries.shape[0], pallas_scan.SLOTS)
    slot_s, slot_i = pallas_scan.binary_scan_slots(
        planes, qmin, qstep, qsum, qnorm,
        codes.codes_t, codes.scale, codes.popcnt, codes.resid, para_mask,
        dim=codes.dim,
        block_n=block_n, slots=pallas_scan.SLOTS,
        interpret=interpret,
    )
    c = min(quant.binary_rerank_budget(k), slot_s.shape[-1])
    top_s, pos = jax.lax.top_k(slot_s, c)
    cand = jnp.where(
        top_s > pallas_scan.NEG_INF / 2,
        jnp.take_along_axis(slot_i, pos, axis=-1),
        -1,
    )
    return _rerank_and_cut(vectors, q, cand, min_score, k, dedup=dedup)


@partial(jax.jit, static_argnames=("k", "similarity", "dedup"))
def _search_binary(codes, vectors, queries, para_mask, min_score, k, similarity, dedup=False):
    q = prepare_query(queries, similarity)
    est, bound = quant.binary_estimate_scores(codes, q)
    c = min(quant.binary_rerank_budget(k), est.shape[-1])
    _, cand = quant.approx_candidates(est + bound, c, mask=para_mask)
    return _rerank_and_cut(vectors, q, cand, min_score, k, dedup=dedup)


@partial(jax.jit, static_argnames=("k", "m_max", "similarity", "dedup"))
def _search_maxsim(vectors, m_count, queries, qmask, para_mask, min_score, k, m_max, similarity, dedup=False):
    return _maxsim_core(
        vectors, m_count, queries, qmask, para_mask, min_score, k, m_max,
        similarity, dedup,
    )


def _maxsim_core(vectors, m_count, queries, qmask, para_mask, min_score, k, m_max, similarity, dedup=False):
    """Multivector MaxSim: sum over query sub-vectors of the per-paragraph max.

    Parity with nidx_vector/src/multivector.rs:33-46 (maxsim_similarity),
    computed as one batched contraction + reshape/max over the uniform
    per-paragraph slots (no scatter). Unjitted core shared with the mesh
    group program (parallel/group.py), which traces it per member shard so
    a grouped multivector leg runs the byte-identical kernel sequence."""
    b, m, d = queries.shape
    p_pad = vectors.shape[0] // m_max
    q = prepare_query(queries.reshape(b * m, d), similarity).reshape(b, m, d)
    scores = jnp.einsum(
        "bmd,nd->bmn", q, vectors, preferred_element_type=jnp.float32
    )  # [B, M, P*m_max]
    slots = scores.reshape(b, m, p_pad, m_max)
    slot_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (p_pad, m_max), 1) < m_count[:, None]
    )
    slots = jnp.where(slot_valid[None, None], slots, NEG_INF)
    para_scores = slots.max(axis=-1)  # [B, M, P]
    contrib = jnp.where(
        qmask[:, :, None] & (para_scores > NEG_INF / 2), para_scores, 0.0
    )
    maxsim = contrib.sum(axis=1)  # [B, P]
    if not dedup:
        return masked_topk(maxsim, k, mask=para_mask, min_score=min_score)
    # Fssc dedup for multivectors: a paragraph duplicates another when its
    # whole uniform slot block matches (slots are zero-padded at build, so
    # block equality <=> same m_count AND same vectors)
    k2 = min(2 * k + 8, maxsim.shape[-1])
    top_s, cand = masked_topk(maxsim, k2, mask=para_mask, min_score=min_score)
    flat = vectors.reshape(p_pad, m_max * d)
    cand_vecs = flat[jnp.maximum(cand, 0)]
    valid = cand >= 0
    valid = valid & ~_duplicate_mask(cand_vecs, valid)
    s2, pos = masked_topk(
        jnp.where(valid, top_s, NEG_INF), k, min_score=min_score
    )
    ids = jnp.where(
        pos >= 0, jnp.take_along_axis(cand, jnp.maximum(pos, 0), -1), -1
    )
    return s2, ids
