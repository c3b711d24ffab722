"""Mesh execution of co-resident shards' vector legs as ONE sharded program.

The product serving path (SearchService.find -> SyncedSearcher) used to
query a KB's shards one host dispatch at a time even when several shards
live on the same device slice. This module is the TPU-native replacement
for the reference's in-process multi-shard parallel query
(nidx/src/searcher/shards_query.rs:29-72): the shards' consolidated vector
arenas stack along a ``shard`` mesh axis, per-request filter masks are
computed host-side per shard (the same Formula/prefilter machinery as the
single-device path), and ONE ``shard_map`` program computes every shard's
local top-k cut. The per-shard cuts return to the host because the product
pipeline fuses ALL per-shard hits (RRF over the concatenated lists,
search/find.py); the globally-merged ICI all-gather cut lives in
MeshShardedVectorIndex (parallel/mesh.py) for engine-level consumers.

Parity contract: for each shard the group program runs the SAME kernel
sequence as DeviceVectorIndex.search — the shared ``_int8_candidates``
selector (top-2-per-slot resident Pallas kernel on TPU backends, XLA
approx_max_k on CPU) followed by the exact rerank + masked cut, or the
exact-scan path, with identical Fssc dedup and min_score semantics — so
results match the sequential per-shard path ON EVERY BACKEND (the selector
choice is made once per backend by ``_int8_candidates`` itself, not
re-decided here). The per-device member loop is UNROLLED (static
``shards_per_dev``) rather than vmapped so each member's kernel launch is
byte-identical to a sequential ``_search_int8`` call. Padding a member's
arena to the group-wide ``per = max(p_pad)`` does not perturb the selector:
every bucket-ladder p_pad is a multiple of RESIDENT_BLOCK_N and >= twice
it, and the resident2 slot map is position-mod-slots, so appending masked
padding rows changes neither eligibility nor any real row's slot. One
documented deviation: quantized candidate selection is a GROUP-static
choice (all member shards use int8 codes or none do); a mixed group where
only some shards exceed EXACT_SCAN_THRESHOLD falls back to the exact scan
for every shard — strictly better recall than the per-shard path, at
full-scan cost for the big shards.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.vector.device import _int8_candidates, _rerank_and_cut
from ..ops import quant
from ..ops.distance import prepare_query, scores_matmul
from ..ops.topk import NEG_INF, masked_topk
from ..utils.buckets import bucket
from ..utils.platform import device_fetch, device_scalar_f32


def mesh_serving_active() -> bool:
    """True when >1 device is visible and mesh serving is not disabled.

    ``NDBTPU_MESH_SERVING=0`` forces the sequential per-shard path (used by
    the differential tests to compare both paths on the same corpus).
    """
    import os

    if os.environ.get("NDBTPU_MESH_SERVING", "1") == "0":
        return False
    try:
        return len(jax.devices()) > 1
    except Exception:
        return False


class MeshVectorGroup:
    """The vector arenas of N co-resident shards (one vectorset), stacked
    over a 1-D ``shard`` mesh. Built from the shards' open VectorSearchers;
    rebuilt (by the caller's cache) whenever any member shard reloads."""

    @staticmethod
    def eligible(searchers: Sequence) -> bool:
        if not searchers:
            return False
        cfgs = [s.config for s in searchers]
        # ivf/hnsw/pallas strategies hold per-arena derived state the group
        # program does not replicate
        if any(set(c.flags) & {"ivf", "hnsw", "pallas"} for c in cfgs):
            return False
        # cardinality must be uniform: multivector (MaxSim) groups run the
        # shared _maxsim_core per shard (r5 — VERDICT r4 task 7); a mixed
        # single/multi set has no common kernel sequence
        if len({
            (c.dimension, c.similarity, frozenset(c.flags), c.cardinality)
            for c in cfgs
        }) != 1:
            return False
        if any(isinstance(s.index.codes, quant.BinaryCodes) for s in searchers):
            return False
        # beyond-HBM paged arenas keep f32 rows in host RAM; the group
        # program stacks device arenas, so paged members disqualify
        if any(getattr(s.index, "paging", None) is not None for s in searchers):
            return False
        return True

    def __init__(self, searchers: Sequence, mesh: Mesh | None = None):
        from ..index.vector.config import VectorCardinality

        assert self.eligible(searchers)
        self.searchers = list(searchers)
        devices = jax.devices()
        self.mesh = mesh or Mesh(np.array(devices), ("shard",))
        n_dev = self.mesh.shape["shard"]
        s = len(searchers)
        self.n_shards = s
        self.shards_per_dev = -(-s // n_dev)
        self.s_pad = self.shards_per_dev * n_dev
        self.per = max(se.index.p_pad for se in searchers)
        cfg = searchers[0].config
        self.similarity = cfg.similarity.value
        self.multi = cfg.cardinality == VectorCardinality.MULTI
        d = cfg.dimension

        sharding = NamedSharding(self.mesh, P("shard"))
        store_dtype = np.asarray(searchers[0].index.vectors[:1]).dtype
        if self.multi:
            # uniform slot layout across members: each member's
            # [p_pad_i, m_max_i, D] slot block re-pads to the group-wide
            # (per, m_max) grid — zero slots are masked by m_count exactly
            # as in the sequential _maxsim_core
            self.m_max = max(se.index.m_max for se in searchers)
            arena = np.zeros(
                (self.s_pad, self.per * self.m_max, d), dtype=store_dtype
            )
            m_counts = np.zeros((self.s_pad, self.per), np.int32)
            for i, se in enumerate(searchers):
                idx = se.index
                v = np.asarray(idx.vectors).reshape(idx.p_pad, idx.m_max, d)
                a = np.zeros((self.per, self.m_max, d), dtype=store_dtype)
                a[: v.shape[0], : v.shape[1]] = v
                arena[i] = a.reshape(self.per * self.m_max, d)
                m_counts[i, : idx.p_pad] = np.asarray(idx.m_count)
            self.vectors = jax.device_put(arena, sharding)
            self.m_counts = jax.device_put(m_counts, sharding)
            self.use_codes = False
            codes = np.zeros((self.s_pad, 1, 1), np.int8)
            scales = np.zeros((self.s_pad, 1), np.float32)
        else:
            self.m_max = 1
            arena = np.zeros((self.s_pad, self.per, d), dtype=store_dtype)
            for i, se in enumerate(searchers):
                v = np.asarray(se.index.vectors)
                arena[i, : v.shape[0]] = v
            self.vectors = jax.device_put(arena, sharding)
            self.m_counts = jax.device_put(
                np.zeros((self.s_pad, 1), np.int32), sharding
            )
            self.use_codes = all(
                isinstance(se.index.codes, quant.Int8Codes) for se in searchers
            )
            if self.use_codes:
                codes = np.zeros((self.s_pad, self.per, d), np.int8)
                scales = np.zeros((self.s_pad, self.per), np.float32)
                for i, se in enumerate(searchers):
                    c = np.asarray(se.index.codes.codes)
                    codes[i, : c.shape[0]] = c
                    scales[i, : c.shape[0]] = np.asarray(se.index.codes.scale)
            else:
                codes = np.zeros((self.s_pad, 1, 1), np.int8)
                scales = np.zeros((self.s_pad, 1), np.float32)
        self.codes = jax.device_put(codes, sharding)
        self.scales = jax.device_put(scales, sharding)
        self._mask_sharding = sharding
        self._q_sharding = NamedSharding(self.mesh, P(None, None))
        self._qm_sharding = NamedSharding(self.mesh, P(None, None, None))

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        shard_masks: Sequence[np.ndarray],
        *,
        min_score: float | None = None,
        with_duplicates: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard top-k cuts in one program.

        ``shard_masks[i]`` is shard i's combined validity mask (alive ∧
        filters), length n_para or p_pad of that shard. Returns
        ([S, B, k] scores, [S, B, k] local paragraph ids, -1 = empty) —
        exactly what S sequential DeviceVectorIndex.search calls return.
        """
        q = np.asarray(queries, np.float32)
        masks = np.zeros((self.s_pad, self.per), bool)
        for i, mk in enumerate(shard_masks):
            masks[i, : mk.shape[0]] = mk
        ms = device_scalar_f32(
            float(NEG_INF) if min_score is None else float(min_score)
        )
        if self.multi:
            # [B, D] single query vectors run as MaxSim with M=1, exactly
            # like DeviceVectorIndex.search's re-entry
            q3 = q if q.ndim == 3 else q[:, None, :]
            b, m = q3.shape[0], q3.shape[1]
            b_pad = bucket(b, minimum=1)
            qp = np.zeros((b_pad, m, q3.shape[2]), np.float32)
            qp[:b] = q3
            qmask = np.zeros((b_pad, m), bool)
            qmask[:b] = np.abs(q3).sum(-1) > 0
            s_, i_ = _group_search_multi(
                self.mesh, top_k, self.similarity, self.m_max,
                not with_duplicates,
                self.vectors, self.m_counts,
                jax.device_put(masks, self._mask_sharding), ms,
                jax.device_put(qp, self._qm_sharding),
                jax.device_put(qmask, self._q_sharding),
            )
        else:
            b = q.shape[0]
            b_pad = bucket(b, minimum=8)
            qp = np.zeros((b_pad, q.shape[1]), np.float32)
            qp[:b] = q
            s_, i_ = _group_search(
                self.mesh, top_k, self.similarity, self.use_codes,
                not with_duplicates,
                self.vectors, self.codes, self.scales,
                jax.device_put(masks, self._mask_sharding), ms,
                jax.device_put(qp, self._q_sharding),
            )
        s_, i_ = device_fetch(s_, i_)
        return (
            s_[: self.n_shards, :b],
            i_[: self.n_shards, :b],
        )


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "similarity", "use_codes", "dedup"),
)
def _group_search(
    mesh, k, similarity, use_codes, dedup,
    vectors, codes, scales, masks, min_score, queries,
):
    def local(vecs, cds, scl, msk, ms, q):
        # vecs [m, per, D]; msk [m, per]; q [B, D] replicated
        qs = prepare_query(q, similarity)

        def per_shard(v, c, sc, mk):
            # mirrors DeviceVectorIndex._search_int8 / _search_exact exactly:
            # candidate selection goes through the SHARED _int8_candidates
            # (resident2 Pallas on TPU, amk on CPU — device.py:803)
            if use_codes:
                ic = quant.Int8Codes(codes=c, scale=sc)
                cand = _int8_candidates(ic, qs, quant.int8_rerank_budget(k), mk)
                return _rerank_and_cut(v, qs, cand, ms, k, dedup=dedup)
            scores = scores_matmul(qs, v)
            if dedup:
                k2 = min(2 * k + 8, scores.shape[-1])
                _, cand = masked_topk(scores, k2, mask=mk, min_score=ms)
                return _rerank_and_cut(v, qs, cand, ms, k, dedup=True)
            return masked_topk(scores, k, mask=mk, min_score=ms)

        # unrolled static loop (m = shards_per_dev, typically 1): each
        # member's kernel launch matches a sequential search call exactly —
        # a vmap over per_shard would instead batch the Pallas selector into
        # one differently-shaped launch
        outs = [per_shard(vecs[j], cds[j], scl[j], msk[j]) for j in range(vecs.shape[0])]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )  # [m, B, k] x2

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("shard"), P("shard"), P("shard"), P("shard"), P(),
            P(None, None),
        ),
        out_specs=(P("shard"), P("shard")),
        check_vma=False,
    )(vectors, codes, scales, masks, min_score, queries)


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "similarity", "m_max", "dedup"),
)
def _group_search_multi(
    mesh, k, similarity, m_max, dedup,
    vectors, m_counts, masks, min_score, queries, qmask,
):
    """Multivector (MaxSim) group program: each member shard traces the
    SAME _maxsim_core as a sequential DeviceVectorIndex.search dispatch
    (device.py), so grouped results match the per-shard pool exactly
    (parity: nidx_vector/src/searcher.rs:345-394 + multivector.rs:18-46)."""
    from ..index.vector.device import _maxsim_core

    def local(vecs, mcs, msk, ms, q, qm):
        def per_shard(v, mc, mk):
            return _maxsim_core(
                v, mc, q, qm, mk, ms, k, m_max, similarity, dedup=dedup
            )

        outs = [
            per_shard(vecs[j], mcs[j], msk[j]) for j in range(vecs.shape[0])
        ]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("shard"), P("shard"), P("shard"), P(),
            P(None, None, None), P(None, None),
        ),
        out_specs=(P("shard"), P("shard")),
        check_vma=False,
    )(vectors, m_counts, masks, min_score, queries, qmask)
