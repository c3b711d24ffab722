"""Rank fusion on device: Reciprocal Rank Fusion over top-k lists.

Device counterpart of the reference's Python RRF
(nucliadb/src/nucliadb/search/search/rank_fusion.py:106-186): fused score of
a candidate is ``sum over lists of boost / (k + rank)`` with k = 60. Used by
the fused hybrid query kernel when keyword and semantic results share an id
space (one shard); the product-layer /find pipeline fuses string-keyed
results on the host with the same formula (search/rank_fusion.py here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .topk import NEG_INF, duplicate_id_mask

RRF_K = 60.0  # parity: rank_fusion.py:128


def rrf_merge(
    ids_a: jax.Array,
    ids_b: jax.Array,
    k: int,
    *,
    boost_a: float = 1.0,
    boost_b: float = 1.0,
    rrf_k: float = RRF_K,
) -> tuple[jax.Array, jax.Array]:
    """Fuse two ranked id lists ([B, ka], [B, kb], -1 = empty slot).

    Returns ([B, k] fused scores, [B, k] ids). Ids must share one id space.
    """
    cand = jnp.concatenate([ids_a, ids_b], axis=-1)  # [B, C]
    ka = ids_a.shape[-1]
    kb = ids_b.shape[-1]
    rank_a = 1.0 / (rrf_k + jnp.arange(ka, dtype=jnp.float32))
    rank_b = 1.0 / (rrf_k + jnp.arange(kb, dtype=jnp.float32))

    in_a = (cand[:, :, None] == ids_a[:, None, :]) & (cand[:, :, None] >= 0)
    in_b = (cand[:, :, None] == ids_b[:, None, :]) & (cand[:, :, None] >= 0)
    score = boost_a * jnp.sum(jnp.where(in_a, rank_a, 0.0), axis=-1)
    score += boost_b * jnp.sum(jnp.where(in_b, rank_b, 0.0), axis=-1)

    # dedup: a candidate appearing in both lists shows up twice with equal
    # fused score — invalidate all but its first occurrence
    valid = (cand >= 0) & ~duplicate_id_mask(cand)

    score = jnp.where(valid, score, NEG_INF)
    k_eff = min(k, cand.shape[-1])
    top_s, pos = jax.lax.top_k(score, k_eff)
    top_i = jnp.take_along_axis(cand, pos, axis=-1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    if k_eff < k:  # honor the documented [B, k] shape
        top_s = jnp.pad(top_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_s, top_i
