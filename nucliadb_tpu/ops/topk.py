"""Masked and merged top-k primitives.

Replaces the reference's host-side fixed-size result heaps
(``Fssc``, nidx_vector/src/searcher.rs:150-199) and per-shard top-k merging
(nidx/src/searcher/shard_merge.rs:54-332) with on-device ops that stay inside
one jitted program: scores never leave HBM until the final cut.

Conventions: scores are "bigger is better"; invalid slots carry ``NEG_INF``
and id ``-1``. All shapes are static; ``k`` is a Python int.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A plain Python float, NEVER a device scalar: module-level device arrays
# become jaxpr constants whose values must be fetched from the device during
# lowering — on the tunneled deployment platform that fetch stalls for
# minutes (measured 292s lowering a 10-op program).
NEG_INF = -3.0e38


def masked_topk(
    scores: jax.Array,
    k: int,
    *,
    mask: jax.Array | None = None,
    min_score: jax.Array | float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over the last axis with an optional validity mask and score floor.

    Args:
      scores: [..., N] float scores.
      k: number of results (static).
      mask: optional [..., N] or [N] boolean; False entries can never win.
      min_score: optional floor; entries below it are invalidated.

    Returns:
      (top_scores [..., k], top_ids [..., k]); invalid slots have score
      ``NEG_INF`` and id ``-1``.
    """
    s = scores.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    if min_score is not None:
        s = jnp.where(s >= min_score, s, NEG_INF)
    k_eff = min(k, s.shape[-1])
    top_s, top_i = jax.lax.top_k(s, k_eff)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    if k_eff < k:
        pad = [(0, 0)] * (s.ndim - 1) + [(0, k - k_eff)]
        top_s = jnp.pad(top_s, pad, constant_values=NEG_INF)
        top_i = jnp.pad(top_i, pad, constant_values=-1)
    return top_s, top_i


def duplicate_id_mask(ids):
    """[B, C] -> bool [B, C]: True where an id repeats an EARLIER slot in
    the same row (first occurrence stays False; -1 pads never count).
    Shared by rank fusion and the HNSW accumulator — O(C^2), keep C cut."""
    same = ids[:, :, None] == ids[:, None, :]
    c = ids.shape[-1]
    earlier = jnp.tril(jnp.ones((c, c), bool), k=-1)
    return jnp.any(same & earlier[None], axis=-1) & (ids >= 0)


def sharded_topk_allgather(scores: jax.Array, ids: jax.Array, k: int, axis_name: str):
    """Merge per-shard top-k across a mesh axis via all-gather.

    The TPU-native replacement for the reference's gRPC scatter-gather merge
    (nidx/src/searcher/shard_merge.rs): every device contributes its local
    [B, k] cut; an ICI all-gather + local top-k yields the global cut on all
    devices. Call inside ``shard_map``.
    """
    all_s = jax.lax.all_gather(scores, axis_name, axis=-1, tiled=True)  # [B, k*n_shards]
    all_i = jax.lax.all_gather(ids, axis_name, axis=-1, tiled=True)
    top_s, pos = jax.lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, pos, axis=-1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i
