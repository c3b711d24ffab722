"""IVF (inverted-file) vector index: matmul k-means + cluster-blocked scan.

The reference has no IVF — its only ANN is HNSW. This index exists because
the hardware rewards it: every build step is an MXU matmul (Lloyd's
iterations accumulate cluster sums with one-hot matmuls per block — no
scatters), and a query reads only ``nprobe/K`` of the corpus in contiguous
cluster blocks (a K-row gather of large rows, the one gather shape this
platform executes well). It is the intended strategy for corpora beyond the
quantized-scan sweet spot (~4M vectors/chip): memory stays int8-compressed
and per-query HBM traffic drops by K/nprobe.

Layout: clusters padded to a uniform capacity; members live pre-gathered in
a [K, cap, D] arena with a parallel [K, cap] id table (-1 padding). Search:
centroid matmul -> top-nprobe clusters -> block gather -> batched
contraction -> masked top-k (+ exact rerank upstream if the arena is
quantized).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .topk import NEG_INF, masked_topk

KMEANS_ITERS = 8
DEFAULT_NPROBE = 16


@partial(jax.jit, static_argnames=("k_clusters", "iters", "block", "n_valid"))
def kmeans(
    vectors: jax.Array,
    valid: jax.Array,
    k_clusters: int,
    iters: int = KMEANS_ITERS,
    block: int = 65536,
    n_valid: int | None = None,
):
    """Lloyd's k-means with matmul-only updates.

    vectors [N_pad, D] (padding rows must have valid=False; valid rows come
    first). Returns (centroids [K, D], assign [N_pad] int32).
    """
    n_pad, d = vectors.shape
    blk = n_pad
    while blk > block and blk % 2 == 0:
        blk //= 2
    nb = n_pad // blk
    assert nb * blk == n_pad, (n_pad, blk)

    # seed strictly from VALID rows: striding the padded arena would make
    # zero padding rows into seeds that collapse to dead duplicate clusters
    seed_span = n_valid if n_valid is not None else n_pad
    stride = max(seed_span // k_clusters, 1)
    centroids = vectors[: stride * k_clusters : stride][:k_clusters]

    vblocks = vectors.reshape(nb, blk, d)
    wblocks = valid.reshape(nb, blk).astype(jnp.float32)

    def iteration(centroids, _):
        def per_block(carry, inputs):
            sums, counts = carry
            vb, wb = inputs
            scores = jax.lax.dot_general(
                vb, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk, K]
            assign = jnp.argmax(scores, axis=-1)
            onehot = jax.nn.one_hot(assign, k_clusters, dtype=jnp.float32) * wb[:, None]
            sums = sums + jax.lax.dot_general(
                onehot, vb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [K, D]
            counts = counts + onehot.sum(axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            per_block,
            (jnp.zeros((k_clusters, d), jnp.float32), jnp.zeros(k_clusters, jnp.float32)),
            (vblocks, wblocks),
        )
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # dead clusters keep their previous centroid
        return jnp.where(counts[:, None] > 0, new_c, centroids), None

    centroids, _ = jax.lax.scan(iteration, centroids, None, length=iters)

    def assign_block(carry, inputs):
        vb, = inputs
        scores = jax.lax.dot_general(
            vb, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return carry, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, assigns = jax.lax.scan(assign_block, None, (vblocks,))
    return centroids, assigns.reshape(n_pad)


@partial(jax.jit, static_argnames=("block",))
def assign_all(vectors: jax.Array, centroids: jax.Array, block: int = 65536):
    """One blocked matmul pass: nearest centroid per row. This is the cheap
    1/9th of build_ivf — reused when centroids are already known (persisted
    per segment, see index/vector/segment.py)."""
    n_pad, d = vectors.shape
    blk = n_pad
    while blk > block and blk % 2 == 0:
        blk //= 2
    nb = n_pad // blk
    vblocks = vectors.reshape(nb, blk, d)

    def assign_block(carry, vb):
        scores = jax.lax.dot_general(
            vb, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return carry, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, assigns = jax.lax.scan(assign_block, None, vblocks)
    return assigns.reshape(n_pad)


@dataclass
class DeviceIVF:
    centroids: jax.Array  # [K, D]
    member_vecs: jax.Array  # [K, cap, D] (zero padding)
    member_ids: jax.Array  # [K, cap] int32 (-1 padding)
    cap: int

    def tree_flatten(self):
        return (self.centroids, self.member_vecs, self.member_ids), (self.cap,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, cap=aux[0])


jax.tree_util.register_pytree_node(DeviceIVF, DeviceIVF.tree_flatten, DeviceIVF.tree_unflatten)


def build_ivf(
    vectors: jax.Array,
    n_valid: int,
    *,
    k_clusters: int | None = None,
    iters: int = KMEANS_ITERS,
    centroids: jax.Array | None = None,
) -> DeviceIVF:
    """Cluster and lay out the arena. Host only reorders ids (tiny arrays);
    the member arena is gathered on device in cluster-sized rows.

    With ``centroids`` given (persisted by a segment at create/merge time),
    the 8 Lloyd iterations are skipped and only the single assignment pass
    runs — the searcher-reload analogue of reusing the biggest operant's
    HNSW in the reference (segment.rs:137-197)."""
    import math

    n_pad, d = vectors.shape
    if centroids is not None:
        assign = assign_all(vectors, centroids)
    else:
        if k_clusters is None:
            k_clusters = max(
                16, 1 << int(math.ceil(math.log2(math.sqrt(max(n_valid, 1)))))
            )
        valid = jnp.arange(n_pad) < n_valid
        centroids, assign = kmeans(vectors, valid, k_clusters, iters, n_valid=n_valid)
    k_clusters = centroids.shape[0]

    assign_np = np.asarray(assign)[:n_valid]
    order = np.argsort(assign_np, kind="stable")
    sizes = np.bincount(assign_np, minlength=k_clusters)
    cap = int(max(sizes.max(), 1))
    cap = -(-cap // 8) * 8  # pad to sublane multiple

    member_ids = np.full((k_clusters, cap), -1, np.int32)
    cursor = 0
    for c in range(k_clusters):
        cnt = int(sizes[c])
        member_ids[c, :cnt] = order[cursor : cursor + cnt]
        cursor += cnt
    ids_j = jax.device_put(jnp.asarray(member_ids))
    # gather member vectors into the blocked arena (one device gather of
    # K*cap rows — a build-time cost, done once per consolidation)
    member_vecs = jax.jit(
        lambda v, ids: jnp.where(
            (ids >= 0)[:, :, None], v[jnp.maximum(ids, 0)], 0.0
        )
    )(vectors, ids_j)
    return DeviceIVF(centroids=centroids, member_vecs=member_vecs, member_ids=ids_j, cap=cap)


@partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(
    ivf: DeviceIVF,
    queries: jax.Array,  # [B, D]
    node_mask: jax.Array,  # [N_pad] bool
    min_score: jax.Array,
    k: int,
    nprobe: int = DEFAULT_NPROBE,
):
    """Top-k over the nprobe closest clusters per query."""
    q = queries.astype(jnp.float32)
    cscores = jax.lax.dot_general(
        q, ivf.centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, K]
    nprobe = min(nprobe, cscores.shape[-1])
    _, top_c = jax.lax.top_k(cscores, nprobe)  # [B, P]

    blocks = ivf.member_vecs[top_c]  # [B, P, cap, D]
    ids = ivf.member_ids[top_c]  # [B, P, cap]
    scores = jnp.einsum(
        "bd,bpcd->bpc", q, blocks, preferred_element_type=jnp.float32
    )
    valid = (ids >= 0) & node_mask[jnp.maximum(ids, 0)]
    b = q.shape[0]
    flat_s = jnp.where(valid, scores, NEG_INF).reshape(b, -1)
    flat_i = ids.reshape(b, -1)
    top_s, pos = masked_topk(flat_s, k, min_score=min_score)
    top_i = jnp.where(
        pos >= 0, jnp.take_along_axis(flat_i, jnp.maximum(pos, 0), axis=-1), -1
    )
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i
