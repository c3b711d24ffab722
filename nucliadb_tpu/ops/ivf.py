"""IVF (inverted-file) vector index: matmul k-means + blocked int8 scan.

The reference has no IVF — its only ANN is HNSW. Every build step here is
an MXU matmul (Lloyd's iterations accumulate cluster sums with one-hot
matmuls per block — no scatters); a query reads only ``nprobe/K`` of the
corpus.

Measured reality on a v5e (4.2M x 256, batch 32): the blocked-gather probe
path runs at ~8 GB/s effective (32 ms at nprobe=16, linear in nprobe) while
the full int8 scan + exact rerank streams the same codes at ~400 GB/s
(2.6 ms, recall 0.98). TPU gathers — even of 256 KB block rows — are an
order of magnitude off the sequential-stream roofline, so **on TPU the
quantized full scan is the right strategy at every corpus size that fits
HBM, and capacity beyond one chip comes from the mesh (parallel/mesh.py),
not from probing**. IVF is kept for completeness and for selectivity-bound
backends (CPU fallback, energy-constrained serving); recall at nprobe=16 on
clustered data measured 1.0.

Layout: fixed-size blocks of int8 member codes ([NB, blk, D] + per-member
scales + id table; clusters own ceil(size/blk) blocks via a [K, MB] table).
An earlier [K, cap, D] f32 member arena both duplicated the corpus and
padded cap to the LARGEST cluster — 10.7 GB at 4.2M x 256, OOM next to the
base vectors. Exact reranking reads f32 rows from the base arena, which
exists anyway.
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


def ivf_seed_indices(n_valid: int, k_clusters: int) -> np.ndarray:
    """Seed strictly from VALID rows: striding the padded arena would make
    zero padding rows into seeds that collapse to dead duplicate clusters.
    Modulo indexing guarantees exactly k_clusters seeds even when the
    corpus is smaller than k (a plain strided slice yielded < k rows and
    crashed the update broadcast; tiny ivf-flagged segments hit this).

    Host-side on purpose: passing seeds as an ARRAY keeps the corpus size
    out of the jit cache key — n_valid-as-static retraced the 8-iteration
    Lloyd program on every searcher refresh (each adds docs)."""
    span = max(n_valid, 1)
    stride = max(span // k_clusters, 1)
    return ((np.arange(k_clusters) * stride) % span).astype(np.int32)


@partial(jax.jit, static_argnames=("k_clusters", "iters", "block"))
def kmeans(
    vectors: jax.Array,
    valid: jax.Array,
    k_clusters: int,
    iters: int = KMEANS_ITERS,
    block: int = 65536,
    seed_idx: jax.Array | None = None,
):
    """Lloyd's k-means with matmul-only updates.

    vectors [N_pad, D] (padding rows must have valid=False; valid rows come
    first). ``seed_idx`` [k_clusters] int32 picks the seed rows (see
    ivf_seed_indices); defaults to striding the padded arena.
    Returns (centroids [K, D], assign [N_pad] int32).
    """
    n_pad, d = vectors.shape
    blk = n_pad
    while blk > block and blk % 2 == 0:
        blk //= 2
    nb = n_pad // blk
    assert nb * blk == n_pad, (n_pad, blk)

    if seed_idx is None:
        seed_idx = jnp.asarray(ivf_seed_indices(n_pad, k_clusters))
    centroids = vectors[seed_idx]

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
    """Blocked int8 member layout.

    The first version duplicated the corpus as an f32 [K, cap, D] arena —
    at 4M x 256 that is 10.7 GB (cluster imbalance pads cap ~2.5x the mean)
    and OOMs a 16 GB chip next to the base vectors. Members are now stored
    as int8 codes in fixed-size blocks: clusters own ceil(size/block)
    blocks, so padding is bounded by K*(block-1) rows instead of
    K*(max_size - mean_size), and the scan reads 4x fewer bytes. Exact
    reranking gathers f32 rows from the BASE arena (passed to ivf_search),
    which exists anyway — nothing is duplicated at full precision.
    """

    centroids: jax.Array  # [K, D] f32
    block_codes: jax.Array  # [NB, blk, D] int8
    block_scale: jax.Array  # [NB, blk] f32 per-member scales
    block_ids: jax.Array  # [NB, blk] int32 global ids (-1 pad)
    cluster_blocks: jax.Array  # [K, MB] int32 block ids (-1 pad)
    block: int

    def tree_flatten(self):
        return (
            self.centroids, self.block_codes, self.block_scale,
            self.block_ids, self.cluster_blocks,
        ), (self.block,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, block=aux[0])


jax.tree_util.register_pytree_node(DeviceIVF, DeviceIVF.tree_flatten, DeviceIVF.tree_unflatten)


@jax.jit
def _gather_blocks(codes_codes, codes_scale, ids):
    # module-level jit: a per-build closure recompiled on every searcher
    # refresh (jit caches key on function identity)
    safe = jnp.maximum(ids, 0)
    bc = jnp.where((ids >= 0)[:, :, None], codes_codes[safe], 0)
    bs = jnp.where(ids >= 0, codes_scale[safe], 0.0)
    return bc, bs


def build_ivf(
    vectors: jax.Array,
    n_valid: int,
    *,
    k_clusters: int | None = None,
    iters: int = KMEANS_ITERS,
    centroids: jax.Array | None = None,
    block: int = 1024,
) -> DeviceIVF:
    """Cluster and lay out the blocked int8 member arena. The host only
    assembles id tables (tiny); codes encode + gather on device.

    With ``centroids`` given (persisted by a segment at create/merge time),
    the 8 Lloyd iterations are skipped and only the single assignment pass
    runs — the searcher-reload analogue of reusing the biggest operant's
    HNSW in the reference (segment.rs:137-197)."""
    import math

    from .quant import Int8Codes

    n_pad, d = vectors.shape
    if centroids is not None:
        assign = assign_all(vectors, centroids)
    else:
        if k_clusters is None:
            k_clusters = max(
                16, 1 << int(math.ceil(math.log2(math.sqrt(max(n_valid, 1)))))
            )
        valid = jnp.arange(n_pad) < n_valid
        centroids, assign = kmeans(
            vectors, valid, k_clusters, iters,
            seed_idx=jnp.asarray(ivf_seed_indices(n_valid, k_clusters)),
        )
    k_clusters = centroids.shape[0]

    assign_np = np.asarray(assign)[:n_valid]
    order = np.argsort(assign_np, kind="stable")
    sizes = np.bincount(assign_np, minlength=k_clusters)
    # small corpora: one right-sized block per cluster (old behavior);
    # large: fixed blocks bound padding AND the per-probe gather size
    blk = int(min(block, -(-int(max(sizes.max(), 1)) // 8) * 8))

    block_rows: list[np.ndarray] = []
    cluster_block_lists: list[list[int]] = []
    cursor = 0
    for c in range(k_clusters):
        cnt = int(sizes[c])
        members = order[cursor : cursor + cnt]
        cursor += cnt
        blocks_of_c: list[int] = []
        for off in range(0, max(cnt, 1), blk):
            chunk = members[off : off + blk]
            row = np.full(blk, -1, np.int32)
            row[: len(chunk)] = chunk
            blocks_of_c.append(len(block_rows))
            block_rows.append(row)
        cluster_block_lists.append(blocks_of_c)
    nb = len(block_rows)
    mb = max(len(bl) for bl in cluster_block_lists)
    cluster_blocks = np.full((k_clusters, mb), -1, np.int32)
    for c, bl in enumerate(cluster_block_lists):
        cluster_blocks[c, : len(bl)] = bl

    ids_j = jax.device_put(jnp.asarray(np.stack(block_rows)))  # [NB, blk]
    codes = Int8Codes.encode(vectors)
    block_codes, block_scale = _gather_blocks(codes.codes, codes.scale, ids_j)
    return DeviceIVF(
        centroids=centroids,
        block_codes=block_codes,
        block_scale=block_scale,
        block_ids=ids_j,
        cluster_blocks=jax.device_put(jnp.asarray(cluster_blocks)),
        block=blk,
    )


@partial(jax.jit, static_argnames=("k", "nprobe", "chunk"))
def ivf_search(
    ivf: DeviceIVF,
    vectors: jax.Array,  # [N_pad, D] f32/bf16 base arena (exact rerank)
    queries: jax.Array,  # [B, D]
    node_mask: jax.Array,  # [N_pad] bool
    min_score: jax.Array,
    k: int,
    nprobe: int = DEFAULT_NPROBE,
    chunk: int = 8,
):
    """Top-k over the nprobe closest clusters per query: int8 block scan ->
    candidate cut -> exact f32 rerank against the base arena. Queries
    process in chunks under lax.map so the per-probe gather temp stays
    ~chunk * nprobe * MB * blk * D bytes."""
    from .quant import int8_rerank_budget

    q = queries.astype(jnp.float32)
    b, d = q.shape
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-12) / 127.0
    qc = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)

    cscores = jax.lax.dot_general(
        q, ivf.centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, K]
    nprobe = min(nprobe, cscores.shape[-1])
    _, top_c = jax.lax.top_k(cscores, nprobe)  # [B, P]
    probe_blocks = ivf.cluster_blocks[top_c]  # [B, P, MB]
    g = probe_blocks.shape[1] * probe_blocks.shape[2]
    probe_blocks = probe_blocks.reshape(b, g)

    c_budget = min(int8_rerank_budget(k), g * ivf.block)

    chunk = min(chunk, b)
    pad_b = -(-b // chunk) * chunk - b
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
        qc = jnp.pad(qc, ((0, pad_b), (0, 0)))
        probe_blocks = jnp.pad(probe_blocks, ((0, pad_b), (0, 0)), constant_values=-1)

    def per_chunk(args):
        qf, qi, pb = args  # [c, D] f32, [c, D] i8, [c, G]
        safe_b = jnp.maximum(pb, 0)
        bc = ivf.block_codes[safe_b]  # [c, G, blk, D] int8
        ids = ivf.block_ids[safe_b]  # [c, G, blk]
        raw = jnp.einsum(
            "cd,cgkd->cgk", qi, bc, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        scale = ivf.block_scale[safe_b]  # [c, G, blk]
        est = raw * scale
        valid = (pb[:, :, None] >= 0) & (ids >= 0)
        valid = valid & node_mask[jnp.maximum(ids, 0)]
        cc = qf.shape[0]
        flat_s = jnp.where(valid, est, NEG_INF).reshape(cc, -1)
        flat_i = jnp.where(valid, ids, -1).reshape(cc, -1)
        top_est, pos = jax.lax.top_k(flat_s, c_budget)
        cand = jnp.where(
            top_est > NEG_INF / 2,
            jnp.take_along_axis(flat_i, pos, axis=-1), -1,
        )  # [c, C]
        cv = vectors[jnp.maximum(cand, 0)].astype(jnp.float32)  # [c, C, D]
        exact = jnp.einsum(
            "cd,cnd->cn", qf, cv, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # match every other rerank
        )
        tks, tpos = masked_topk(exact, k, mask=cand >= 0, min_score=min_score)
        tki = jnp.where(
            tpos >= 0, jnp.take_along_axis(cand, jnp.maximum(tpos, 0), axis=-1), -1
        )
        tki = jnp.where(tks > NEG_INF / 2, tki, -1)
        return tks, tki

    n_chunks = (b + pad_b) // chunk
    qf_c = q.reshape(n_chunks, chunk, d)
    qi_c = qc.reshape(n_chunks, chunk, d)
    pb_c = probe_blocks.reshape(n_chunks, chunk, g)
    top_s, top_i = jax.lax.map(per_chunk, (qf_c, qi_c, pb_c))
    top_s = top_s.reshape(-1, k)[:b]
    top_i = top_i.reshape(-1, k)[:b]
    return top_s, top_i
