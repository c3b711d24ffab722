"""Mesh-sharded vector index: shard-parallel scan + all-gather top-k merge.

Replaces the reference's scatter-gather over shard replicas
(nidx/src/searcher/shards_query.rs:29-72 + shard_merge.rs:54-332): shards
become partitions of a device mesh axis; the "gather" is an ICI all-gather
of per-shard [B, k] cuts followed by a local top-k — one jitted program, no
host round trips, results replicated on every device.

Mesh axes:
- ``shard``: index partition (the reference's shard fan-out; DP-analogue)
- ``query``: query-batch partition (SP-analogue) — each query sub-batch
  runs on a row of devices against all shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import quant
from ..ops.distance import exact_rerank, prepare_query, scores_matmul
from ..ops.topk import masked_topk, sharded_topk_allgather
from ..utils.platform import configure_jax


def make_mesh(n_devices: int | None = None, query_axis: int = 1) -> Mesh:
    """A (shard, query) mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % query_axis == 0, (n, query_axis)
    arr = np.array(devices[:n]).reshape(n // query_axis, query_axis)
    return Mesh(arr, ("shard", "query"))


class MeshShardedVectorIndex:
    """A vector arena partitioned over the ``shard`` mesh axis.

    Each device holds [N/s, D] vectors (+ optional int8 codes). Queries are
    partitioned over the ``query`` axis; every query sees every shard; the
    final cut is replicated.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        *,
        quantize: bool = False,
        similarity: str = "dot",
    ):
        configure_jax()
        self.mesh = mesh
        self.similarity = similarity
        n_shards = mesh.shape["shard"]
        n, d = vectors.shape
        per = -(-n // n_shards)
        n_pad = per * n_shards
        if n_pad != n:
            vectors = np.concatenate(
                [vectors, np.zeros((n_pad - n, d), vectors.dtype)]
            )
        self.n = n
        self.n_pad = n_pad
        self.per_shard = per

        sharding = NamedSharding(mesh, P("shard", None))
        self.vectors = jax.device_put(jnp.asarray(vectors, jnp.float32), sharding)
        valid = np.arange(n_pad) < n
        self.valid = jax.device_put(
            jnp.asarray(valid), NamedSharding(mesh, P("shard"))
        )
        self.codes: quant.Int8Codes | None = None
        if quantize:
            encode = shard_map(
                quant.Int8Codes.encode,
                mesh=mesh,
                in_specs=P("shard", None),
                out_specs=quant.Int8Codes(codes=P("shard", None), scale=P("shard")),
                check_vma=False,
            )
            self.codes = jax.jit(encode)(self.vectors)

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Global top-k over all shards; queries [B, D] (B divisible by the
        query axis or padded here). Returns ([B, k] scores, [B, k] ids)."""
        b = queries.shape[0]
        qn = self.mesh.shape["query"]
        b_pad = -(-b // qn) * qn
        qp = np.zeros((b_pad, queries.shape[1]), np.float32)
        qp[:b] = queries
        q_sharding = NamedSharding(self.mesh, P("query", None))
        qj = jax.device_put(jnp.asarray(qp), q_sharding)
        fn = _sharded_search_quant if self.codes is not None else _sharded_search_exact
        args = (self.codes,) if self.codes is not None else ()
        s, i = fn(
            self.mesh, self.per_shard, k, self.similarity,
            *args, self.vectors, self.valid, qj,
        )
        return np.asarray(s)[:b], np.asarray(i)[:b]


@partial(jax.jit, static_argnames=("mesh", "per_shard", "k", "similarity"))
def _sharded_search_exact(mesh, per_shard, k, similarity, vectors, valid, queries):
    def local(vecs, val, q):
        shard = jax.lax.axis_index("shard")
        qs = prepare_query(q, similarity)
        scores = scores_matmul(qs, vecs)  # [B_local, N_local]
        ls, li = masked_topk(scores, k, mask=val)
        li = jnp.where(li >= 0, li + shard * per_shard, -1)
        return sharded_topk_allgather(ls, li, k, "shard")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shard", None), P("shard"), P("query", None)),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )(vectors, valid, queries)


@partial(jax.jit, static_argnames=("mesh", "per_shard", "k", "similarity"))
def _sharded_search_quant(mesh, per_shard, k, similarity, codes, vectors, valid, queries):
    def local(codes_codes, codes_scale, vecs, val, q):
        shard = jax.lax.axis_index("shard")
        qs = prepare_query(q, similarity)
        ic = quant.Int8Codes(codes=codes_codes, scale=codes_scale)
        est = quant.int8_estimate_scores(ic, qs)
        c = min(quant.int8_rerank_budget(k), est.shape[-1])
        _, cand = quant.approx_candidates(est, c, mask=val)
        ls, li = exact_rerank(q, vecs, cand, k, similarity=similarity)
        li = jnp.where(li >= 0, li + shard * per_shard, -1)
        return sharded_topk_allgather(ls, li, k, "shard")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("shard", None), P("shard"),
            P("shard", None), P("shard"), P("query", None),
        ),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )(codes.codes, codes.scale, vectors, valid, queries)
