"""Mesh-sharded HYBRID search: vector scan + BM25 + RRF in one program.

The product's /find runs keyword and semantic retrieval then fuses with RRF
(search/find.py). On a TPU slice the whole hybrid query becomes ONE jitted
``shard_map`` program: every shard runs its local int8 vector scan + exact
rerank AND its local BM25 kernel, both cuts merge across shards with ICI
all-gathers, and the RRF fusion (ops/fusion.py, k=60) happens on device —
zero host round trips between retrieval legs and fusion. This replaces the
reference's scatter-gather + Python fusion (shards_query.rs + shard_merge.rs
+ rank_fusion.py:106-186) for shards living inside one slice.

Alignment contract: text doc j of shard s and vector row j of shard s are
the same record (one paragraph per record), so global id = offset_s + j is
one shared id space for the fusion — the arrangement the consolidated
single-chip index uses too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.text_engine.engine import DeviceTextEngine, TextQuery, _bm25_search
from ..ops import quant
from ..ops.distance import exact_rerank, prepare_query
from ..utils.platform import device_fetch
from ..ops.fusion import rrf_merge
from ..ops.topk import sharded_topk_allgather
from .text_mesh import MeshShardedTextEngine


class MeshHybridIndex:
    """Per-shard (vectors, text engine) pairs fused into one device program.

    ``shard_data`` = list of (vectors [n_s, D] f32, DeviceTextEngine) —
    entry j of both sides is the same record.
    """

    def __init__(self, shard_data, mesh: Mesh, *, similarity: str = "dot"):
        vec_list = [np.asarray(v, np.float32) for v, _ in shard_data]
        engines = [e for _, e in shard_data]
        assert len(vec_list) == mesh.shape["shard"]
        for v, e in zip(vec_list, engines):
            assert v.shape[0] == e.n_docs, (v.shape, e.n_docs)
        self.mesh = mesh
        self.similarity = similarity
        self.text = MeshShardedTextEngine(engines, mesh)

        s = len(vec_list)
        d = vec_list[0].shape[1]
        # one shared per-shard capacity: the text engine's padded doc count
        per = self.text.n_pad
        arena = np.zeros((s, per, d), np.float32)
        valid = np.zeros((s, per), bool)
        for i, v in enumerate(vec_list):
            arena[i, : v.shape[0]] = v
            valid[i, : v.shape[0]] = True
        sharding = NamedSharding(mesh, P("shard"))
        self.vectors = jax.device_put(arena, sharding)
        self.valid = jax.device_put(valid, sharding)
        encode = shard_map(
            lambda v: quant.Int8Codes.encode(v[0]),
            mesh=mesh,
            in_specs=P("shard"),
            out_specs=quant.Int8Codes(codes=P("shard", None), scale=P("shard")),
            check_vma=False,
        )
        self.codes = jax.jit(encode)(self.vectors)
        self.per_shard = per
        # text offsets (canonical global ids) must match the vector layout:
        # both sides pad to `per` records per shard
        self.offsets = np.arange(s, dtype=np.int64) * per
        self._offsets_dev = jax.device_put(
            self.offsets.astype(np.int32).reshape(s, 1), sharding
        )

    @property
    def n_docs(self) -> int:
        return int(self.text.n_docs)

    def key(self, global_id: int) -> str:
        shard = int(global_id) // self.per_shard
        return self.text.engines[shard].keys[int(global_id) % self.per_shard]

    def search(
        self, queries: np.ndarray, text_query: TextQuery, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Hybrid top-k: [B, D] query vectors + one keyword query applied to
        every row. Returns ([B, k] fused scores, [B, k] global ids)."""
        b = queries.shape[0]
        qn = self.mesh.shape["query"]
        b_pad = -(-b // qn) * qn
        qp = np.zeros((b_pad, queries.shape[1]), np.float32)
        qp[:b] = queries
        qj = jax.device_put(
            jnp.asarray(qp), NamedSharding(self.mesh, P("query", None))
        )

        s = len(self.text.engines)
        rows, idfs, params, masks = [], [], [], []
        for e in self.text.engines:
            r, w, p, mk = e._device_inputs(text_query)
            rows.append(r)
            idfs.append(w)
            params.append(p)
            m = np.zeros(self.text.n_pad, bool)
            m[: mk.shape[0]] = mk
            masks.append(m)
        sharding = NamedSharding(self.mesh, P("shard"))
        rows_j = jax.device_put(np.stack(rows), sharding)
        idfs_j = jax.device_put(np.stack(idfs), sharding)
        params_j = jax.device_put(np.stack(params).astype(np.float32), sharding)
        tmask_j = jax.device_put(np.stack(masks), sharding)

        ts, ti = _mesh_hybrid(
            self.mesh, k, self.per_shard, self.similarity, self.text.caps,
            self.codes.codes, self.codes.scale, self.vectors, self.valid,
            tuple(self.text._stack), self.text.dense_tf, self.text.dlen,
            tmask_j, rows_j, idfs_j, params_j, self._offsets_dev, qj,
        )
        ts, ti = device_fetch(ts, ti)
        return ts[:b], ti[:b]


@partial(jax.jit, static_argnames=("mesh", "k", "per_shard", "similarity", "caps"))
def _mesh_hybrid(
    mesh, k, per_shard, similarity, caps,
    codes, scale, vectors, valid,
    tiers, dense_tf, dlen, tmask,
    rows, idfs, params, offsets, queries,
):
    def local(codes, scale, vecs, val, tiers, dense_tf, dlen, tmask,
              rows, idfs, params, offset, q):
        shard = jax.lax.axis_index("shard")
        base = shard * per_shard

        # ---- semantic leg: int8 candidates -> exact rerank (local) ----
        qs = prepare_query(q, similarity)
        # codes/scale global shapes are [S*per, D]/[S*per] (the shard_map
        # encode concatenates per-shard outputs), so the local block has no
        # leading shard axis — unlike the [S, per, ...] arena arrays
        ic = quant.Int8Codes(codes=codes, scale=scale)
        est = quant.int8_estimate_scores(ic, qs)
        c = min(quant.int8_rerank_budget(k), est.shape[-1])
        _, cand = quant.approx_candidates(est, c, mask=val[0])
        vs, vi = exact_rerank(q, vecs[0], cand, k, similarity=similarity)
        vi = jnp.where(vi >= 0, vi + base, -1)
        vg_s, vg_i = sharded_topk_allgather(vs, vi, k, "shard")

        # ---- keyword leg: local BM25 -> merged cut ----
        bs, bic, _ = _bm25_search.__wrapped__(
            tuple((d[0], f[0], l[0]) for d, f, l in tiers),
            dense_tf[0], None, dlen[0], tmask[0], rows[0], idfs[0], params[0],
            k, caps, 0,
        )
        bi = bic[:k]  # ids lead the packed [ids | term counts] array
        bi = jnp.where(bi >= 0, bi + offset[0, 0], -1)
        bg_s, bg_i = sharded_topk_allgather(bs[None, :], bi[None, :], k, "shard")

        # ---- fusion on device (RRF k=60, rank_fusion.py parity) ----
        bi_b = jnp.broadcast_to(bg_i, (vg_i.shape[0], bg_i.shape[-1]))
        return rrf_merge(vg_i, bi_b, k)

    spec = P("shard")
    return shard_map(
        local, mesh=mesh,
        in_specs=(
            spec, spec, spec, spec,
            tuple((spec, spec, spec) for _ in range(len(tiers))),
            spec, spec, spec,
            spec, spec, spec, spec,
            P("query", None),
        ),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )(
        codes, scale, vectors, valid,
        tiers, dense_tf, dlen, tmask,
        rows, idfs, params, offsets, queries,
    )
