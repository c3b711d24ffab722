"""Mesh-sharded BM25: per-shard postings + ICI all-gather top-k merge.

The vector path already scales over the ``shard`` mesh axis
(parallel/mesh.py); this is the keyword half of the hybrid pipeline. Each
device row holds one document partition's tiered postings (the same layout
DeviceTextEngine builds for one chip); a query runs the local BM25 kernel
on every shard in ONE jitted shard_map program and merges the [B, k] cuts
with an all-gather — replacing the reference's cross-node gRPC
scatter-gather + host merge (nidx/src/searcher/{shards_query,shard_merge}.rs)
for shards living inside one TPU slice.

Per-shard query planning stays on the host (term -> tier/row mapping is
shard-local, tiny arrays); all scoring is device-side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.text_engine.engine import DeviceTextEngine, TextQuery, _bm25_search
from ..ops.topk import sharded_topk_allgather
from ..utils.platform import configure_jax, device_fetch


def _pad2(a: np.ndarray, shape: tuple[int, int], fill) -> np.ndarray:
    out = np.full(shape, fill, a.dtype)
    out[: a.shape[0], : a.shape[1]] = a
    return out


class MeshShardedTextEngine:
    """S per-shard engines stacked into [S, ...] device arrays on the
    ``shard`` mesh axis. Global doc id = shard_offset + local id."""

    def __init__(self, engines: list[DeviceTextEngine], mesh: Mesh):
        assert len(engines) == mesh.shape["shard"], (len(engines), mesh.shape)
        configure_jax()  # persistent compile cache before the first jit
        self.engines = engines
        self.mesh = mesh
        s = len(engines)

        # mesh engines are freshly built (one solo arena group), so every
        # shard shares the full tier + dense layout and fixed query caps
        assert all(len(e.groups) == 1 for e in engines), (
            "mesh sharding expects full-built engines (one solo group)"
        )
        self.caps = engines[0].fixed_caps()

        # common padded shapes across shards (per tier)
        n_tiers = len(engines[0].tiers)
        self._stack = []
        sharding = NamedSharding(mesh, P("shard"))
        for t in range(n_tiers):
            td = [np.asarray(e.tiers[t][0]) for e in engines]
            tf = [np.asarray(e.tiers[t][1]) for e in engines]
            tl = [np.asarray(e.tiers[t][2]) for e in engines]
            shape = (
                max(a.shape[0] for a in td),
                max(a.shape[1] for a in td),
            )
            docs = np.stack([_pad2(a, shape, -1) for a in td])
            tfs = np.stack([_pad2(a, shape, 0) for a in tf])
            dls = np.stack([_pad2(a, shape, 1) for a in tl])
            self._stack.append(
                (
                    jax.device_put(docs, sharding),
                    jax.device_put(tfs, sharding),
                    jax.device_put(dls, sharding),
                )
            )
        dn = [np.asarray(e.dense_tf) for e in engines]
        dshape = (max(a.shape[0] for a in dn), max(a.shape[1] for a in dn))
        self.dense_tf = jax.device_put(
            np.stack([_pad2(a, dshape, 0) for a in dn]), sharding
        )
        self.n_pad = dshape[1]
        dlen = np.zeros((s, self.n_pad), np.float32)
        for i, e in enumerate(engines):
            dl = np.asarray(e.dlen)
            dlen[i, : dl.shape[0]] = dl
        self.dlen = jax.device_put(dlen, sharding)
        self.offsets = np.cumsum([0] + [e.n_docs for e in engines])  # [S+1]
        self._offsets_dev = jax.device_put(
            self.offsets[:-1].astype(np.int32).reshape(s, 1), sharding
        )

    @property
    def n_docs(self) -> int:
        return int(self.offsets[-1])

    def key(self, global_id: int) -> str:
        shard = int(np.searchsorted(self.offsets, global_id, side="right") - 1)
        return self.engines[shard].keys[global_id - self.offsets[shard]]

    def search(self, query: TextQuery) -> tuple[np.ndarray, np.ndarray]:
        """Returns ([k] scores, [k] global doc ids) — the merged cut."""
        s = len(self.engines)
        rows, idfs, params, masks = [], [], [], []
        for i, e in enumerate(self.engines):
            r, w, p, mk = e._device_inputs(query)
            rows.append(r)
            idfs.append(w)
            params.append(p)
            m = np.zeros(self.n_pad, bool)
            m[: mk.shape[0]] = mk
            masks.append(m)
        sharding = NamedSharding(self.mesh, P("shard"))
        rows_j = jax.device_put(np.stack(rows), sharding)
        idfs_j = jax.device_put(np.stack(idfs), sharding)
        params_j = jax.device_put(np.stack(params).astype(np.float32), sharding)
        mask_j = jax.device_put(np.stack(masks), sharding)
        # cap at the MESH-wide doc capacity: the per-shard n_pad clamp
        # (right for a single engine) silently truncated multi-shard
        # results; _bm25_search's masked_topk pads when k > local corpus
        k = min(query.top_k, s * self.n_pad)

        top_s, top_i = _mesh_bm25(
            self.mesh, k, self.caps,
            tuple(self._stack), self.dense_tf, self.dlen, mask_j, rows_j,
            idfs_j, params_j, self._offsets_dev,
        )
        top_s, top_i = device_fetch(top_s, top_i)
        out_s = top_s[0]
        out_i = top_i[0]
        keep = out_i >= 0
        return out_s[keep], out_i[keep]


@partial(jax.jit, static_argnames=("mesh", "k", "caps"))
def _mesh_bm25(
    mesh, k, caps,
    tiers, dense_tf, dlen, mask, rows, idfs, params, offsets,
):
    spec = P("shard")

    def local(tiers, dense_tf, dlen, mask, rows, idfs, params, offset):
        # leading per-shard axis of size 1 inside shard_map
        top_s, top_ic, _ = _bm25_search.__wrapped__(
            tuple((d[0], f[0], l[0]) for d, f, l in tiers),
            dense_tf[0], None, dlen[0], mask[0], rows[0], idfs[0], params[0],
            k, caps, 0,
        )
        top_i = top_ic[:k]  # ids lead the packed [ids | term counts] array
        top_i = jnp.where(top_i >= 0, top_i + offset[0, 0], -1)
        ms, mi = sharded_topk_allgather(
            top_s[None, :], top_i[None, :], k, "shard"
        )
        return ms, mi

    n_tiers = len(tiers)
    return shard_map(
        local, mesh=mesh,
        in_specs=(
            tuple((spec, spec, spec) for _ in range(n_tiers)),
            spec, spec, spec, spec, spec, spec, spec,
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(tiers, dense_tf, dlen, mask, rows, idfs, params, offsets)
