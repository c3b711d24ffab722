"""Mesh execution of co-resident shards' keyword (BM25) legs as ONE
sharded program.

The companion of parallel/group.py for the text half of a hybrid /find:
the reference executes every index leg inside its per-shard parallel
fan-out (nidx/src/searcher/shard_search.rs:211-273, shards_query.rs:29-72);
here the co-resident shards' paragraph engines stack along the ``shard``
mesh axis and every shard's BM25 scoring + top-k cut runs in one
``shard_map`` dispatch. Per-shard cuts return to the host (the product
pipeline fuses ALL per-shard hits with RRF over the concatenated lists,
search/find.py) — the ICI all-gather merged cut lives in
MeshShardedTextEngine (parallel/text_mesh.py) for engine-level consumers.

Parity contract: each shard's leg runs the SAME kernel as a sequential
DeviceTextEngine.search dispatch — ``_bm25_groups_core`` over the shard's
own arena-group tensors, offsets, planned slot rows and filter mask — via
an UNROLLED per-device member loop (like the vector group), so scores,
ids, matched-term counts and match totals are those the per-shard path
produces. Host-side planning (term -> tier/row mapping, masks, adaptive
caps) stays per-shard exactly as in the sequential path; the group's caps
tuple is the elementwise max of the members' adaptive caps, which never
drops a term any member would have scheduled.

Eligibility is a LAYOUT condition: every member engine must expose the
same arena-group signature (per-group tier widths + dense presence), so
the stacked tensors share one static kernel shape. Within a signature,
per-tier row counts and score-space lengths may differ — members pad to
the group max (docs -1 / tf 0 / dl 1 / mask False), which contributes
nothing to any score.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.text_engine.engine import TextQuery, _bm25_groups_core


def _pad_axis0(a: jax.Array, rows: int, fill) -> jax.Array:
    if a.shape[0] == rows:
        return a
    pad = jnp.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _pad_axis1(a: jax.Array, cols: int, fill) -> jax.Array:
    if a.shape[1] == cols:
        return a
    pad = jnp.full((a.shape[0], cols - a.shape[1]), fill, a.dtype)
    return jnp.concatenate([a, pad], axis=1)


def layout_sig(engine) -> tuple:
    """The static kernel-shape signature a member contributes: per
    arena-group tier widths and dense-block presence."""
    return tuple(
        (g.widths, g.dense_dev is not None) for g in engine.groups
    )


class MeshTextGroup:
    """The paragraph engines of N co-resident shards, stacked over a 1-D
    ``shard`` mesh. Rebuilt (by the caller's cache) when any member shard
    reloads."""

    @staticmethod
    def eligible(psearchers: Sequence) -> bool:
        if not psearchers or any(p is None for p in psearchers):
            return False
        engines = [p.engine for p in psearchers]
        if any(e.n_docs == 0 for e in engines):
            return False
        return len({layout_sig(e) for e in engines}) == 1

    def __init__(self, psearchers: Sequence, mesh: Mesh | None = None):
        assert self.eligible(psearchers)
        self.searchers = list(psearchers)
        engines = [p.engine for p in psearchers]
        self.engines = engines
        devices = jax.devices()
        self.mesh = mesh or Mesh(np.array(devices), ("shard",))
        n_dev = self.mesh.shape["shard"]
        s = len(engines)
        self.n_shards = s
        self.shards_per_dev = -(-s // n_dev)
        self.s_pad = self.shards_per_dev * n_dev
        sig = layout_sig(engines[0])
        self.tier_counts = tuple(len(w) for w, _ in sig)
        n_groups = len(sig)

        # score-space length: every member's n_pad AND every padded dense
        # window must fit (offset_g + padded group width — a member whose
        # group is smaller than the group-max width would otherwise slide
        # its dense window out of bounds and dynamic_slice would clamp it
        # onto the wrong docs)
        gp_pad = [
            max(e.groups[gi].n_pad for e in engines) for gi in range(n_groups)
        ]
        self.n_pad = max(
            max(e.n_pad for e in engines),
            max(
                int(e.group_offsets[gi]) + gp_pad[gi]
                for e in engines
                for gi in range(n_groups)
            ),
        )

        sharding = NamedSharding(self.mesh, P("shard"))
        # stacking happens ON DEVICE (the members' arenas are already
        # device-resident; a host round trip through the ~10 MB/s relay to
        # restack postings would dwarf any serving win)
        stacked_groups = []
        for gi in range(n_groups):
            tiers = []
            for ti in range(self.tier_counts[gi]):
                # an EMPTY tier is a (1, 1) placeholder, not (1, width) —
                # pad both axes to the group max; pad rows are never
                # scheduled (each member's slot rows index its own tier)
                # and pad cells are inert (doc -1 / tf 0 / dl 1)
                rows = max(e.groups[gi].tiers_dev[ti][0].shape[0] for e in engines)
                cols = max(e.groups[gi].tiers_dev[ti][0].shape[1] for e in engines)
                stacked = []
                for part, fill in ((0, -1), (1, 0), (2, 1)):
                    padded = [
                        _pad_axis1(
                            _pad_axis0(e.groups[gi].tiers_dev[ti][part], rows, fill),
                            cols, fill,
                        )
                        for e in engines
                    ]
                    stacked.append(
                        jax.device_put(
                            jnp.stack(self._pad_members(padded)), sharding
                        )
                    )
                tiers.append(tuple(stacked))
            if sig[gi][1]:
                r_max = max(e.groups[gi].dense_dev.shape[0] for e in engines)
                dense = [
                    _pad_axis1(
                        _pad_axis0(e.groups[gi].dense_dev, r_max, 0),
                        gp_pad[gi], 0,
                    )
                    for e in engines
                ]
                dense_dev = jax.device_put(
                    jnp.stack(self._pad_members(dense)), sharding
                )
            else:
                dense_dev = None
            dl = [
                _pad_axis0(e.groups[gi].dl_dev, gp_pad[gi], 1) for e in engines
            ]
            dl_dev = jax.device_put(jnp.stack(self._pad_members(dl)), sharding)
            stacked_groups.append((tuple(tiers), dense_dev, dl_dev))
        self.groups = tuple(stacked_groups)

        offsets = np.zeros((self.s_pad, n_groups), np.int32)
        for i, e in enumerate(engines):
            offsets[i] = e.group_offsets[:-1].astype(np.int32)
        self.offsets = jax.device_put(jnp.asarray(offsets), sharding)
        self._sharding = sharding

    def _pad_members(self, arrs: list) -> list:
        """Pad the member list to s_pad with zero-like entries (the mesh
        axis must divide evenly; surplus rows are never read — their masks
        are all False and their slot rows all -1)."""
        while len(arrs) < self.s_pad:
            arrs.append(jnp.zeros_like(arrs[0]))
        return arrs

    # ------------------------------------------------------------------

    def search(
        self, queries: "Sequence[Optional[TextQuery]]", top_k: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One sharded program scoring each member shard's query.

        ``queries[i]`` is shard i's planned TextQuery (None = skip that
        shard: empty prefilter — its row dispatches with no scheduled terms
        and an all-False mask). All queries come from ONE product request,
        so ``top_k`` / all_terms are uniform. Returns ([S, k] scores,
        [S, 2k] packed ids+counts, [S] match counts) — exactly what S
        sequential ``DeviceTextEngine.search`` count-only dispatches return.
        """
        assert len(queries) == self.n_shards
        k = min(top_k, self.n_pad)
        with_counts = any(q is not None and q.all_terms for q in queries)

        caps_list, plans = [], []
        for e, q in zip(self.engines, queries):
            if q is None:
                plans.append(None)
                continue
            terms, required = e._plan_terms(q)
            slots = e._plan_slots(terms)
            caps_list.append(e._caps_for(slots, adaptive=True))
            plans.append((e, q, slots, required))
        if not caps_list:
            raise ValueError("mesh text group search with no active shards")
        caps = tuple(
            max(c[i] for c in caps_list) for i in range(len(caps_list[0]))
        )
        width = int(sum(caps))
        rows = np.full((self.s_pad, width), -1, np.int32)
        idfs = np.zeros((self.s_pad, width), np.float32)
        params = np.zeros((self.s_pad, 3), np.float32)
        params[:, 0] = 1.0  # avgdl placeholder for skipped rows
        masks = np.zeros((self.s_pad, self.n_pad), bool)
        for i, plan in enumerate(plans):
            if plan is None:
                continue
            e, q, slots, required = plan
            r, w, scheduled = e._pack_slots(slots, caps)
            rows[i], idfs[i] = r, w
            params[i] = e._params_for(required, scheduled, q)
            m = e.build_mask(q)
            masks[i, : m.shape[0]] = m

        top_s, top_ic, counts = _group_text_search(
            self.mesh, k, caps, self.tier_counts, with_counts,
            self.groups, self.offsets,
            jax.device_put(masks, self._sharding),
            jax.device_put(rows, self._sharding),
            jax.device_put(idfs, self._sharding),
            jax.device_put(params, self._sharding),
        )
        from ..utils.platform import device_fetch

        top_s, top_ic, counts = device_fetch(top_s, top_ic, counts)
        return (
            top_s[: self.n_shards],
            top_ic[: self.n_shards],
            counts[: self.n_shards],
        )


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "caps", "tier_counts", "with_counts"),
)
def _group_text_search(
    mesh, k, caps, tier_counts, with_counts,
    groups, offsets, masks, rows, idfs, params,
):
    def local(groups, offsets, masks, rows, idfs, params):
        outs = []
        # unrolled static loop (m = shards_per_dev, typically 1): each
        # member runs the SAME kernel as a sequential engine dispatch
        for j in range(masks.shape[0]):
            gj = tuple(
                (
                    tuple((d[j], f[j], l[j]) for d, f, l in tiers),
                    None if dense is None else dense[j],
                    dl[j],
                )
                for tiers, dense, dl in groups
            )
            outs.append(
                _bm25_groups_core(
                    gj, offsets[j], masks[j], rows[j], idfs[j], params[j],
                    k, caps, tier_counts, with_counts,
                )
            )
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
            jnp.stack([jnp.sum(o[2]) for o in outs]).astype(jnp.int32),
        )

    spec_tree = jax.tree.map(lambda _: P("shard"), groups)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_tree, P("shard"), P("shard"), P("shard"), P("shard"),
            P("shard"),
        ),
        out_specs=(P("shard"), P("shard"), P("shard")),
        check_vma=False,
    )(groups, offsets, masks, rows, idfs, params)
