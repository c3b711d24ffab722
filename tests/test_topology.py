"""Dynamic topology: node-list watch, failover mid-scatter, re-placement.

Parity target: the reference's searcher watches K8s pods, re-selects via
rendezvous, re-syncs/drops shards on change and scatter-gather retries the
next replica (nidx/src/searcher/shard_selector.rs:55-150, sync.rs:84-90,
grpc.rs:360-).
"""

import json

import numpy as np
import pytest

from nucliadb_tpu.cluster import DistributedSearcher, ShardSelector, TopologyWatcher
from nucliadb_tpu.shard import ShardSearchRequest, ShardSearchResponse


def _write_topology(path, names):
    path.write_text(json.dumps([{"name": n} for n in names]))


def test_watcher_reads_and_refreshes(tmp_path):
    topo = tmp_path / "nodes.json"
    _write_topology(topo, ["n1", "n2"])
    made, closed = [], []

    class B:
        def __init__(self, name):
            self.name = name

        def close(self):
            closed.append(self.name)

    w = TopologyWatcher(
        str(topo), make_backend=lambda name, addr: made.append(name) or B(name)
    )
    assert w.selector.nodes == ["n1", "n2"] and made == ["n1", "n2"]
    assert not w.refresh()  # unchanged

    changes = []
    w.on_change = lambda old, new: changes.append((old, new))
    _write_topology(topo, ["n1", "n3"])
    assert w.refresh()
    assert w.selector.nodes == ["n1", "n3"]
    assert closed == ["n2"] and "n3" in w.backends and "n2" not in w.backends
    assert changes == [(["n1", "n2"], ["n1", "n3"])]


def test_env_override(tmp_path, monkeypatch):
    topo = tmp_path / "nodes.json"
    _write_topology(topo, ["file1"])
    monkeypatch.setenv("NDBTPU_CLUSTER_NODES", "e1=host:1,e2")
    w = TopologyWatcher(str(topo))
    assert w.selector.nodes == ["e1", "e2"]
    assert w.addresses == {"e1": "host:1", "e2": None}


class FlakyBackend:
    """Test double; raises once killed (parity: SearcherCluster network
    partition doubles, nidx/tests/common/cluster.rs:70-76)."""

    def __init__(self, name):
        self.name = name
        self.alive = True
        self.calls = []

    def search(self, shard_id, request):
        self.calls.append(shard_id)
        if not self.alive:
            raise ConnectionError(f"{self.name} is down")
        from nucliadb_tpu.index.paragraph import ParagraphHit, ParagraphSearchResponse

        return ShardSearchResponse(
            paragraph=ParagraphSearchResponse(
                hits=[ParagraphHit(
                    paragraph_id=f"{shard_id}@{self.name}", rid="r", field="f",
                    score=1.0, start=0, end=1, split="", index=0, ematch=False,
                )],
                total=1, ematches=[], query_terms=[],
            )
        )


def test_kill_node_mid_scatter_then_replace(tmp_path):
    """A node dying mid-scatter fails over to the next replica; removing it
    from the topology re-places its shards on the survivors."""
    topo = tmp_path / "nodes.json"
    _write_topology(topo, ["n1", "n2", "n3"])
    backends: dict[str, FlakyBackend] = {}
    w = TopologyWatcher(
        str(topo), replication=2,
        make_backend=lambda name, addr: backends.setdefault(name, FlakyBackend(name)),
    )
    searcher = DistributedSearcher(w.backends, w.selector)
    shard_ids = [f"shard-{i}" for i in range(12)]

    # some shard must have n2 as primary for the kill to matter
    n2_primary = [s for s in shard_ids if w.selector.primary(s) == "n2"]
    assert n2_primary

    backends["n2"] = FlakyBackend("n2")
    w.backends["n2"] = backends["n2"]
    backends["n2"].alive = False  # killed mid-scatter

    resp, errors = searcher.search(shard_ids, ShardSearchRequest(body="q", top_k=20))
    assert errors == []  # every shard failed over to a live replica
    assert resp.paragraph is not None and len(resp.paragraph.hits) == len(shard_ids)
    assert backends["n2"].calls  # it was attempted
    assert all("@n2" not in h.paragraph_id for h in resp.paragraph.hits)

    # operator removes the dead node -> placement excludes it entirely
    _write_topology(topo, ["n1", "n3"])
    assert w.refresh()
    assert all(
        "n2" not in w.selector.nodes_for_shard(s) for s in shard_ids
    )
    for s in n2_primary:
        assert w.selector.primary(s) in ("n1", "n3")
    backends["n2"].calls.clear()
    resp, errors = searcher.search(shard_ids, ShardSearchRequest(body="q", top_k=20))
    assert errors == [] and backends["n2"].calls == []  # never dialed again


def test_searcher_replacement_on_topology_change(tmp_path):
    """Two real SyncedSearchers over one metadata store: shard ownership
    follows the shared selector; dropping a node re-syncs its shards onto
    the survivor and evicts them from the removed node."""
    from nucliadb_tpu.metadata import MetadataStore
    from nucliadb_tpu.services import EmbeddedNode
    from nucliadb_tpu.services.searcher import SyncedSearcher
    from nucliadb_tpu.storage import MemoryStorage

    topo = tmp_path / "nodes.json"
    _write_topology(topo, ["n1", "n2"])
    w = TopologyWatcher(str(topo), replication=1)

    storage = MemoryStorage()
    node = EmbeddedNode(data_dir=str(tmp_path / "ingest"), storage=storage)

    from nucliadb_tpu.models.internal import ResourceDoc, TextInformation

    # keep creating shards until BOTH nodes own at least one: rendezvous
    # placement over random shard ids puts all N on one node with
    # probability 2^(1-N) — at 6 shards that's a ~3% test flake
    shard_ids = []
    for i in range(24):
        sid = node.create_shard("kb1", {})
        shard_ids.append(sid)
        doc = ResourceDoc(resource_id=f"r{i}")
        doc.texts["t/body"] = TextInformation(text=f"topology doc {i}")
        node.index(sid, doc)
        if i >= 5 and (
            w.selector.owned_shards("n1", shard_ids)
            and w.selector.owned_shards("n2", shard_ids)
        ):
            break

    s1 = SyncedSearcher(
        node.metadata, storage, str(tmp_path / "n1"),
        selector=w.selector, node_name="n1",
    )
    s2 = SyncedSearcher(
        node.metadata, storage, str(tmp_path / "n2"),
        selector=w.selector, node_name="n2",
    )
    s1.sync()
    s2.sync()
    owned1 = set(w.selector.owned_shards("n1", shard_ids))
    owned2 = set(w.selector.owned_shards("n2", shard_ids))
    assert owned1 and owned2 and owned1.isdisjoint(owned2)

    def req():
        return ShardSearchRequest(
            body="topology", top_k=5, document=True, paragraph=False
        )

    # each node serves its owned shards
    for sid in owned1:
        resp = s1.search(sid, req())
        assert resp.document is not None and resp.document.hits
    # warm both nodes' caches so eviction is observable
    for sid in owned2:
        s2.search(sid, req())
    assert set(s2._shards) & owned2

    # n2 leaves -> its shards re-place onto n1, and n2 drops them at sync
    _write_topology(topo, ["n1"])
    assert w.refresh()
    assert set(w.selector.owned_shards("n1", shard_ids)) == set(shard_ids)
    s2.sync()
    assert not (set(s2._shards) & owned2)  # dropped on topology change
    s1.sync()
    for sid in shard_ids:
        resp = s1.search(sid, req())
        assert resp.document is not None and resp.document.hits


def test_watcher_redials_on_address_change(tmp_path):
    """Regression: refresh() compared node NAMES only — a node restarting
    at a new address was never redialed and its backend stayed pointed at
    the dead endpoint forever."""
    topo = tmp_path / "nodes.json"
    topo.write_text(json.dumps([{"name": "n1", "address": "10.0.0.5:10000"}]))
    made, closed = [], []

    class B:
        def __init__(self, name, addr):
            self.name, self.addr = name, addr

        def close(self):
            closed.append(self.name)

    w = TopologyWatcher(
        str(topo), make_backend=lambda name, addr: made.append((name, addr)) or B(name, addr)
    )
    assert made == [("n1", "10.0.0.5:10000")]

    topo.write_text(json.dumps([{"name": "n1", "address": "10.0.0.9:10000"}]))
    assert w.refresh()  # address-only change IS a change
    assert closed == ["n1"]
    assert made[-1] == ("n1", "10.0.0.9:10000")
    assert w.backends["n1"].addr == "10.0.0.9:10000"
    assert not w.refresh()  # stable afterwards
