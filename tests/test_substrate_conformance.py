"""Run the substrate conformance battery (tests/substrate_conformance.py —
the documented backend contract) against BOTH implementations:

- local: the sqlite/file backends the standalone mode embeds
- remote: the gRPC Remote* clients over a live SubstrateServer

A future PostgreSQL/NATS adapter (the reference's engines) must pass the
same battery; plus: substrate restart resilience (clients ride out a server
bounce with no lost acked writes — the recovery posture of
nidx/src/metadata.rs:37-100, where PG survives component restarts) and the
online snapshot hook.
"""

import os

import pytest

from nucliadb_tpu.bus import EmbeddedBus
from nucliadb_tpu.maindb import Driver
from nucliadb_tpu.metadata import MetadataStore
from nucliadb_tpu.storage import LocalStorage
from nucliadb_tpu.substrate import (
    RemoteBus,
    RemoteDriver,
    RemoteMetadataStore,
    RemoteStorage,
    SubstrateServer,
)
from nucliadb_tpu.types import Seq
from tests.substrate_conformance import ALL_CHECKS


@pytest.fixture(params=["local", "remote"], scope="module")
def backends(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"conf_{request.param}")
    if request.param == "local":
        yield {
            "meta": MetadataStore(str(tmp / "metadata.db")),
            "bus": EmbeddedBus(str(tmp / "bus.db")),
            "kv": Driver(str(tmp / "maindb.db")),
            "blob": LocalStorage(str(tmp / "blobs")),
        }
        return
    server = SubstrateServer(str(tmp / "substrate"))
    server.start()
    addr = f"127.0.0.1:{server.port}"
    clients = {
        "meta": RemoteMetadataStore(addr),
        "bus": RemoteBus(addr),
        "kv": RemoteDriver(addr),
        "blob": RemoteStorage(addr),
    }
    yield clients
    for c in clients.values():
        c.close()
    server.stop()


@pytest.mark.parametrize("check", ALL_CHECKS, ids=lambda c: c.__name__)
def test_conformance(backends, check):
    name = check.__name__
    if name.startswith("check_meta"):
        check(backends["meta"])
    elif name.startswith("check_bus"):
        check(backends["bus"])
    elif name.startswith("check_kv"):
        check(backends["kv"])
    else:
        check(backends["blob"])


# ---------------------------------------------------------------------------
# restart resilience + snapshot
# ---------------------------------------------------------------------------


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_substrate_restart_mid_ingest(tmp_path):
    """Kill and restart the SubstrateServer while a client ingests: the
    clients reconnect (bounded UNAVAILABLE retry), every ACKED write
    survives (sqlite WAL durability), and indexing continues after the
    bounce (VERDICT r2 #8)."""
    data_dir = str(tmp_path / "substrate")
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    server = SubstrateServer(data_dir, address=addr)
    server.start()

    meta = RemoteMetadataStore(addr)
    bus = RemoteBus(addr)
    blob = RemoteStorage(addr)
    kv = RemoteDriver(addr)

    meta.create_shard("rs1", "kbr")
    idx = meta.create_index("rs1", "text", "text", {})
    acked_segments = []
    acked_msgs = []
    for i in range(3):
        seg = meta.create_segment(idx.id, Seq(i + 1), 5)
        meta.commit_operation(ready_segments=[seg.id], deletions=[], touched_indexes=[idx.id])
        acked_segments.append(seg.id)
        blob.put(f"seg/{seg.id}", f"segment-{i}".encode())
        acked_msgs.append(bus.publish("rs_ing", "m", f"msg{i}".encode()))
        with kv as txn:
            txn.set(f"/rs/doc{i}", f"v{i}".encode())

    # bounce the server mid-stream (same data dir + port: the supervisor
    # restart story)
    server.stop(grace=0)
    import threading

    restarted = {}

    def restart_later():
        import time

        time.sleep(1.0)
        s2 = SubstrateServer(data_dir, address=addr)
        s2.start()
        restarted["server"] = s2

    threading.Thread(target=restart_later, daemon=True).start()

    # calls issued while the server is DOWN must succeed once it returns
    seg = meta.create_segment(idx.id, Seq(10), 5)
    meta.commit_operation(ready_segments=[seg.id], deletions=[], touched_indexes=[idx.id])
    acked_segments.append(seg.id)

    # nothing acked before the bounce is lost
    ready = {s.id for s in meta.ready_segments(idx.id)}
    assert set(acked_segments) <= ready
    for i in range(3):
        assert blob.get(f"seg/{acked_segments[i]}") == f"segment-{i}".encode()
    msgs = list(bus.scan("rs_ing", after_seq=0))
    assert [m.payload for m in msgs] == [b"msg0", b"msg1", b"msg2"]
    with kv as txn:
        assert txn.batch_get([f"/rs/doc{i}" for i in range(3)]) == [b"v0", b"v1", b"v2"]

    for c in (meta, bus, blob, kv):
        c.close()
    restarted["server"].stop()


def test_substrate_snapshot(tmp_path):
    """The online snapshot hook: a consistent copy of metadata/bus/kv/blobs
    taken WHILE the server keeps serving, restorable by pointing a new
    server at the snapshot dir."""
    server = SubstrateServer(str(tmp_path / "live"))
    server.start()
    addr = f"127.0.0.1:{server.port}"
    meta = RemoteMetadataStore(addr)
    blob = RemoteStorage(addr)
    kv = RemoteDriver(addr)
    bus = RemoteBus(addr)

    meta.create_shard("snap1", "kbs")
    idx = meta.create_index("snap1", "vector", "m", {})
    seg = meta.create_segment(idx.id, Seq(1), 9)
    meta.commit_operation(ready_segments=[seg.id], deletions=[], touched_indexes=[])
    blob.put("seg/x", b"SEGBYTES")
    bus.publish("snap_st", "s", b"event")
    with kv as txn:
        txn.set("/snap/key", b"val")

    out = server.snapshot(str(tmp_path / "backup"))
    assert out["blobs"] == 1

    # mutate AFTER the snapshot: the backup must not see it
    blob.put("seg/y", b"NEWER")
    with kv as txn:
        txn.set("/snap/key2", b"val2")

    restored = SubstrateServer(str(tmp_path / "backup"))
    restored.start()
    addr2 = f"127.0.0.1:{restored.port}"
    meta2 = RemoteMetadataStore(addr2)
    blob2 = RemoteStorage(addr2)
    kv2 = RemoteDriver(addr2)
    bus2 = RemoteBus(addr2)
    assert meta2.get_shard("snap1").kbid == "kbs"
    assert [s.records for s in meta2.ready_segments(idx.id)] == [9]
    assert blob2.get("seg/x") == b"SEGBYTES"
    assert not blob2.exists("seg/y")
    assert [m.payload for m in bus2.scan("snap_st", after_seq=0)] == [b"event"]
    with kv2 as txn:
        assert txn.get("/snap/key") == b"val"
        assert txn.get("/snap/key2") is None

    for c in (meta, blob, kv, bus, meta2, blob2, kv2, bus2):
        c.close()
    server.stop()
    restored.stop()
