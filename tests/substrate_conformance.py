"""Substrate backend conformance battery — THE CONTRACT.

Any metadata / bus / KV / blob engine that wants to back this framework
(today: the sqlite/file implementations and their gRPC Remote* clients;
tomorrow: a PostgreSQL metadata adapter, a NATS bus adapter — the
reference's actual engines, nidx/src/metadata.rs:37-100 +
nidx/src/indexer.rs:121-149) must pass every check in this module.

Each check takes live backend instances and asserts the semantics the
services rely on:

- metadata: global seq monotonicity, shard/index/segment lifecycle,
  commit_operation atomicity, Seq-ordered deletions, merge-job leases
  (take / heartbeat / requeue-on-staleness), delete_at grace, ack floor
- bus: per-subject FIFO, at-least-once redelivery after ack_wait,
  independent consumers, repeatable scan cursors, batch publish
- kv: atomic write batches, prefix ops, cross-process CAS primitives
- blob: roundtrip, overwrite, prefix listing, streams

Used by tests/test_substrate_conformance.py against both the local and the
remote (gRPC) implementations; run it against any new adapter the same way.
"""

from __future__ import annotations

import time

from nucliadb_tpu.types import Seq


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------


def check_meta_seq_monotonic(meta) -> None:
    seqs = [int(meta.next_seq()) for _ in range(5)]
    assert seqs == sorted(seqs) and len(set(seqs)) == 5
    assert int(meta.last_seq()) == seqs[-1]


def check_meta_shard_lifecycle(meta) -> None:
    meta.create_shard("cf_s1", "cf_kb", {"prewarm_enabled": True})
    shard = meta.get_shard("cf_s1")
    assert shard is not None and shard.kbid == "cf_kb"
    assert shard.config.get("prewarm_enabled") is True
    assert "cf_s1" in [s.id for s in meta.list_shards("cf_kb")]
    meta.update_shard_config("cf_s1", {"prewarm_enabled": False})
    assert meta.get_shard("cf_s1").config.get("prewarm_enabled") is False
    meta.delete_shard("cf_s1")
    assert meta.get_shard("cf_s1") is None


def check_meta_commit_operation(meta) -> None:
    """The indexer's single-transaction commit: segments become ready,
    deletions recorded at their seq, indexes touched — atomically
    (parity: nidx/src/indexer.rs:355-374)."""
    meta.create_shard("cf_s2", "cf_kb2")
    idx = meta.create_index("cf_s2", "text", "text", {})
    seg = meta.create_segment(idx.id, Seq(100), 7, index_metadata={"k": "v"})
    assert meta.ready_segments(idx.id) == []  # invisible until commit
    before = meta.get_index(idx.id).updated_at
    time.sleep(0.01)
    meta.commit_operation(
        ready_segments=[seg.id],
        deletions=[(idx.id, Seq(101), ["dead/"])],
        touched_indexes=[idx.id],
    )
    ready = meta.ready_segments(idx.id)
    assert [s.id for s in ready] == [seg.id]
    assert ready[0].records == 7 and ready[0].index_metadata == {"k": "v"}
    assert meta.deletions_for_index(idx.id) == [("dead/", Seq(101))]
    assert meta.get_index(idx.id).updated_at > before


def check_meta_deletions_seq_order(meta) -> None:
    meta.create_shard("cf_s3", "cf_kb3")
    idx = meta.create_index("cf_s3", "text", "text", {})
    meta.commit_operation(ready_segments=[], deletions=[(idx.id, Seq(30), ["b/"])], touched_indexes=[])
    meta.commit_operation(ready_segments=[], deletions=[(idx.id, Seq(10), ["a/"])], touched_indexes=[])
    dels = meta.deletions_for_index(idx.id)
    assert [(k, int(s)) for k, s in dels] == [("a/", 10), ("b/", 30)]
    meta.purge_deletions_below(idx.id, Seq(20))
    assert [(k, int(s)) for k, s in meta.deletions_for_index(idx.id)] == [("b/", 30)]


def check_meta_segment_grace(meta) -> None:
    """Uncommitted segments are purgeable only after the grace window
    (parity: delete_at = now + grace until mark_ready)."""
    meta.create_shard("cf_s4", "cf_kb4")
    idx = meta.create_index("cf_s4", "vector", "m", {})
    seg = meta.create_segment(idx.id, Seq(1), 1)
    purgeable_now = {s.id for s in meta.purgeable_segments()}
    assert seg.id not in purgeable_now  # grace still running
    meta.commit_operation(ready_segments=[seg.id], deletions=[], touched_indexes=[])
    assert seg.id not in {s.id for s in meta.purgeable_segments()}
    meta.drop_segment(seg.id)
    assert meta.ready_segments(idx.id) == []


def check_meta_merge_job_lease(meta) -> None:
    """take() leases exclusively; a completed job disappears; finish/requeue
    bookkeeping works across the wire (parity: MergeJob::take SKIP LOCKED +
    1-min heartbeat requeue, nidx/src/scheduler.rs:216-243)."""
    meta.create_shard("cf_s5", "cf_kb5")
    idx = meta.create_index("cf_s5", "vector", "m", {})
    segs = [meta.create_segment(idx.id, Seq(i + 1), 10) for i in range(2)]
    meta.commit_operation(ready_segments=[s.id for s in segs], deletions=[], touched_indexes=[])
    job_id = meta.enqueue_merge(idx.id, Seq(2), [s.id for s in segs])
    assert job_id is not None
    # segments under a merge job are not re-enqueueable
    assert meta.enqueue_merge(idx.id, Seq(2), [segs[0].id]) is None
    job = meta.take_merge_job()
    assert job is not None and job.id == job_id
    assert meta.take_merge_job() is None  # leased: nobody else gets it
    meta.heartbeat_merge_job(job.id)
    got = meta.merge_job_segments(job.id)
    assert sorted(s.id for s in got) == sorted(s.id for s in segs)
    meta.finish_merge_job(job.id)
    assert meta.pending_merge_jobs() == 0


def check_meta_ack_floor(meta) -> None:
    for s in (1, 2, 3):
        meta.record_index_request(Seq(s))
    meta.ack_index_request(Seq(1))
    assert int(meta.ack_floor()) == 1  # 2 is the first unacked
    meta.ack_index_request(Seq(2))
    meta.ack_index_request(Seq(3))
    assert int(meta.ack_floor()) >= 3
    meta.prune_acked_requests(Seq(4))


# ---------------------------------------------------------------------------
# bus
# ---------------------------------------------------------------------------


def check_bus_fifo_and_ack(bus) -> None:
    for i in range(3):
        bus.publish("cf_st", f"sub.{i % 2}", f"m{i}".encode())
    got = []
    while True:
        msg = bus.next("cf_st", "c1")
        if msg is None:
            break
        got.append(msg.payload)
        bus.ack("cf_st", "c1", msg.seq)
    assert got == [b"m0", b"m1", b"m2"]  # publish order
    # an independent consumer sees everything again
    msg = bus.next("cf_st", "c2")
    assert msg is not None and msg.payload == b"m0"
    bus.ack("cf_st", "c2", msg.seq)


def check_bus_redelivery(bus) -> None:
    """Unacked messages redeliver once their lease lapses, with a bumped
    deliveries counter, and strict per-consumer ordering holds newer
    messages while the earliest is in flight (at-least-once; parity: NATS
    redelivery, indexer.rs:170-174)."""
    bus.publish("cf_rd", "s", b"flaky")
    bus.publish("cf_rd", "s", b"later")
    m1 = bus.next("cf_rd", "c")
    assert m1 is not None and m1.payload == b"flaky" and m1.deliveries == 1
    # strict ordering: the later message is NOT delivered past the lease
    assert bus.next("cf_rd", "c") is None
    bus.nak("cf_rd", "c", m1.seq, delay=0.05)  # release for redelivery
    time.sleep(0.1)
    m2 = bus.next("cf_rd", "c")
    assert m2 is not None and m2.seq == m1.seq and m2.deliveries == 2
    bus.in_progress("cf_rd", "c", m2.seq)  # keepalive extends the lease
    bus.ack("cf_rd", "c", m2.seq)
    m3 = bus.next("cf_rd", "c")
    assert m3 is not None and m3.payload == b"later"
    bus.ack("cf_rd", "c", m3.seq)
    assert bus.next("cf_rd", "c") is None


def check_bus_scan_cursor(bus) -> None:
    seqs = [bus.publish("cf_sc", f"k.{i}", str(i).encode()) for i in range(4)]
    page1 = list(bus.scan("cf_sc", after_seq=0, limit=2))
    assert [m.payload for m in page1] == [b"0", b"1"]
    page2 = list(bus.scan("cf_sc", after_seq=page1[-1].seq, limit=10))
    assert [m.payload for m in page2] == [b"2", b"3"]
    # repeatable: same cursor, same answer
    assert [m.seq for m in bus.scan("cf_sc", after_seq=0, limit=2)] == [m.seq for m in page1]
    assert bus.last_seq("cf_sc") == seqs[-1]
    assert list(bus.scan("cf_sc", subject_prefix="k.1"))[0].payload == b"1"


def check_bus_publish_many(bus) -> None:
    last = bus.publish_many("cf_pm", [("a", b"x"), ("a", b"y"), ("b", b"z")])
    msgs = list(bus.scan("cf_pm", after_seq=0))
    assert [m.payload for m in msgs] == [b"x", b"y", b"z"]
    assert msgs[-1].seq == last == bus.last_seq("cf_pm")


def check_bus_pending_and_floor(bus) -> None:
    for i in range(3):
        bus.publish("cf_pf", "s", str(i).encode())
    m = bus.next("cf_pf", "c")
    bus.ack("cf_pf", "c", m.seq)
    assert bus.pending("cf_pf", "c") == 2
    assert bus.ack_floor("cf_pf", "c") == m.seq


# ---------------------------------------------------------------------------
# kv
# ---------------------------------------------------------------------------


def check_kv_atomic_batch(kv) -> None:
    with kv as txn:
        txn.set("/cf/a", b"1")
        txn.set("/cf/b", b"2")
        txn.set("/cf/nested/c", b"3")
    with kv as txn:
        assert txn.get("/cf/a") == b"1"
        assert txn.batch_get(["/cf/a", "/cf/missing", "/cf/b"]) == [b"1", None, b"2"]
        assert sorted(txn.keys("/cf/")) == ["/cf/a", "/cf/b", "/cf/nested/c"]
        assert txn.count("/cf/") == 3
    with kv as txn:
        txn.delete("/cf/a")
        txn.delete_by_prefix("/cf/nested/")
    with kv as txn:
        assert txn.get("/cf/a") is None
        assert list(txn.keys("/cf/")) == ["/cf/b"]


def check_kv_read_your_writes(kv) -> None:
    with kv as txn:
        txn.set("/cf/ryw", b"v1")
        assert txn.get("/cf/ryw") == b"v1"  # visible inside the txn
        txn.delete("/cf/ryw")
        assert txn.get("/cf/ryw") is None
        txn.set("/cf/ryw", b"v2")
    with kv as txn:
        assert txn.get("/cf/ryw") == b"v2"


def check_kv_cas_primitives(kv) -> None:
    """compare_and_swap/delete_if are the cross-process lease primitives
    (the documented Driver contract)."""
    assert kv.compare_and_swap("/cf/lock", None, b"me") is True
    assert kv.compare_and_swap("/cf/lock", None, b"thief") is False
    assert kv.compare_and_swap("/cf/lock", b"me", b"me2") is True
    assert kv.delete_if("/cf/lock", b"wrong") is False
    assert kv.delete_if("/cf/lock", b"me2") is True


# ---------------------------------------------------------------------------
# blob
# ---------------------------------------------------------------------------


def check_blob_roundtrip(blob) -> None:
    blob.put("cf/seg/a.bin", b"\x00\x01payload")
    assert blob.exists("cf/seg/a.bin")
    assert blob.get("cf/seg/a.bin") == b"\x00\x01payload"
    blob.put("cf/seg/a.bin", b"overwritten")  # last write wins
    assert blob.get("cf/seg/a.bin") == b"overwritten"
    blob.put("cf/seg/b.bin", b"bb")
    blob.put("cf/other", b"x")
    assert sorted(blob.list("cf/seg/")) == ["cf/seg/a.bin", "cf/seg/b.bin"]
    blob.delete("cf/seg/a.bin")
    assert not blob.exists("cf/seg/a.bin")


def check_meta_batched_indexing_ops(meta) -> None:
    """r5 composites: open_index_request fuses next_seq + record (one
    txn/RPC — under HA every metadata RPC ships synchronously, so RPC
    count IS the replication cost) and create_segments inserts all of an
    operation's segments in one transaction with final sizes."""
    seq = meta.open_index_request()
    assert int(meta.open_index_request()) == int(seq) + 1
    # the opened request is UNACKED: the ack floor must sit below it
    floor = meta.ack_floor()
    assert floor is None or int(floor) < int(seq)
    meta.ack_index_request(seq)
    meta.ack_index_request(Seq(int(seq) + 1))

    meta.create_shard("cf_s9", "cf_kb9")
    i1 = meta.create_index("cf_s9", "text", "text", {})
    i2 = meta.create_index("cf_s9", "vector", "m", {})
    rows = meta.create_segments([
        {"index_id": i1.id, "seq": Seq(500), "records": 3,
         "size_bytes": 111, "tags": ["hidden"], "index_metadata": {"a": 1}},
        {"index_id": i2.id, "seq": Seq(500), "records": 5, "size_bytes": 222},
    ])
    assert len(rows) == 2 and rows[0].id != rows[1].id
    assert meta.ready_segments(i1.id) == []  # invisible until commit
    meta.commit_operation(
        ready_segments=[r.id for r in rows], deletions=[], touched_indexes=[]
    )
    r1 = meta.ready_segments(i1.id)
    r2 = meta.ready_segments(i2.id)
    assert [s.records for s in r1] == [3] and r1[0].size_bytes == 111
    assert r1[0].tags == ["hidden"] and r1[0].index_metadata == {"a": 1}
    assert [s.size_bytes for s in r2] == [222]
    assert meta.create_segments([]) == []


ALL_CHECKS = [
    check_meta_seq_monotonic,
    check_meta_shard_lifecycle,
    check_meta_commit_operation,
    check_meta_deletions_seq_order,
    check_meta_segment_grace,
    check_meta_merge_job_lease,
    check_meta_ack_floor,
    check_meta_batched_indexing_ops,
    check_bus_fifo_and_ack,
    check_bus_redelivery,
    check_bus_scan_cursor,
    check_bus_publish_many,
    check_bus_pending_and_floor,
    check_kv_atomic_batch,
    check_kv_read_your_writes,
    check_kv_cas_primitives,
    check_blob_roundtrip,
]
