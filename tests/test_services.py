import numpy as np
import pytest

from nucliadb_tpu.index.vector import VectorConfig
from nucliadb_tpu.metadata import MetadataStore
from nucliadb_tpu.models.internal import (
    IndexParagraph,
    ResourceDoc,
    TextInformation,
    VectorSentence,
)
from nucliadb_tpu.services import EmbeddedNode
from nucliadb_tpu.services.scheduler import (
    plan_log_merges,
    plan_vector_merges,
)
from nucliadb_tpu.shard import ShardSearchRequest
from nucliadb_tpu.storage import MemoryStorage
from nucliadb_tpu.storage.storage import pack_segment, unpack_segment
from nucliadb_tpu.types import Seq

DIM = 16


def embed(text):
    r = np.random.default_rng(abs(hash(text)) % (2**31))
    v = r.standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def make_resource(rid, text):
    rd = ResourceDoc(resource_id=rid, created=1000, modified=1000)
    rd.texts["t/t1"] = TextInformation(text=text)
    para = IndexParagraph(start=0, end=len(text))
    para.vectorsets_sentences["m1"] = {
        f"{rid}/t/t1/0/0-{len(text)}": VectorSentence(vector=embed(text))
    }
    rd.paragraphs["t/t1"] = {f"{rid}/t/t1/0-{len(text)}": para}
    return rd


@pytest.fixture
def node(tmp_path):
    return EmbeddedNode(data_dir=str(tmp_path / "node"), storage=MemoryStorage())


def test_end_to_end_index_and_search(node):
    shard_id = node.create_shard("kb1", {"m1": VectorConfig(dimension=DIM)})
    node.index(shard_id, make_resource("r1", "the quick brown fox"))
    node.index(shard_id, make_resource("r2", "lazy dogs sleep all day"))
    node.wait_for_sync()

    resp = node.search(
        shard_id,
        ShardSearchRequest(body="quick fox", vector=embed("the quick brown fox"), top_k=5),
    )
    assert resp.paragraph.hits[0].rid == "r1"
    assert resp.vector[0].key.startswith("r1/")


def test_reindex_replaces_old_version(node):
    shard_id = node.create_shard("kb1", {"m1": VectorConfig(dimension=DIM)})
    node.index(shard_id, make_resource("r1", "original content about cats"))
    # reindex same resource: the index message builder emits deletions for
    # the resource's previous keys
    updated = make_resource("r1", "updated content about dogs")
    updated.texts_to_delete = []  # full resource replace -> rid/ prefix delete
    updated.vectors_to_delete_in_all_vectorsets = ["r1/"]
    updated.paragraphs_to_delete = ["r1/"]
    node.index(shard_id, updated)
    node.wait_for_sync()

    resp = node.search(shard_id, ShardSearchRequest(body="cats", top_k=5))
    assert resp.paragraph.hits == []
    resp2 = node.search(shard_id, ShardSearchRequest(body="dogs", top_k=5))
    assert [h.rid for h in resp2.hits] if hasattr(resp2, "hits") else True
    assert resp2.paragraph.hits and resp2.paragraph.hits[0].rid == "r1"


def test_delete_resource(node):
    shard_id = node.create_shard("kb1", {"m1": VectorConfig(dimension=DIM)})
    node.index(shard_id, make_resource("r1", "findable content"))
    node.delete_resource(shard_id, "r1")
    node.wait_for_sync()
    resp = node.search(shard_id, ShardSearchRequest(body="findable", top_k=5))
    assert resp.paragraph.hits == []


def test_merge_pipeline(node):
    shard_id = node.create_shard("kb1", {"m1": VectorConfig(dimension=DIM)})
    for i in range(6):
        node.index(shard_id, make_resource(f"r{i}", f"document number {i} quick"))
    node.delete_resource(shard_id, "r3")

    # before merge: 6 segments per index
    text_index = [i for i in node.metadata.get_indexes(shard_id) if i.kind == "text"][0]
    assert len(node.metadata.ready_segments(text_index.id)) == 6

    stats = node.tick_background()
    assert stats["jobs_enqueued"] > 0 and stats["merged"] > 0
    segs = node.metadata.ready_segments(text_index.id)
    assert len(segs) == 1
    assert segs[0].records == 5  # r3 dropped during merge

    node.wait_for_sync()
    resp = node.search(shard_id, ShardSearchRequest(body="quick", top_k=10))
    assert len(resp.paragraph.hits) == 5
    assert all(h.rid != "r3" for h in resp.paragraph.hits)


def test_merge_respects_ack_floor(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "n2"), storage=MemoryStorage())
    shard_id = node.create_shard("kb1", {})
    for i in range(5):
        node.index(shard_id, make_resource(f"r{i}", f"doc {i}"))
    # simulate an unacked in-flight operation below which merges must not plan
    seq = node.metadata.next_seq()
    node.metadata.record_index_request(seq)
    for i in range(5, 10):
        node.index(shard_id, make_resource(f"r{i}", f"doc {i}"))
    floor = node.metadata.ack_floor()
    assert int(floor) == int(seq) - 1
    node.scheduler.schedule_merges()
    # only the first 5 segments (below the floor) may be in a job
    text_index = [i for i in node.metadata.get_indexes(shard_id) if i.kind == "text"][0]
    in_jobs = [
        s for s in node.metadata.ready_segments(text_index.id) if s.merge_job_id
    ]
    assert all(s.seq <= floor for s in in_jobs)
    assert len(in_jobs) >= 4


def test_segment_pack_roundtrip(tmp_path):
    seg_dir = tmp_path / "seg"
    seg_dir.mkdir()
    (seg_dir / "a.bin").write_bytes(b"hello")
    (seg_dir / "meta.json").write_text("{}")
    blob = pack_segment(str(seg_dir))
    out = tmp_path / "out"
    unpack_segment(blob, str(out))
    assert (out / "a.bin").read_bytes() == b"hello"


def test_plan_log_merges():
    from nucliadb_tpu.metadata import SegmentRow

    def seg(i, records):
        return SegmentRow(i, 1, Seq(i), records, 0, [], {}, True, None, None)

    # 4 tiny segments merge; 1 big one doesn't join them
    plans = plan_log_merges([seg(1, 100), seg(2, 200), seg(3, 50), seg(4, 80), seg(5, 9_000_000)])
    assert len(plans) == 1 and len(plans[0]) == 4
    assert plan_log_merges([seg(1, 100), seg(2, 100)]) == []


def test_plan_vector_merges():
    from nucliadb_tpu.metadata import SegmentRow

    def seg(i, records):
        return SegmentRow(i, 1, Seq(i), records, 0, [], {}, True, None, None)

    plans = plan_vector_merges([seg(i, 1000) for i in range(6)])
    assert len(plans) == 1 and len(plans[0]) == 6
    # big segments are left alone
    assert plan_vector_merges([seg(i, 150_000) for i in range(6)]) == []


def test_metadata_merge_job_lease(tmp_path):
    m = MetadataStore(str(tmp_path / "m.db"))
    m.create_shard("s1", "kb")
    idx = m.create_index("s1", "text", "text")
    rows = [m.create_segment(idx.id, Seq(i), 10) for i in range(4)]
    m.commit_operation(
        ready_segments=[r.id for r in rows], deletions=[], touched_indexes=[idx.id]
    )
    job_id = m.enqueue_merge(idx.id, Seq(3), [r.id for r in rows])
    assert job_id is not None
    # double-enqueue over same segments is refused
    assert m.enqueue_merge(idx.id, Seq(3), [rows[0].id]) is None
    job = m.take_merge_job()
    assert job is not None and job.id == job_id
    # job is leased: not retaken while heartbeat fresh
    assert m.take_merge_job() is None
    m.finish_merge_job(job.id)
    assert m.pending_merge_jobs() == 0


def test_failed_index_op_does_not_wedge_ack_floor(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "w"), storage=MemoryStorage())
    shard_id = node.create_shard("kb1", {})
    with pytest.raises(KeyError):
        node.indexer.index_resource("no-such-shard", make_resource("rX", "x"))
    node.index(shard_id, make_resource("r1", "alpha"))
    # the failed op's seq must not pin the floor below the successful op
    assert int(node.metadata.ack_floor()) == int(node.metadata.last_seq())


def test_failing_merge_job_respects_retry_cap(tmp_path, monkeypatch):
    from nucliadb_tpu.metadata import store as mstore

    node = EmbeddedNode(data_dir=str(tmp_path / "m"), storage=MemoryStorage())
    shard_id = node.create_shard("kb1", {})
    for i in range(4):
        node.index(shard_id, make_resource(f"r{i}", f"doc {i}"))
    node.scheduler.schedule_merges()
    assert node.metadata.pending_merge_jobs() > 0

    def boom(*a, **k):
        raise RuntimeError("corrupted segment")

    monkeypatch.setattr(node.worker, "_merge", boom)
    monkeypatch.setattr(mstore, "MERGE_JOB_STALE_S", 0.0)
    # each run_one leases the SAME job with retries accumulating; after the
    # cap every job POISONS (segments stay pinned so the planner can't
    # re-plan the identical merge; a long cooldown allows eventual retry)
    n_jobs = node.metadata.pending_merge_jobs()
    for _ in range(n_jobs * (mstore.MERGE_JOB_MAX_RETRIES + 2)):
        node.worker.run_one()
    assert node.metadata.pending_merge_jobs() == 0
    # poisoned segments stay pinned: the planner must not re-enqueue the
    # same merge (the old delete-on-poison released them into a hot loop)
    assert node.scheduler.schedule_merges() == 0
    assert node.metadata.pending_merge_jobs() == 0


def test_bus_strict_ordering_on_crash():
    from nucliadb_tpu.bus import EmbeddedBus

    bus = EmbeddedBus(ack_wait=0.05)
    bus.publish("s", "x", b"first")
    bus.publish("s", "x", b"second")
    m1 = bus.next("s", "c")
    assert m1.payload == b"first"
    # consumer "crashes": lease outstanding -> nothing newer is delivered
    assert bus.next("s", "c") is None
    import time as _time

    _time.sleep(0.06)  # lease expires -> the SAME message redelivers first
    m1b = bus.next("s", "c")
    assert m1b.payload == b"first" and m1b.deliveries == 2
    bus.ack("s", "c", m1b.seq)
    assert bus.next("s", "c").payload == b"second"


def test_deleted_shard_evicted_from_searcher(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "e"), storage=MemoryStorage())
    shard_id = node.create_shard("kb1", {})
    node.index(shard_id, make_resource("r1", "alpha"))
    node.wait_for_sync()
    from nucliadb_tpu.shard import ShardSearchRequest

    assert node.search(shard_id, ShardSearchRequest(body="alpha")).paragraph.hits
    node.delete_shard(shard_id)
    node.wait_for_sync()
    assert shard_id not in node.searcher._shards


def test_subject_scoped_pending():
    from nucliadb_tpu.bus import EmbeddedBus

    bus = EmbeddedBus()
    bus.publish("s", "ingest.0", b"a")
    bus.publish("s", "ingest.1", b"b")
    bus.publish("s", "ingest.0", b"c")
    m = bus.next("s", "c0", subject_prefix="ingest.0")
    bus.ack("s", "c0", m.seq)
    assert bus.pending("s", "c0", subject_prefix="ingest.0") == 1
    assert bus.ack_floor("s", "c0", subject_prefix="ingest.0") >= m.seq


def test_searcher_lru_and_single_flight(tmp_path):
    """Open shard searchers are LRU-bounded; concurrent first loads of the
    same shard run once (parity: nidx IndexCache)."""
    import threading
    from unittest import mock

    from nucliadb_tpu.metadata import MetadataStore
    from nucliadb_tpu.services.searcher import SyncedSearcher
    from nucliadb_tpu.storage import MemoryStorage

    metadata = MetadataStore(str(tmp_path / "meta.db"))
    storage = MemoryStorage()
    for i in range(4):
        metadata.create_shard(f"s{i}", "kb")
        metadata.create_index(f"s{i}", "text", "text", {})
    searcher = SyncedSearcher(
        metadata, storage, str(tmp_path / "cache"), max_open_shards=2
    )

    searcher.shard("s0")
    searcher.shard("s1")
    searcher.shard("s2")  # evicts s0
    assert list(searcher._shards) == ["s1", "s2"]
    searcher.shard("s1")  # refresh recency
    searcher.shard("s3")  # evicts s2
    assert list(searcher._shards) == ["s1", "s3"]

    # single flight: 8 threads racing the same cold shard -> one load
    searcher._shards.clear()
    calls = []
    orig = searcher._reload_shard

    def counting(shard_id):
        calls.append(shard_id)
        return orig(shard_id)

    with mock.patch.object(searcher, "_reload_shard", side_effect=counting):
        threads = [
            threading.Thread(target=searcher.shard, args=("s0",)) for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert calls == ["s0"]


def test_control_socket(tmp_path):
    from nucliadb_tpu.component.control import ControlSocket, probe

    ready = {"ok": False}
    ctl = ControlSocket(str(tmp_path / "ctl.sock"), ready_check=lambda: ready["ok"])
    try:
        assert probe(str(tmp_path / "ctl.sock"), "alive")
        assert not probe(str(tmp_path / "ctl.sock"), "ready")
        ready["ok"] = True
        assert probe(str(tmp_path / "ctl.sock"), "ready")
    finally:
        ctl.close()


def test_stale_index_request_does_not_wedge_ack_floor(tmp_path):
    """A crash between record_index_request and the ack must not pin the
    ack floor forever (merges + back-pressure would wedge permanently)."""
    from nucliadb_tpu.metadata import MetadataStore
    from nucliadb_tpu.types import Seq

    m = MetadataStore(str(tmp_path / "m.db"))
    m.record_index_request(Seq(1))
    m.ack_index_request(Seq(1))
    m.record_index_request(Seq(2))  # crashed op: never acked
    m.record_index_request(Seq(3))
    m.ack_index_request(Seq(3))
    assert int(m.ack_floor()) == 1  # wedged on seq 2
    assert m.expire_stale_requests(ttl_s=0.0) == 1
    assert int(m.ack_floor()) == 3


def test_delete_shard_retires_segments(tmp_path):
    from nucliadb_tpu.metadata import MetadataStore
    from nucliadb_tpu.types import Seq

    m = MetadataStore(str(tmp_path / "m.db"))
    m.create_shard("s1", "kb")
    idx = m.create_index("s1", "text", "text", {})
    row = m.create_segment(idx.id, Seq(1), records=10)
    m.commit_operation(ready_segments=[row.id], deletions=[], touched_indexes=[idx.id])
    assert not any(s.id == row.id for s in m.purgeable_segments())
    m.delete_shard("s1")
    assert any(s.id == row.id for s in m.purgeable_segments())


def test_create_redelivery_is_idempotent(tmp_path):
    """A redelivered create (same rid+slug) overwrites instead of raising
    'slug exists' forever (at-least-once bus)."""
    from nucliadb_tpu.common.kb import KnowledgeBoxManager
    from nucliadb_tpu.ingest.processor import Processor
    from nucliadb_tpu.maindb import Driver
    from nucliadb_tpu.models.api import CreateResourcePayload, KnowledgeBoxConfig

    node = EmbeddedNode(data_dir=str(tmp_path / "node"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv.db"))
    kbs = KnowledgeBoxManager(driver, node)
    processor = Processor(driver, node, kbs)
    kbid = kbs.create(KnowledgeBoxConfig(slug="idem"))
    payload = CreateResourcePayload(slug="res1", title="A")
    rid, _ = processor.create_resource(kbid, payload, rid="fixedrid")
    # redelivery with the SAME rid: succeeds
    rid2, _ = processor.create_resource(kbid, payload, rid="fixedrid")
    assert rid2 == rid
    # a DIFFERENT rid claiming the slug still conflicts
    import pytest as _pytest

    with _pytest.raises(KeyError):
        processor.create_resource(kbid, payload, rid="otherrid")


def test_commit_stamps_rid_and_partition_subjects(tmp_path):
    from nucliadb_tpu.bus import EmbeddedBus
    from nucliadb_tpu.ingest.consumer import BrokerMessage, TransactionUtility

    bus = EmbeddedBus(str(tmp_path / "bus.db"))
    tx = TransactionUtility(bus, partitions=12)
    msg = BrokerMessage(kbid="kb1", rid=None, op="create", payload={"title": "x"})
    tx.commit(msg)
    assert msg.rid  # stamped at publish time for idempotent redelivery
    # subjects carry a trailing delimiter so 'ingest.1.' never GLOB-matches
    # partition 10's messages
    msgs = bus.scan("ndb_ingest", subject_prefix="ingest.")
    assert all(m.subject.endswith(".") for m in msgs)


def test_prometheus_service_metrics(tmp_path):
    """Per-kind indexing + merge counters and the sync-delay gauge reach the
    prometheus registry (parity: nidx/src/metrics.rs families)."""
    import numpy as np

    from nucliadb_tpu.index.vector import VectorConfig
    from nucliadb_tpu.models.internal import IndexParagraph, ResourceDoc, TextInformation, VectorSentence
    from nucliadb_tpu.services import EmbeddedNode
    from nucliadb_tpu.storage import MemoryStorage
    from nucliadb_tpu.telemetry.metrics import render_prometheus

    node = EmbeddedNode(data_dir=str(tmp_path / "n"), storage=MemoryStorage())
    shard = node.create_shard("kbm", {"m1": VectorConfig(dimension=8)})
    for i in range(5):
        rd = ResourceDoc(resource_id=f"r{i}", created=1, modified=1)
        text = f"metrics doc {i}"
        rd.texts["t/t"] = TextInformation(text=text)
        p = IndexParagraph(start=0, end=len(text))
        v = np.zeros(8, np.float32); v[i % 8] = 1.0
        p.vectorsets_sentences["m1"] = {
            f"r{i}/t/t/0/0-{len(text)}": VectorSentence(vector=v)
        }
        rd.paragraphs["t/t"] = {f"r{i}/t/t/0-{len(text)}": p}
        node.index(shard, rd)
    node.wait_for_sync()
    node.tick_background()  # schedules + runs merges

    body = render_prometheus().decode()
    assert 'ndbtpu_indexing_total{kind="text",status="ok"}' in body
    assert 'ndbtpu_indexing_total{kind="vector",status="ok"}' in body
    assert "ndbtpu_sync_delay_seconds" in body
    # 5 single-record segments per index: the log/vector merge policies
    # schedule compactions, so merge counters appear
    assert 'ndbtpu_merge_total{' in body


def test_concurrent_search_during_ingest_and_merge(tmp_path):
    """Searches racing ingest + background merges never crash or see torn
    state: every response is well-formed and hits only live resources
    (the arena swap on searcher reload must be atomic for readers)."""
    import threading

    import numpy as np

    from nucliadb_tpu.index.vector import VectorConfig
    from nucliadb_tpu.models.internal import (
        IndexParagraph, ResourceDoc, TextInformation, VectorSentence,
    )
    from nucliadb_tpu.services import EmbeddedNode
    from nucliadb_tpu.shard import ShardSearchRequest
    from nucliadb_tpu.storage import MemoryStorage

    dim = 8
    node = EmbeddedNode(data_dir=str(tmp_path / "n"), storage=MemoryStorage())
    shard = node.create_shard("kbc", {"m1": VectorConfig(dimension=dim)})

    def doc(i):
        rd = ResourceDoc(resource_id=f"r{i}", created=1, modified=1)
        text = f"race doc number {i} token{i % 3}"
        rd.texts["t/t"] = TextInformation(text=text)
        p = IndexParagraph(start=0, end=len(text))
        v = np.zeros(dim, np.float32); v[i % dim] = 1.0
        p.vectorsets_sentences["m1"] = {f"r{i}/t/t/0/0-{len(text)}": VectorSentence(vector=v)}
        rd.paragraphs["t/t"] = {f"r{i}/t/t/0-{len(text)}": p}
        return rd

    node.index(shard, doc(0))
    node.wait_for_sync()
    stop = threading.Event()
    errors: list[BaseException] = []

    def writer():
        i = 1
        try:
            while not stop.is_set() and i < 40:
                node.index(shard, doc(i))
                if i % 5 == 0:
                    node.tick_background()  # merges + searcher sync
                node.wait_for_sync()
                i += 1
        except BaseException as e:  # pragma: no cover - failure reporting
            errors.append(e)

    def reader():
        q = np.zeros((1, dim), np.float32); q[0, 0] = 1.0
        try:
            while not stop.is_set():
                resp = node.search(
                    shard, ShardSearchRequest(body="race", vector=q[0], top_k=5)
                )
                # well-formed: every hit decodes and scores are finite
                for h in resp.vector:
                    assert h.key.startswith("r")
                if resp.paragraph is not None:
                    for h in resp.paragraph.hits:
                        assert h.rid.startswith("r")
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    w = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(3)]
    w.start()
    [r.start() for r in readers]
    w.join(timeout=120)
    stop.set()
    [r.join(timeout=10) for r in readers]
    assert not errors, errors
    # final state is complete
    node.wait_for_sync()
    resp = node.search(shard, ShardSearchRequest(body="race", top_k=50))
    assert resp.paragraph.total >= 40


def test_merge_job_for_deleted_shard_is_dropped_cleanly(tmp_path):
    """A merge job whose index disappeared (rollover retired the shard)
    completes as a no-op instead of burning retries (found by the soak
    test: rollover left jobs that raised KeyError on every lease)."""
    node = EmbeddedNode(data_dir=str(tmp_path / "m"), storage=MemoryStorage())
    shard_id = node.create_shard("kb1", {})
    for i in range(4):
        node.index(shard_id, make_resource(f"r{i}", f"doc {i}"))
    node.scheduler.schedule_merges()
    assert node.metadata.pending_merge_jobs() > 0
    node.delete_shard(shard_id)
    # every orphaned job drains in one pass, no retries, no exceptions
    for _ in range(node.metadata.pending_merge_jobs() + 1):
        node.worker.run_one()
    assert node.metadata.pending_merge_jobs() == 0


def test_delete_vectorset_drops_from_open_searcher(node):
    """Regression: a deleted vector index leaves no live row to bump
    updated_at — sync must diff the live index-id set against what the open
    searcher loaded, or it serves the dropped vectorset forever."""
    shard_id = node.create_shard("kb1", {"m1": VectorConfig(dimension=DIM)})
    node.index(shard_id, make_resource("r1", "the quick brown fox"))
    node.wait_for_sync()
    req = ShardSearchRequest(
        body="", vector=embed("the quick brown fox"), paragraph=False, top_k=5
    )
    assert node.search(shard_id, req).vector  # searcher open + serving m1
    node.delete_vectorset(shard_id, "m1")
    node.wait_for_sync()
    assert node.search(shard_id, req).vector == []
