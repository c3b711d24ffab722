import numpy as np
import pytest

from nucliadb_tpu.bus import EmbeddedBus
from nucliadb_tpu.common.kb import KnowledgeBoxManager
from nucliadb_tpu.ingest.consumer import (
    BrokerMessage,
    IngestConsumer,
    NOTIFY_STREAM,
    TransactionUtility,
)
from nucliadb_tpu.ingest.processor import Processor
from nucliadb_tpu.maindb import Driver
from nucliadb_tpu.models.api import (
    CreateResourcePayload,
    FindRequest,
    KnowledgeBoxConfig,
    SearchFeature,
    TextFieldPayload,
    VectorSetSpec,
)
from nucliadb_tpu.search import SearchService
from nucliadb_tpu.search.predict import HashingEncoder, LocalPredictEngine
from nucliadb_tpu.services import EmbeddedNode
from nucliadb_tpu.storage import MemoryStorage


@pytest.fixture
def stack(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "n"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv.db"))
    kbs = KnowledgeBoxManager(driver, node)
    processor = Processor(driver, node, kbs)
    return node, driver, kbs, processor


def test_component_mode_ingest_via_bus(stack, tmp_path):
    node, driver, kbs, processor = stack
    kbid = kbs.create(KnowledgeBoxConfig(slug="comp"))
    bus = EmbeddedBus(str(tmp_path / "bus.db"))
    txn_util = TransactionUtility(bus)
    consumer = IngestConsumer(bus, processor)

    # writer side: commit broker messages
    p = CreateResourcePayload(title="Doc", texts={"t": TextFieldPayload(body="hello bus world")})
    txn_util.commit(BrokerMessage(kbid=kbid, rid="r1", op="create", payload=p.model_dump()))
    txn_util.commit(
        BrokerMessage(
            kbid=kbid, rid="r1", op="update",
            payload={"title": "Doc v2"},
        )
    )
    assert consumer.drain() == 2

    assert processor.get_payload(kbid, "r1").title == "Doc v2"
    node.wait_for_sync()
    search = SearchService(node, kbs, processor)
    res = search.find(kbid, FindRequest(query="bus", features=[SearchFeature.KEYWORD]))
    assert "r1" in res.resources

    # notifications published per op
    notes = []
    while True:
        m = bus.next(NOTIFY_STREAM, "watcher")
        if m is None:
            break
        notes.append(m)
        bus.ack(NOTIFY_STREAM, "watcher", m.seq)
    assert len(notes) == 2

    # delete via bus
    txn_util.commit(BrokerMessage(kbid=kbid, rid="r1", op="delete"))
    consumer.drain()
    assert processor.get_payload(kbid, "r1") is None


def test_hashing_encoder_properties():
    enc = HashingEncoder(dimension=64)
    a = enc("the quick brown fox")
    b = enc("the quick brown fox")
    c = enc("stock markets rally")
    np.testing.assert_array_equal(a, b)  # deterministic
    assert abs(np.linalg.norm(a) - 1.0) < 1e-5
    assert a @ c < a @ b  # unrelated text scores lower


def test_predict_engine_in_find(stack):
    node, driver, kbs, processor = stack
    kbid = kbs.create(
        KnowledgeBoxConfig(
            slug="pred", vectorsets={"hash": VectorSetSpec(dimension=64)}
        )
    )
    enc = HashingEncoder(dimension=64)
    # index resources with hashing-encoder embeddings (the processor path a
    # local predict deployment would use)
    for rid, text in [("r1", "the quick brown fox"), ("r2", "markets rallied today")]:
        body = text
        payload = CreateResourcePayload(
            title=rid,
            texts={"t": TextFieldPayload(body=body)},
            embeddings={
                "hash": {
                    "t": [
                        {
                            "start": 0,
                            "end": len(body),
                            "vector": enc(body).tolist(),
                        }
                    ]
                }
            },
        )
        processor.create_resource(kbid, payload, rid=rid)
    node.wait_for_sync()

    predict = LocalPredictEngine(encoder=enc)
    search = SearchService(node, kbs, processor, predict=predict)
    # no explicit vector: the predict engine embeds the query
    res = search.find(
        kbid, FindRequest(query="quick fox", features=[SearchFeature.SEMANTIC])
    )
    assert res.best_matches[0].startswith("r1/")  # top hit embeds closest
    # a min_score cuts the unrelated resource
    res2 = search.find(
        kbid,
        FindRequest(
            query="quick fox",
            features=[SearchFeature.SEMANTIC],
            min_score_semantic=0.35,
        ),
    )
    assert list(res2.resources) == ["r1"]

    from nucliadb_tpu.models.api import AskRequest

    ask = search.ask(kbid, AskRequest(query="quick fox"))
    assert ask.status == "success"
    assert "fox" in ask.answer


def test_trace_propagation_through_bus(stack, tmp_path):
    """Writer-side trace context rides BrokerMessage headers; the consumer's
    ingest span joins the same trace (parity: NATS-header trace propagation,
    nidx telemetry.rs + indexer.rs:180-183)."""
    from nucliadb_tpu.telemetry import tracing

    node, driver, kbs, processor = stack
    kbid = kbs.create(KnowledgeBoxConfig(slug="tracekb"))
    bus = EmbeddedBus(str(tmp_path / "tbus.db"))
    txn_util = TransactionUtility(bus)
    consumer = IngestConsumer(bus, processor)

    tracing.setup_tracing("test")
    try:
        p = CreateResourcePayload(title="Traced", texts={"t": TextFieldPayload(body="x")})
        with tracing.span("writer.commit") as root:
            txn_util.commit(
                BrokerMessage(kbid=kbid, rid="rt", op="create", payload=p.model_dump())
            )
        assert consumer.drain() == 1

        spans = tracing.recent_spans()
        by_name = {s.name: s for s in spans}
        assert "writer.commit" in by_name and "ingest.process" in by_name
        ingest = by_name["ingest.process"]
        writer = by_name["writer.commit"]
        # same trace, parented on the writer's span, attrs recorded
        assert ingest.trace_id == writer.trace_id
        assert ingest.parent_id == writer.span_id
        assert ingest.attributes["kbid"] == kbid
        assert ingest.duration_ms >= 0
        # the indexer span joined the same trace too (nested under process)
        idx = by_name.get("indexer.index_resource")
        assert idx is not None and idx.trace_id == writer.trace_id

        # headers survive pack/unpack round trip with a W3C traceparent
        ctx = tracing.extract_context(
            {"traceparent": f"00-{writer.trace_id}-{writer.span_id}-01"}
        )
        assert ctx.trace_id == writer.trace_id
    finally:
        tracing.teardown_tracing()


def test_tracing_noop_when_unconfigured():
    from nucliadb_tpu.telemetry import tracing

    assert tracing._tracer is None or True  # state may be torn down already
    tracing.teardown_tracing()
    with tracing.span("anything", key="v") as s:
        assert s is None
    assert tracing.inject_context({}) == {}
    assert tracing.extract_context({}) is None


def test_create_resource_redelivery_idempotent(stack):
    """At-least-once bus: a redelivered create with the same rid must reuse
    the original shard/created time and not double-count the resource."""
    node, driver, kbs, processor = stack
    kbid = kbs.create(KnowledgeBoxConfig(slug="redeliver"))
    p = CreateResourcePayload(
        title="Doc", slug="s1",
        texts={"t": TextFieldPayload(body="redelivered create")},
    )
    rid, _ = processor.create_resource(kbid, p, created=123.0)
    shards1 = kbs.get_shards(kbid)
    count1 = sum(shards1.counts.values())
    meta1 = processor.get_meta(kbid, rid)
    # redelivery: same rid, same payload
    rid2, _ = processor.create_resource(kbid, p, rid=rid)
    assert rid2 == rid
    shards2 = kbs.get_shards(kbid)
    assert sum(shards2.counts.values()) == count1  # not inflated
    meta2 = processor.get_meta(kbid, rid)
    assert meta2.shard == meta1.shard
    assert meta2.created == 123.0  # original creation time preserved


def test_poison_broker_message_does_not_stop_consumer(stack, tmp_path):
    """Regression: a malformed BrokerMessage raised out of work_once, which
    component mode turned into os._exit(1) — one poison message crash-looped
    the whole multi-component process. Now it naks (bounded redeliveries,
    then the bus poison-skips) and consumption continues."""
    from nucliadb_tpu.bus.stream import MAX_DELIVERIES

    node, driver, kbs, processor = stack
    kbid = kbs.create(KnowledgeBoxConfig(slug="poison"))
    # short ack_wait: naks pace redelivery by the lease (NATS parity)
    bus = EmbeddedBus(str(tmp_path / "bus_p.db"), ack_wait=0.01)
    txn_util = TransactionUtility(bus)
    consumer = IngestConsumer(bus, processor)

    # undecodable payload (not even msgpack) — must nak, not raise
    from nucliadb_tpu.ingest.consumer import INGEST_STREAM

    bus.publish(INGEST_STREAM, "ingest.0.garbage", b"\xc1 not msgpack")
    # malformed payload: title must be a string
    txn_util.commit(
        BrokerMessage(kbid=kbid, rid="bad", op="create", payload={"title": {"x": 1}})
    )
    good = CreateResourcePayload(title="Good", texts={})
    txn_util.commit(
        BrokerMessage(kbid=kbid, rid="good", op="create", payload=good.model_dump())
    )

    # drains never raise; the poison message burns its deliveries (paced by
    # the lease) then skips
    import time as _time

    for _ in range(2 * MAX_DELIVERIES + 4):  # two poison messages to skip
        consumer.drain()
        _time.sleep(0.02)
    assert processor.get_payload(kbid, "good") is not None
    assert processor.get_payload(kbid, "bad") is None


def test_bus_purge_acked_cleans_consumer_rows(tmp_path):
    """Regression: purge_acked deleted message rows but left the matching
    consumers rows forever (unbounded table growth on long-lived buses)."""
    bus = EmbeddedBus(str(tmp_path / "bus_c.db"))
    for i in range(5):
        bus.publish("s", "ingest.0.x", f"m{i}".encode())
    while (m := bus.next("s", "c", subject_prefix="ingest.0.")) is not None:
        bus.ack("s", "c", m.seq)
    assert bus.purge_acked("s", [("c", "ingest.0.")]) == 5
    rows = bus._conn.execute("SELECT COUNT(*) FROM consumers WHERE stream='s'").fetchone()[0]
    assert rows == 0
