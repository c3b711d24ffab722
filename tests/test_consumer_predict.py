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
