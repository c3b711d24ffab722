import numpy as np
import pytest

from nucliadb_tpu.index.json import JsonPredicate
from nucliadb_tpu.index.relation import (
    GraphSearchRequest,
    NodePattern,
    RelationPattern,
)
from nucliadb_tpu.index.vector import VectorConfig
from nucliadb_tpu.models.internal import (
    IndexParagraph,
    IndexRelation,
    RelationNode,
    ResourceDoc,
    Security,
    TextInformation,
    VectorSentence,
)
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.shard import (
    ShardConfig,
    ShardIndexer,
    ShardSearcher,
    ShardSearchRequest,
)
from nucliadb_tpu.types import Seq, SimpleOpenIndex

DIM = 16


def embed(text, rng=None):
    """Deterministic fake embedding: hash-seeded gaussian."""
    h = abs(hash(text)) % (2**31)
    r = np.random.default_rng(h)
    v = r.standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def make_resource(rid, text, labels=None, entities=None, meta_json=None, groups=None):
    rd = ResourceDoc(resource_id=rid, labels=labels or [], created=1000, modified=1000)
    rd.texts["t/text1"] = TextInformation(text=text)
    sentences = {}
    para = IndexParagraph(start=0, end=len(text))
    para.vectorsets_sentences["model1"] = {
        f"{rid}/t/text1/0/0-{len(text)}": VectorSentence(vector=embed(text))
    }
    rd.paragraphs["t/text1"] = {f"{rid}/t/text1/0-{len(text)}": para}
    if entities:
        rd.relations["t/text1"] = [
            IndexRelation(
                source=RelationNode(value=a, ntype="ENTITY", subtype="person"),
                target=RelationNode(value=b, ntype="ENTITY", subtype="place"),
                relation="ENTITY",
                label=lbl,
            )
            for a, lbl, b in entities
        ]
    if meta_json:
        rd.json_fields["t/text1"] = meta_json
    if groups is not None:
        rd.security = Security(access_groups=groups)
    return rd


RESOURCES = [
    make_resource(
        "r1",
        "the quick brown fox jumps over the lazy dog",
        labels=["/l/topic/animals"],
        entities=[("fox", "jumps over", "dog")],
        meta_json='{"price": 10, "color": "brown"}',
    ),
    make_resource(
        "r2",
        "stock markets rallied on quick tech gains",
        labels=["/l/topic/finance"],
        entities=[("nasdaq", "located in", "new york")],
        meta_json='{"price": 99, "color": "green"}',
    ),
    make_resource(
        "r3",
        "the fox entity is a quick animal in markets of fur",
        labels=["/l/topic/animals"],
        groups=["admins"],
        meta_json='{"price": 50}',
    ),
]


@pytest.fixture
def shard(tmp_path):
    config = ShardConfig(
        shard_id="s1", kbid="kb1", vectorsets={"model1": VectorConfig(dimension=DIM)}
    )
    indexer = ShardIndexer(config)
    open_indexes: dict[str, SimpleOpenIndex] = {}
    for i, r in enumerate(RESOURCES):
        ops = indexer.index_resource(r, str(tmp_path / f"op{i}"))
        for op in ops:
            oi = open_indexes.setdefault(op.index_name, SimpleOpenIndex())
            if op.segment is not None:
                oi.segment_list.append((op.segment, Seq(i + 1)))
    return ShardSearcher(config, open_indexes)


def test_hybrid_search(shard):
    resp = shard.search(
        ShardSearchRequest(
            body="quick fox",
            vector=embed("the quick brown fox jumps over the lazy dog"),
            top_k=5,
        )
    )
    assert resp.paragraph is not None and resp.paragraph.hits
    assert resp.paragraph.hits[0].rid in ("r1", "r3")
    assert resp.vector
    assert resp.vector[0].key.startswith("r1/")  # exact embedding match
    np.testing.assert_allclose(resp.vector[0].score, 1.0, rtol=1e-3)


def test_label_filter_applies_to_both(shard):
    resp = shard.search(
        ShardSearchRequest(
            body="quick",
            vector=embed("anything"),
            filter=LabelAtom("/l/topic/finance"),
            top_k=5,
        )
    )
    assert all(h.rid == "r2" for h in resp.paragraph.hits)
    assert all(h.key.startswith("r2/") for h in resp.vector)


def test_security_prefilter_clears_vector(shard):
    # r3 is restricted; with no groups, r3 must not appear anywhere
    resp = shard.search(
        ShardSearchRequest(
            body="fox", vector=embed("the fox entity is a quick animal in markets of fur"),
            security_groups=[], top_k=5,
        )
    )
    assert all(h.rid != "r3" for h in resp.paragraph.hits)
    assert all(not h.key.startswith("r3/") for h in resp.vector)
    # with admins group, r3 becomes visible
    resp2 = shard.search(
        ShardSearchRequest(
            body="fox", vector=embed("the fox entity is a quick animal in markets of fur"),
            security_groups=["admins"], top_k=5,
        )
    )
    assert any(h.key.startswith("r3/") for h in resp2.vector)


def test_json_prefilter(shard):
    resp = shard.search(
        ShardSearchRequest(
            body="quick",
            vector=embed("anything"),
            json_filter=JsonPredicate(path="price", op="gt", value=40),
            top_k=5,
        )
    )
    rids = {h.rid for h in resp.paragraph.hits}
    assert rids <= {"r2", "r3"}
    # impossible filter clears everything
    resp2 = shard.search(
        ShardSearchRequest(
            body="quick",
            json_filter=JsonPredicate(path="price", op="gt", value=1000),
            top_k=5,
        )
    )
    assert resp2.prefilter.is_none
    assert resp2.paragraph is None and resp2.vector == []


def test_graph_search(shard):
    resp = shard.search(
        ShardSearchRequest(
            body="",
            graph=GraphSearchRequest(source=NodePattern(value="fox")),
            top_k=5,
        )
    )
    assert len(resp.graph) == 1
    assert resp.graph[0].target.value == "dog"
    # fuzzy node match
    resp2 = shard.search(
        ShardSearchRequest(
            body="",
            graph=GraphSearchRequest(source=NodePattern(value="foz", fuzzy=True)),
        )
    )
    assert len(resp2.graph) == 1
    # relation label constraint
    resp3 = shard.search(
        ShardSearchRequest(
            body="",
            graph=GraphSearchRequest(relation=RelationPattern(label="located in")),
        )
    )
    assert len(resp3.graph) == 1 and resp3.graph[0].source.value == "nasdaq"


def test_document_search_via_shard(shard):
    resp = shard.search(
        ShardSearchRequest(body="markets", document=True, paragraph=False, top_k=5)
    )
    assert resp.document is not None
    assert {h.rid for h in resp.document.hits} == {"r2", "r3"}


def test_relation_suggest(shard):
    nodes = shard.relation.suggest_nodes("new")
    assert any(n.value == "new york" for n in nodes)


def test_key_filters(shard):
    resp = shard.search(
        ShardSearchRequest(body="quick", key_filters=["r2/"], top_k=5)
    )
    assert all(h.rid == "r2" for h in resp.paragraph.hits)


def test_document_search_date_range_and_key_filters(tmp_path):
    """Regression: the fulltext/document leg must honor range_creation /
    range_modification and key_filters (the shard executor used to drop
    them, returning out-of-window documents)."""
    config = ShardConfig(shard_id="s2", kbid="kb1", vectorsets={})
    indexer = ShardIndexer(config)
    open_indexes: dict[str, SimpleOpenIndex] = {}
    docs = [
        ("old", "quick update about markets", 1000),
        ("new", "another quick update indeed", 5000),
    ]
    for i, (rid, text, created) in enumerate(docs):
        rd = ResourceDoc(resource_id=rid, created=created, modified=created)
        rd.texts["t/text1"] = TextInformation(text=text)
        ops = indexer.index_resource(rd, str(tmp_path / f"dop{i}"))
        for op in ops:
            oi = open_indexes.setdefault(op.index_name, SimpleOpenIndex())
            if op.segment is not None:
                oi.segment_list.append((op.segment, Seq(i + 1)))
    shard = ShardSearcher(config, open_indexes)
    resp = shard.search(
        ShardSearchRequest(
            body="quick", document=True, paragraph=False, top_k=5,
            range_creation=(2000, None),
        )
    )
    assert {h.rid for h in resp.document.hits} == {"new"}
    resp = shard.search(
        ShardSearchRequest(
            body="quick", document=True, paragraph=False, top_k=5,
            key_filters=["old/"],
        )
    )
    assert {h.rid for h in resp.document.hits} == {"old"}


def test_document_leg_respects_json_prefilter(shard):
    """Regression: the fulltext (document) leg ignored the computed
    field/json prefilter — it returned fields the filter excluded while
    the paragraph/vector legs of the same request were restricted."""
    resp = shard.search(
        ShardSearchRequest(
            body="quick",
            document=True,
            json_filter=JsonPredicate(path="price", op="gt", value=40),
            top_k=5,
        )
    )
    assert resp.document is not None
    rids = {h.rid for h in resp.document.hits}
    assert rids and rids <= {"r2", "r3"}, rids


def test_prefilter_on_empty_text_index_is_none(tmp_path):
    """Regression: numpy's all() on a zero-doc index is vacuously True, so
    an empty text index returned PrefilterResult.all() and BYPASSED
    security/field filters for the other index legs."""
    from nucliadb_tpu.index.text import TextSearcher

    s = TextSearcher(SimpleOpenIndex())
    assert s.prefilter(security_groups=["admins"]).is_none
    assert s.prefilter(filter=LabelAtom("/l/x/y")).is_none
