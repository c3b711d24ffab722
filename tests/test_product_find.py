import numpy as np
import pytest

from nucliadb_tpu.common.kb import KnowledgeBoxManager
from nucliadb_tpu.ingest.brain import ResourceBrain, split_paragraphs
from nucliadb_tpu.ingest.processor import Processor
from nucliadb_tpu.maindb import Driver
from nucliadb_tpu.models.api import (
    AskRequest,
    CatalogRequest,
    Classification,
    CreateResourcePayload,
    FilterExpression,
    FindRequest,
    GraphSearchPayload,
    KnowledgeBoxConfig,
    RelationNodePayload,
    RelationPayload,
    SearchFeature,
    SentenceEmbedding,
    SuggestRequest,
    TextFieldPayload,
    UserMetadata,
    VectorSetSpec,
)
from nucliadb_tpu.search import SearchService
from nucliadb_tpu.services import EmbeddedNode
from nucliadb_tpu.storage import MemoryStorage

DIM = 16


def embed(text):
    r = np.random.default_rng(abs(hash(text)) % (2**31))
    v = r.standard_normal(DIM).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


def payload(title, body, labels=(), entities=(), slug=""):
    p = CreateResourcePayload(
        slug=slug,
        title=title,
        texts={"text1": TextFieldPayload(body=body)},
        usermetadata=UserMetadata(
            classifications=[Classification(labelset=ls, label=l) for ls, l in labels]
        ),
        embeddings={
            "model1": {
                "text1": [SentenceEmbedding(start=0, end=len(body), vector=embed(body))]
            }
        },
    )
    p.usergenerated_relations = [
        RelationPayload(
            relation="ENTITY",
            label=lbl,
            **{"from": RelationNodePayload(value=a, group="person")},
            to=RelationNodePayload(value=b, group="place"),
        )
        for a, lbl, b in entities
    ]
    return p


@pytest.fixture
def stack(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "node"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv.db"))
    kbs = KnowledgeBoxManager(driver, node)
    processor = Processor(driver, node, kbs)
    search = SearchService(node, kbs, processor)
    kbid = kbs.create(
        KnowledgeBoxConfig(
            slug="testkb", vectorsets={"model1": VectorSetSpec(dimension=DIM)}
        )
    )
    rids = {}
    rids["fox"], _ = processor.create_resource(
        kbid,
        payload(
            "Fox doc",
            "the quick brown fox jumps over the lazy dog",
            labels=[("topic", "animals")],
            entities=[("fox", "jumps over", "meadow")],
            slug="fox-doc",
        ),
    )
    rids["fin"], _ = processor.create_resource(
        kbid,
        payload(
            "Finance doc",
            "stock markets rallied on quick tech gains",
            labels=[("topic", "finance")],
        ),
    )
    node.wait_for_sync()
    return node, kbs, processor, search, kbid, rids


def test_split_paragraphs():
    assert split_paragraphs("a b c") == [(0, 5)]
    spans = split_paragraphs("first para\n\nsecond para")
    assert len(spans) == 2
    assert spans[0] == (0, 10)


def test_brain_builder_labels():
    p = payload("T", "body", labels=[("topic", "x")])
    doc = ResourceBrain("r1").build(p)
    assert "/l/topic/x" in doc.labels
    assert "/n/s/PROCESSED" in doc.labels
    assert "a/title" in doc.texts and "t/text1" in doc.texts
    assert doc.vectors_to_delete_in_all_vectorsets == ["r1/"]


def test_find_hybrid(stack):
    node, kbs, processor, search, kbid, rids = stack
    req = FindRequest(
        query="quick fox",
        vector=embed("the quick brown fox jumps over the lazy dog"),
        top_k=5,
    )
    results = search.find(kbid, req)
    assert rids["fox"] in results.resources
    fox = results.resources[rids["fox"]]
    assert fox.title == "Fox doc"
    paras = [p for f in fox.fields.values() for p in f.paragraphs.values()]
    assert any("quick brown fox" in p.text for p in paras)
    # hybrid: the fox paragraph matched both sources
    top = min(paras, key=lambda p: p.order)
    assert top.score_type in ("BOTH", "BM25", "VECTOR")
    assert results.best_matches


def test_find_filter(stack):
    node, kbs, processor, search, kbid, rids = stack
    req = FindRequest(
        query="quick",
        features=[SearchFeature.KEYWORD],
        filter_expression=FilterExpression(literal="/l/topic/finance"),
        top_k=5,
    )
    results = search.find(kbid, req)
    assert set(results.resources) == {rids["fin"]}


def test_find_relations_feature(stack):
    node, kbs, processor, search, kbid, rids = stack
    req = FindRequest(
        query="fox news",
        features=[SearchFeature.KEYWORD, SearchFeature.RELATIONS],
        top_k=5,
    )
    results = search.find(kbid, req)
    assert any(r.from_value == "fox" for r in results.relations)


def test_resource_update_and_find(stack):
    node, kbs, processor, search, kbid, rids = stack
    from nucliadb_tpu.models.api import UpdateResourcePayload

    p = payload("Wolf doc", "a silent grey wolf watches")
    processor.update_resource(kbid, rids["fox"], UpdateResourcePayload(**p.model_dump()))
    node.wait_for_sync()
    res = search.find(kbid, FindRequest(query="fox", features=[SearchFeature.KEYWORD]))
    assert rids["fox"] not in res.resources
    res2 = search.find(kbid, FindRequest(query="wolf", features=[SearchFeature.KEYWORD]))
    assert rids["fox"] in res2.resources


def test_resource_delete(stack):
    node, kbs, processor, search, kbid, rids = stack
    processor.delete_resource(kbid, rids["fin"])
    node.wait_for_sync()
    res = search.find(kbid, FindRequest(query="markets", features=[SearchFeature.KEYWORD]))
    assert res.resources == {}
    assert processor.get_payload(kbid, rids["fin"]) is None


def test_suggest(stack):
    node, kbs, processor, search, kbid, rids = stack
    resp = search.suggest(kbid, SuggestRequest(query="qui"))
    assert resp.paragraphs
    resp2 = search.suggest(kbid, SuggestRequest(query="fo", features=["entities"]))
    assert "fox" in resp2.entities


def test_catalog(stack):
    node, kbs, processor, search, kbid, rids = stack
    resp = search.catalog(kbid, CatalogRequest(faceted=["/l/topic"]))
    assert len(resp.resources) == 2
    assert resp.facets["/l/topic"]["/l/topic/animals"] >= 1
    resp2 = search.catalog(
        kbid,
        CatalogRequest(filter_expression=FilterExpression(literal="/l/topic/finance")),
    )
    assert [r.id for r in resp2.resources] == [rids["fin"]]


def test_graph_endpoint(stack):
    node, kbs, processor, search, kbid, rids = stack
    resp = search.graph(kbid, GraphSearchPayload(source_value="fox"))
    assert len(resp.paths) == 1 and resp.paths[0].target == "meadow"


def test_ask_without_generative(stack):
    node, kbs, processor, search, kbid, rids = stack
    resp = search.ask(
        kbid,
        AskRequest(query="quick fox", vector=embed("the quick brown fox jumps over the lazy dog")),
    )
    assert resp.status == "no_generative_model"
    assert "fox" in resp.answer
    assert rids["fox"] in resp.citations


def test_kb_lifecycle(tmp_path):
    node = EmbeddedNode(data_dir=str(tmp_path / "n"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv2.db"))
    kbs = KnowledgeBoxManager(driver, node)
    kbid = kbs.create(KnowledgeBoxConfig(slug="kb-a"))
    assert kbs.resolve_slug("kb-a") == kbid
    assert kbid in kbs.list_kbs()
    with pytest.raises(KeyError):
        kbs.create(KnowledgeBoxConfig(slug="kb-a"))
    kbs.delete(kbid)
    assert kbs.resolve_slug("kb-a") is None
    assert kbid not in kbs.list_kbs()


def test_slug_resolution(stack):
    node, kbs, processor, search, kbid, rids = stack
    assert processor.resolve_slug(kbid, "fox-doc") == rids["fox"]


def test_find_highlight_and_offset(stack):
    node, kbs, processor, search, kbid, rids = stack
    res = search.find(
        kbid,
        FindRequest(query="quick fox", features=[SearchFeature.KEYWORD], highlight=True),
    )
    paras = [
        p
        for r in res.resources.values()
        for f in r.fields.values()
        for p in f.paragraphs.values()
    ]
    assert any("<mark>quick</mark>" in p.text for p in paras)

    all_res = search.find(
        kbid, FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=10)
    )
    page2 = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=1, offset=1),
    )
    assert page2.best_matches[0] == all_res.best_matches[1]


def test_find_search_after_cursor(stack):
    node, kbs, processor, search, kbid, rids = stack
    all_res = search.find(
        kbid, FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=10)
    )
    page1 = search.find(
        kbid, FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=1)
    )
    assert page1.next_cursor is not None
    page2 = search.find(
        kbid,
        FindRequest(
            query="quick",
            features=[SearchFeature.KEYWORD],
            top_k=1,
            search_after=page1.next_cursor,
        ),
    )
    assert page2.best_matches[0] == all_res.best_matches[1]
    # bad cursor -> clean error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search.find(
            kbid,
            FindRequest(query="quick", features=[SearchFeature.KEYWORD], search_after="garbage!"),
        )


def test_find_phase_metrics(caplog):
    """Phase timings are recorded per find request and slow queries log."""
    import logging

    from nucliadb_tpu.search import metrics as m

    metrics = m.Metrics()
    with metrics.time("retrieval"):
        pass
    with metrics.time("fusion"):
        pass
    d = metrics.to_dict()
    assert set(d) >= {"retrieval", "fusion", "total"}

    # below thresholds: no log
    with caplog.at_level(logging.WARNING, logger="nucliadb_tpu.search.slow"):
        metrics.log_if_slow("find", "kbid=x")
    assert not caplog.records

    # force a slow phase -> structured warning
    metrics.phases["retrieval"] = 1.5
    with caplog.at_level(logging.WARNING, logger="nucliadb_tpu.search.slow"):
        metrics.log_if_slow("find", "kbid=x")
    assert caplog.records and "slow find query" in caplog.records[0].getMessage()


def test_ask_rag_strategies_and_history(stack):
    """rag strategies widen the grounding; chat history and extra context
    feed the prompt; citations toggle."""
    from nucliadb_tpu.models.api import AskRequest, ChatContextMessage

    node, kbs, processor, search, kbid, rids = stack

    base = AskRequest(query="fox", top_k=3)
    plain = search.ask(kbid, base)
    assert plain.citations  # on by default

    no_cit = search.ask(kbid, AskRequest(query="fox", citations=False))
    assert no_cit.citations == {}

    widened = search.ask(
        kbid, AskRequest(query="fox", rag_strategies=["full_resource"])
    )
    # full_resource pulls the entire field text into the answer context
    assert len(widened.answer) >= len(plain.answer)

    neigh = search.ask(
        kbid, AskRequest(query="fox", rag_strategies=["neighbouring_paragraphs"])
    )
    assert neigh.status in ("success", "no_generative_model")

    hist = search.ask(
        kbid,
        AskRequest(
            query="irrelevantquerywithnomatches",
            chat_history=[ChatContextMessage(author="USER", text="earlier q")],
            extra_context=["caller supplied grounding"],
        ),
    )
    # extra context keeps the request answerable even with no retrieval hits
    assert hist.status != "no_context"
    assert "caller supplied grounding" in hist.answer


def test_date_range_filters(stack):
    """range_creation/modification windows filter find and catalog
    (parity: range_* search params)."""
    import time as _time

    from nucliadb_tpu.models.api import CatalogRequest

    node, kbs, processor, search, kbid, rids = stack
    cutoff = _time.time() + 1
    # a resource created after the cutoff
    _time.sleep(0.01)
    late_rid, _ = processor.create_resource(
        kbid, payload("Late doc", "the quick late arrival", slug="late")
    )
    meta = processor.get_meta(kbid, late_rid)
    meta.created = cutoff + 100
    with processor.driver as txn:
        from nucliadb_tpu.common.kb import RESOURCE_META

        txn.set(RESOURCE_META.format(kbid=kbid, rid=late_rid), meta.to_json())
    # reindex so the text index picks up the new created timestamp
    from nucliadb_tpu.models.api import UpdateResourcePayload

    processor.update_resource(kbid, late_rid, UpdateResourcePayload())
    node.wait_for_sync()

    # find restricted to AFTER the cutoff only returns the late doc
    res = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD],
                    range_creation_start=cutoff),
    )
    assert set(res.resources) == {late_rid}
    # before the cutoff excludes it
    res = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD],
                    range_creation_end=cutoff),
    )
    assert late_rid not in res.resources and res.resources

    # ISO-8601 accepted
    import datetime

    iso = datetime.datetime.fromtimestamp(
        cutoff, datetime.timezone.utc
    ).isoformat()
    res = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD],
                    range_creation_start=iso),
    )
    assert set(res.resources) == {late_rid}

    # catalog honors the window too
    cat = search.catalog(kbid, CatalogRequest(range_creation_start=cutoff))
    assert [r.id for r in cat.resources] == [late_rid]


def test_find_predict_reranker(tmp_path):
    """The predict reranker reorders the fused window by model score
    (parity: rerankers.py PredictReranker over a top_k*5 window)."""
    from nucliadb_tpu.search.predict import LocalPredictEngine

    node = EmbeddedNode(data_dir=str(tmp_path / "node"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv.db"))
    kbs = KnowledgeBoxManager(driver, node)
    processor = Processor(driver, node, kbs)
    # rerank callable strongly prefers passages mentioning "snail"
    engine = LocalPredictEngine(
        reranker=lambda q, ps: [10.0 if "snail" in p else 0.0 for p in ps]
    )
    search = SearchService(node, kbs, processor, predict=engine)
    kbid = kbs.create(KnowledgeBoxConfig(slug="rrkb"))
    processor.create_resource(
        kbid, payload("Fox", "the quick brown fox jumps high", slug="fox")
    )
    snail_rid, _ = processor.create_resource(
        kbid, payload("Snail", "the quick snail crawls slowly", slug="snail")
    )
    node.wait_for_sync()

    base = FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=2)
    plain = search.find(kbid, base)
    assert len(plain.best_matches) == 2

    reranked = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD], top_k=2,
                    reranker="predict"),
    )
    # the snail paragraph wins under the model scores
    assert reranked.best_matches[0].startswith(snail_rid)
    first = reranked.resources[snail_rid]
    top = min(
        (p for f in first.fields.values() for p in f.paragraphs.values()),
        key=lambda p: p.order,
    )
    assert top.score == 10.0


def test_find_autofilter(stack):
    """autofilter detects KB entities in the query and filters on their
    /e/{group}/{value} labels, echoing them in results.autofilters."""
    node, kbs, processor, search, kbid, rids = stack
    # register the entity vocabulary (the fox doc carries /e/person/fox via
    # its usergenerated relation)
    search.entities.set_group(
        kbid, "person", {"title": "P", "entities": {"fox": {"value": "fox"}}}
    )
    res = search.find(
        kbid,
        FindRequest(query="quick fox", features=[SearchFeature.KEYWORD],
                    autofilter=True),
    )
    assert res.autofilters == ["/e/person/fox"]
    # only the fox doc matches "quick" now; the finance doc ("quick tech
    # gains") is filtered out by the entity label
    assert set(res.resources) == {rids["fox"]}

    # without autofilter both quick docs match
    res2 = search.find(
        kbid, FindRequest(query="quick", features=[SearchFeature.KEYWORD])
    )
    assert set(res2.resources) == {rids["fox"], rids["fin"]}
    assert res2.autofilters == []


def test_ask_rephrase_with_history(stack):
    """Chat history triggers a standalone-question rewrite before retrieval;
    the response echoes the rephrased query."""
    from nucliadb_tpu.models.api import ChatContextMessage
    from nucliadb_tpu.search import SearchService
    from nucliadb_tpu.search.predict import HashingEncoder, LocalPredictEngine

    node, kbs, processor, _, kbid, rids = stack
    # match the KB's 16-dim vectorset so query embedding stays valid
    engine = LocalPredictEngine(encoder=HashingEncoder(dimension=DIM))
    search = SearchService(node, kbs, processor, predict=engine)
    resp = search.ask(
        kbid,
        AskRequest(
            query="and the lazy one?",
            chat_history=[
                ChatContextMessage(author="user", text="tell me about the quick brown fox"),
                ChatContextMessage(author="assistant", text="it jumps over the lazy dog"),
            ],
        ),
    )
    assert resp.rephrased_query and "fox" in resp.rephrased_query
    # the rewrite made retrieval find the fox doc
    assert rids["fox"] in resp.retrieval.resources


def test_find_fulltext_feature(stack):
    """feature "fulltext" adds field-level BM25 document hits (parity: the
    /search fulltext block from the text index)."""
    node, kbs, processor, search, kbid, rids = stack
    res = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.FULLTEXT]),
    )
    assert res.fulltext is not None and res.fulltext.total >= 2
    hit_rids = {h.rid for h in res.fulltext.results}
    assert {rids["fox"], rids["fin"]} <= hit_rids
    assert all(h.score > 0 for h in res.fulltext.results)
    assert all("/" in h.field or h.field for h in res.fulltext.results)
    # fulltext matches serialize into resources (parity: reference merge.py
    # resources.update for the document leg) — but with no paragraph fields
    assert hit_rids <= set(res.resources)
    assert all(r.fields == {} for r in res.resources.values())

    # combined keyword + fulltext: both blocks present
    both = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.KEYWORD, SearchFeature.FULLTEXT]),
    )
    assert both.fulltext is not None and both.resources


def test_find_fulltext_sort_and_facets(stack):
    node, kbs, processor, search, kbid, rids = stack
    res = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.FULLTEXT],
                    sort_field="created", sort_order="asc",
                    faceted=["/l/topic"]),
    )
    assert res.fulltext is not None
    # facet counts over matching documents
    assert res.fulltext.facets.get("/l/topic", {}).get("/l/topic/animals", 0) >= 1
    # ascending created order: the fox doc (created first) leads
    assert res.fulltext.results[0].rid == rids["fox"]
    desc = search.find(
        kbid,
        FindRequest(query="quick", features=[SearchFeature.FULLTEXT],
                    sort_field="created"),
    )
    assert desc.fulltext.results[0].rid == rids["fin"]


def test_graph_semantic_nodes(stack):
    """semantic=true widens graph matches with embedding-close node values
    (the semantic-graph role through the predict seam)."""
    from nucliadb_tpu.search import SearchService

    node, kbs, processor, _, kbid, rids = stack

    class NodeEncoder:
        """'fox'-ish queries land near the fox node, far from meadow."""
        def __call__(self, text):
            t = text.lower()
            v = np.zeros(4, np.float32)
            v[0] = 1.0 if "fox" in t or "vulpine" in t else 0.0
            v[1] = 1.0 if "meadow" in t else 0.0
            v[2] = 0.1
            n = np.linalg.norm(v)
            return v / n if n else v

    from nucliadb_tpu.search.predict import LocalPredictEngine

    search = SearchService(node, kbs, processor, predict=LocalPredictEngine(encoder=NodeEncoder()))

    # no lexical pattern at all, pure semantic: "vulpine animal" ~ fox node
    res = search.graph(
        kbid, GraphSearchPayload(query="vulpine animal", semantic=True, top_k=10)
    )
    assert any(p.source == "fox" and p.target == "meadow" for p in res.paths)

    # without semantic, the same pattern-free query matches everything or
    # nothing lexically — the flag changes behavior only by ADDING paths
    base = search.graph(kbid, GraphSearchPayload(top_k=10))
    assert len(res.paths) >= len(base.paths) or base.paths

    # match="semantic" leaf inside a boolean path query (Term::FromVectorQuery
    # — const-score union of the vector-nearest node values)
    expr = search.graph_expr(
        kbid,
        {"prop": "node", "value": "vulpine animal", "match": "semantic"},
        top_k=10,
    )
    assert any(p.source == "fox" for p in expr.paths)
    assert all(p.score is not None and p.score > 0 for p in expr.paths)
    # ...and through the distinct-nodes projection, score = cosine sim
    nodes = search.graph_nodes_expr(
        kbid,
        {"prop": "node", "value": "vulpine animal", "match": "semantic"},
        top_k=10,
    )
    assert nodes.nodes and nodes.nodes[0].value == "fox"


def test_ask_strategies_hierarchy_metadata_graph_prequeries(stack):
    from nucliadb_tpu.models.api import PreQuery

    node, kbs, processor, search, kbid, rids = stack
    resp = search.ask(
        kbid,
        AskRequest(
            query="quick fox",
            rag_strategies=["hierarchy", "metadata_extension", "graph"],
            prequeries=[
                PreQuery(
                    request=FindRequest(query="markets", features=[SearchFeature.KEYWORD]),
                    weight=2.0,
                )
            ],
        ),
    )
    assert resp.status == "no_generative_model"
    joined = "\n".join(resp.answer.split("\n\n"))
    # prequery context (finance doc) leads
    assert "rallied" in resp.answer.split("\n\n")[0]
    # full context (not just the 3-block fallback answer) carries strategy output
    # hierarchy prefix and graph triple reach the context; verify via a
    # generative engine that echoes its context
    from nucliadb_tpu.search import SearchService
    from nucliadb_tpu.search.predict import HashingEncoder, LocalPredictEngine

    echo = SearchService(
        node, kbs, processor,
        predict=LocalPredictEngine(
            encoder=HashingEncoder(dimension=DIM),
            generator=lambda prompt, ctx: "||".join(ctx),
        ),
    )
    out = echo.ask(
        kbid,
        AskRequest(
            query="quick fox",
            rag_strategies=["hierarchy", "metadata_extension", "graph"],
        ),
    )
    assert "Fox doc > " in out.answer  # hierarchy prefix
    assert "labels: /l/topic/animals" in out.answer  # metadata extension
    assert "fox —jumps over→ meadow" in out.answer  # graph triple


def test_ask_strategies_field_extension_and_conversation(stack):
    """Parameterized rag_strategies objects (parity: search.py RagStrategy
    subclasses): field_extension attaches named fields of matched
    resources; conversation surrounds a message hit with its neighbours
    (or the full transcript)."""
    from nucliadb_tpu.models.api import (
        ConversationFieldPayload,
        ConversationMessage,
    )
    from nucliadb_tpu.search import SearchService
    from nucliadb_tpu.search.predict import HashingEncoder, LocalPredictEngine

    node, kbs, processor, _, kbid, rids = stack
    p = payload("Conv doc", "unrelated body text")
    p.conversations = {
        "chat": ConversationFieldPayload(
            messages=[
                ConversationMessage(who=f"u{i}", text=f"message number {i} zebra" if i == 6 else f"message number {i}")
                for i in range(12)
            ]
        )
    }
    processor.create_resource(kbid, p)
    node.wait_for_sync()

    echo = SearchService(
        node, kbs, processor,
        predict=LocalPredictEngine(
            encoder=HashingEncoder(dimension=DIM),
            generator=lambda prompt, ctx: "||".join(ctx),
        ),
    )
    # field_extension: matching the fox doc attaches its title field
    out = echo.ask(
        kbid,
        AskRequest(
            query="quick fox",
            features=[SearchFeature.KEYWORD],
            rag_strategies=[{"name": "field_extension", "fields": ["a/title"]}],
        ),
    )
    assert "Fox doc" in out.answer
    # conversation: the zebra hit is a message; neighbours ride along
    out = echo.ask(
        kbid,
        AskRequest(
            query="zebra",
            features=[SearchFeature.KEYWORD],
            rag_strategies=[{"name": "conversation", "max_messages": 4}],
        ),
    )
    assert "message number 6 zebra" in out.answer
    assert "message number 5" in out.answer  # neighbour included
    assert "message number 0" not in out.answer  # bounded window
    out = echo.ask(
        kbid,
        AskRequest(
            query="zebra",
            features=[SearchFeature.KEYWORD],
            rag_strategies=[{"name": "conversation", "full": True}],
        ),
    )
    assert "message number 0" in out.answer and "message number 11" in out.answer
    # parameterized neighbouring_paragraphs and full_resource count
    out = echo.ask(
        kbid,
        AskRequest(
            query="quick fox",
            features=[SearchFeature.KEYWORD],
            rag_strategies=[
                {"name": "neighbouring_paragraphs", "before": 0, "after": 0}
            ],
        ),
    )
    assert "quick brown fox" in out.answer
    out = echo.ask(
        kbid,
        AskRequest(
            query="quick",
            features=[SearchFeature.KEYWORD],
            rag_strategies=[{"name": "full_resource", "count": 1}],
        ),
    )
    # only one resource widens to full field text; the others keep
    # paragraph-level blocks
    assert "||" in out.answer


def test_fulltext_offset_and_global_sort(tmp_path):
    """fulltext pagination honors offset and date sort stays global across
    shards (review regressions)."""
    node = EmbeddedNode(data_dir=str(tmp_path / "node"), storage=MemoryStorage())
    driver = Driver(str(tmp_path / "kv.db"))
    kbs = KnowledgeBoxManager(driver, node)
    processor = Processor(driver, node, kbs)
    search = SearchService(node, kbs, processor)
    # two shards so the concatenation order can disagree with date order
    kbid = kbs.create(KnowledgeBoxConfig(slug="ftkb", shards=2))
    import time as _time

    rids = []
    for i in range(4):
        rid, _ = processor.create_resource(
            kbid,
            CreateResourcePayload(title=f"F{i}", texts={"t": TextFieldPayload(body=f"shared token doc{i}")}),
            created=1000.0 + i,
        )
        rids.append(rid)
    node.wait_for_sync()

    page1 = search.find(kbid, FindRequest(
        query="shared", features=[SearchFeature.FULLTEXT],
        sort_field="created", sort_order="asc", top_k=2))
    page2 = search.find(kbid, FindRequest(
        query="shared", features=[SearchFeature.FULLTEXT],
        sort_field="created", sort_order="asc", top_k=2, offset=2))
    got = [h.rid for h in page1.fulltext.results] + [h.rid for h in page2.fulltext.results]
    assert got == rids  # globally date-ordered, no duplicates across pages
