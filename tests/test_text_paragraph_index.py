import numpy as np
import pytest

from nucliadb_tpu.index.paragraph import (
    ParagraphIndexer,
    ParagraphSearcher,
    ParagraphSearchRequest,
    split_phrases,
)
from nucliadb_tpu.index.text import (
    DocumentSearchRequest,
    TextIndexer,
    TextSearcher,
)
from nucliadb_tpu.models.internal import (
    IndexParagraph,
    ResourceDoc,
    ResourceStatus,
    Security,
    TextInformation,
)
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import FieldId, PrefilterKind, Seq, SimpleOpenIndex


def make_resource(rid, text, labels=None, groups=None, created=1000):
    rd = ResourceDoc(resource_id=rid, labels=labels or [], created=created, modified=created)
    rd.texts["t/text1"] = TextInformation(text=text, labels=["/t/t"])
    # paragraphs: split text in two halves on sentence boundary if possible
    half = max(text.find(". ") + 1, len(text) // 2)
    paras = {
        f"{rid}/t/text1/0-{half}": IndexParagraph(start=0, end=half),
        f"{rid}/t/text1/{half}-{len(text)}": IndexParagraph(start=half, end=len(text), index=1),
    }
    rd.paragraphs["t/text1"] = paras
    if groups is not None:
        rd.security = Security(access_groups=groups)
    return rd


RESOURCES = [
    make_resource("r1", "the quick brown fox jumps. the lazy dog sleeps", ["/l/ls/a"]),
    make_resource("r2", "a quick cat naps. brown leaves fall", ["/l/ls/b"]),
    make_resource("r3", "secret quick document here. hidden content", ["/l/ls/a"], groups=["admins"]),
]


def build_text_searcher(tmp_path, resources=RESOURCES):
    indexer = TextIndexer()
    segs = []
    for i, r in enumerate(resources):
        m = indexer.index_resource(r, str(tmp_path / f"t{i}"))
        segs.append((m, Seq(i + 1)))
    return TextSearcher(SimpleOpenIndex(segment_list=segs))


def build_para_searcher(tmp_path, resources=RESOURCES):
    indexer = ParagraphIndexer()
    segs = []
    for i, r in enumerate(resources):
        m = indexer.index_resource(r, str(tmp_path / f"p{i}"))
        segs.append((m, Seq(i + 1)))
    return ParagraphSearcher(SimpleOpenIndex(segment_list=segs))


def test_text_search_bm25(tmp_path):
    s = build_text_searcher(tmp_path)
    resp = s.search(DocumentSearchRequest(query="quick brown", top_k=10))
    # r1 and r2 both contain quick+brown; r2 is shorter so BM25 ranks it first
    assert {h.rid for h in resp.hits[:2]} == {"r1", "r2"}
    assert resp.total >= 2
    assert all(h.field == "t/text1" for h in resp.hits)


def test_text_security_groups(tmp_path):
    s = build_text_searcher(tmp_path)
    resp = s.search(DocumentSearchRequest(query="quick", top_k=10, security_groups=[]))
    assert all(h.rid != "r3" for h in resp.hits)  # r3 restricted to admins
    resp2 = s.search(
        DocumentSearchRequest(query="quick", top_k=10, security_groups=["admins"])
    )
    assert any(h.rid == "r3" for h in resp2.hits)
    resp3 = s.search(DocumentSearchRequest(query="quick", top_k=10))  # no security check
    assert any(h.rid == "r3" for h in resp3.hits)


def test_text_facets_and_order(tmp_path):
    s = build_text_searcher(tmp_path)
    resp = s.search(
        DocumentSearchRequest(query="quick", top_k=10, faceted=["/l/ls"])
    )
    assert resp.facet_counts["/l/ls"] == {"/l/ls/a": 2, "/l/ls/b": 1}
    resp2 = s.search(
        DocumentSearchRequest(query="quick", top_k=10, order_by="created", order_desc=False)
    )
    assert len(resp2.hits) == 3


def test_text_prefilter(tmp_path):
    s = build_text_searcher(tmp_path)
    pf = s.prefilter()
    assert pf.is_all
    pf2 = s.prefilter(filter=LabelAtom("/l/ls/a"), security_groups=[])
    assert pf2.kind is PrefilterKind.SOME
    assert set(pf2.fields) == {FieldId("r1", "t/text1")}
    pf3 = s.prefilter(filter=LabelAtom("/l/nope/x"))
    assert pf3.is_none


def test_paragraph_search(tmp_path):
    s = build_para_searcher(tmp_path)
    resp = s.search(ParagraphSearchRequest(query="lazy dog", top_k=10))
    assert resp.hits[0].rid == "r1"
    assert resp.hits[0].paragraph_id.startswith("r1/t/text1/")
    # positions carried for hydration
    assert resp.hits[0].end > resp.hits[0].start


def test_paragraph_fuzzy(tmp_path):
    s = build_para_searcher(tmp_path)
    resp = s.search(ParagraphSearchRequest(query="quik", top_k=10, fuzzy=True))
    assert resp.total > 0
    resp2 = s.search(ParagraphSearchRequest(query="quik", top_k=10, fuzzy=False))
    assert resp2.total == 0


def test_paragraph_phrase(tmp_path):
    s = build_para_searcher(tmp_path)
    resp = s.search(ParagraphSearchRequest(query='"lazy dog"', top_k=10))
    assert len(resp.hits) == 1 and resp.hits[0].rid == "r1"
    resp2 = s.search(ParagraphSearchRequest(query='"dog lazy"', top_k=10))
    assert resp2.hits == []


def test_paragraph_ematch(tmp_path):
    s = build_para_searcher(tmp_path)
    resp = s.search(ParagraphSearchRequest(query="lazy dog sleeps", top_k=10))
    em = [h for h in resp.hits if h.ematch]
    assert len(em) == 1 and em[0].rid == "r1"


def test_paragraph_prefilter_handoff(tmp_path):
    from nucliadb_tpu.types import PrefilterResult

    s = build_para_searcher(tmp_path)
    pf = PrefilterResult.some([FieldId("r2", "t/text1")])
    resp = s.search(ParagraphSearchRequest(query="quick", top_k=10, field_filter=pf))
    assert all(h.rid == "r2" for h in resp.hits)
    resp2 = s.search(
        ParagraphSearchRequest(query="quick", top_k=10, field_filter=PrefilterResult.none())
    )
    assert resp2.hits == []


def test_paragraph_pagination(tmp_path):
    s = build_para_searcher(tmp_path)
    all_resp = s.search(ParagraphSearchRequest(query="quick", top_k=10))
    page2 = s.search(ParagraphSearchRequest(query="quick", top_k=1, offset=1))
    assert page2.hits[0].paragraph_id == all_resp.hits[1].paragraph_id


def test_split_phrases():
    rest, phrases = split_phrases('hello "brown fox" world "lazy dog"')
    assert phrases == ["brown fox", "lazy dog"]
    assert "hello" in rest and "world" in rest


def test_parse_query_grammar():
    """The nidx keyword grammar: literals, quotes, -exclusions, lenient on
    unclosed quotes (query_parser/tokenizer.rs)."""
    from nucliadb_tpu.index.paragraph import parse_query

    rest, phrases, excluded = parse_query('hello "brown fox" -noise world')
    assert phrases == ["brown fox"]
    assert excluded == ["noise"]
    assert "hello" in rest and "world" in rest and "-noise" not in rest
    # mid-word hyphens are NOT exclusions
    rest, _, excluded = parse_query("state-of-the-art search")
    assert excluded == [] and "state-of-the-art" in rest
    # unclosed quote: lenient, terms survive as literals
    rest, phrases, _ = parse_query('broken "quote here')
    assert phrases == [] and "quote" in rest


def test_paragraph_excluded_terms(tmp_path):
    """-term drops documents containing the term before scoring."""
    s = build_para_searcher(tmp_path)
    base = s.search(ParagraphSearchRequest(query="quick", top_k=10))
    assert {h.rid for h in base.hits} == {"r1", "r2", "r3"}
    resp = s.search(ParagraphSearchRequest(query="quick -cat", top_k=10))
    assert {h.rid for h in resp.hits} == {"r1", "r3"}  # r2 contains "cat"
    resp = s.search(ParagraphSearchRequest(query="quick -cat -secret", top_k=10))
    assert {h.rid for h in resp.hits} == {"r1"}
    # exclusion of an absent term changes nothing
    resp = s.search(ParagraphSearchRequest(query="quick -zebra", top_k=10))
    assert {h.rid for h in resp.hits} == {"r1", "r2", "r3"}


def test_stopword_grade_query_terms(tmp_path):
    """Query terms present in nearly every document are dropped from OR
    queries (corpus-adaptive analogue of the reference's stop-word removal,
    stop_words.rs:94-110) — except the final term, preserved for suggest
    prefixing, and except under all_terms (AND) semantics."""
    from nucliadb_tpu.index.text_engine import engine as eng_mod

    resources = [
        make_resource(f"s{i}", f"the common filler words surround topic{i} here")
        for i in range(120)
    ]
    s = build_para_searcher(tmp_path, resources=resources)
    engine = s.engine
    tokens_of = lambda q: [t for t, _ in engine._plan_terms(q)[0]]

    # "the" appears in every doc -> dropped when not final
    q = eng_mod.TextQuery(text="the topic5")
    assert "the" not in tokens_of(q) and "topic5" in tokens_of(q)
    # final term is always preserved (suggest prefix role)
    q = eng_mod.TextQuery(text="topic5 the")
    assert "the" in tokens_of(q)
    # AND queries keep every term (dropping one changes the match set)
    q = eng_mod.TextQuery(text="the topic5", all_terms=True)
    assert "the" in tokens_of(q)
    # search still returns the right doc
    resp = s.search(ParagraphSearchRequest(query="the topic7", top_k=5))
    assert resp.hits and resp.hits[0].rid == "s7"


def test_suggest(tmp_path):
    s = build_para_searcher(tmp_path)
    hits = s.suggest("qui", top_k=5)
    assert hits and any(h.rid in ("r1", "r2", "r3") for h in hits)


def test_deletions(tmp_path):
    indexer = ParagraphIndexer()
    segs = []
    for i, r in enumerate(RESOURCES):
        m = indexer.index_resource(r, str(tmp_path / f"p{i}"))
        segs.append((m, Seq(i + 1)))
    s = ParagraphSearcher(
        SimpleOpenIndex(segment_list=segs, deletion_list=[("r1/", Seq(10))])
    )
    resp = s.search(ParagraphSearchRequest(query="quick", top_k=10))
    assert all(h.rid != "r1" for h in resp.hits)


def test_phrase_only_query(tmp_path):
    """Regression: phrase-only queries used to fall into the pure-filter
    path and return arbitrary documents."""
    s = build_para_searcher(tmp_path)
    resp = s.search(ParagraphSearchRequest(query='"lazy dog"', top_k=10))
    assert len(resp.hits) == 1 and resp.hits[0].rid == "r1"
    assert all(h.score > 0 for h in resp.hits)
    resp2 = s.search(ParagraphSearchRequest(query='"no such phrase here"', top_k=10))
    assert resp2.hits == []


def test_field_deletion_does_not_hit_sibling_prefix(tmp_path):
    """Regression: deleting field f1 must not delete f10."""
    from nucliadb_tpu.index.text_engine import DeviceTextEngine, TextQuery
    from nucliadb_tpu.index.text_engine.builder import DocEntry, build_segment, open_text_segment

    docs = [
        DocEntry(key="r1/t/f1", text="alpha content"),
        DocEntry(key="r1/t/f10", text="beta content"),
    ]
    meta = build_segment(str(tmp_path / "s"), docs, kind="text")
    seg = open_text_segment(meta.path)
    from nucliadb_tpu.types import Seq

    engine = DeviceTextEngine([(seg, Seq(1))], deletions=[("r1/t/f1", Seq(2))])
    hits, _ = engine.search(TextQuery(text="content", top_k=10))
    assert [h.key for h in hits] == ["r1/t/f10"]


def test_all_terms_with_capped_tiers(tmp_path):
    """Regression: all_terms must stay satisfiable when tier caps drop terms,
    but stay unsatisfiable when a term is missing from the dictionary."""
    from nucliadb_tpu.index.text_engine import DeviceTextEngine, TextQuery
    from nucliadb_tpu.index.text_engine.builder import DocEntry, build_segment, open_text_segment
    from nucliadb_tpu.types import Seq

    docs = [DocEntry(key="r/a", text=" ".join(f"t{i}" for i in range(12)))]
    meta = build_segment(str(tmp_path / "s"), docs, kind="text")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
    # 12 known terms, all tier-0 (cap 32): plain AND works
    q = " ".join(f"t{i}" for i in range(12))
    hits, _ = engine.search(TextQuery(text=q, top_k=5, all_terms=True))
    assert len(hits) == 1
    # one unknown term -> unsatisfiable
    hits2, _ = engine.search(TextQuery(text=q + " unknownterm", top_k=5, all_terms=True))
    assert hits2 == []


def test_key_prefix_filter_across_unsorted_segments(tmp_path):
    """A later segment whose keys sort BELOW an earlier segment's must not
    break prefix filtering (regression: the consolidated key list is only
    per-segment sorted; a global bisect matched wrong rows)."""
    from nucliadb_tpu.index.text_engine import (
        DeviceTextEngine, TextQuery, build_segment, open_text_segment,
    )
    from nucliadb_tpu.index.text_engine.builder import DocEntry
    from nucliadb_tpu.types import Seq

    # segment 1 has keys starting 'm...', segment 2 'a...' (sorts below)
    seg1 = [DocEntry(key=f"mmm{i}/f", text="quick fox", facets=[]) for i in range(3)]
    seg2 = [DocEntry(key=f"aaa{i}/f", text="quick dog", facets=[]) for i in range(3)]
    m1 = build_segment(str(tmp_path / "s1"), seg1, kind="text")
    m2 = build_segment(str(tmp_path / "s2"), seg2, kind="text")
    engine = DeviceTextEngine(
        [(open_text_segment(m1.path), Seq(1)), (open_text_segment(m2.path), Seq(2))]
    )

    pids = engine.key_prefix_postings(["aaa1/"])
    assert [engine.keys[p] for p in pids] == ["aaa1/f"]
    pids = engine.key_prefix_postings(["mmm0"])
    assert [engine.keys[p] for p in pids] == ["mmm0/f"]

    hits, _ = engine.search(TextQuery(text="quick", top_k=10, key_prefixes=["aaa0/"]))
    assert {h.key for h in hits} == {"aaa0/f"}


def test_vector_key_prefix_across_unsorted_segments(rng, tmp_path):
    from nucliadb_tpu.index.vector import (
        Elem, VectorConfig, VectorSearcher, VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.segment import create_segment
    from nucliadb_tpu.types import Seq, SimpleOpenIndex

    d = 16
    v = rng.standard_normal((6, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d)
    m1 = create_segment(
        str(tmp_path / "s1"),
        [Elem(key=f"mmm{i}/f/0/0-1", vectors=v[i : i + 1]) for i in range(3)],
        cfg,
    )
    m2 = create_segment(
        str(tmp_path / "s2"),
        [Elem(key=f"aaa{i}/f/0/0-1", vectors=v[3 + i : 4 + i]) for i in range(3)],
        cfg,
    )
    searcher = VectorSearcher(
        cfg, SimpleOpenIndex(segment_list=[(m1, Seq(1)), (m2, Seq(2))])
    )
    pids = searcher.index.key_prefix_postings(["aaa1/"])
    assert [searcher.index.keys[p] for p in pids] == ["aaa1/f/0/0-1"]


def test_phrase_total_and_deep_pagination(tmp_path):
    """Regression: with quoted phrases, total was capped at the 4x over-fetch
    window (so ~1000 matches reported as <=80) and deep pages came up empty."""
    n = 120
    resources = [
        make_resource(f"p{i:03d}", f"machine learning topic {i} trains models")
        for i in range(n)
    ] + [
        make_resource(f"q{i:03d}", f"unrelated document {i} about learning only")
        for i in range(10)
    ]
    s = build_para_searcher(tmp_path, resources)
    # every matching resource has 2 paragraphs; the phrase lands in the first
    expected = sum(
        1
        for r in resources
        for key, p in r.paragraphs["t/text1"].items()
        if "machine learning" in r.texts["t/text1"].text[p.start : p.end]
    )
    assert expected >= n  # sanity: the corpus really contains > window matches

    resp = s.search(ParagraphSearchRequest(query='"machine learning"', top_k=5))
    assert resp.total == expected, (resp.total, expected)
    assert len(resp.hits) == 5

    # a page past the old 4x window must still be full
    deep = s.search(
        ParagraphSearchRequest(query='"machine learning"', top_k=5, offset=100)
    )
    assert deep.total == expected
    assert len(deep.hits) == 5
    assert not {h.paragraph_id for h in deep.hits} & {
        h.paragraph_id for h in resp.hits
    }


def test_rare_phrase_deep_pagination(tmp_path):
    """Phrases are a pre-scoring MUST mask (r5): a phrase rarer than the
    page size must still fill deep pages exactly and report the exact
    corpus-wide total — the shape that used to grow the fetch window to
    n_docs."""
    from nucliadb_tpu.index.text_engine.builder import DocEntry
    from nucliadb_tpu.index.text_engine import build_segment
    from nucliadb_tpu.index.paragraph import (
        ParagraphSearcher,
        ParagraphSearchRequest,
    )
    from nucliadb_tpu.types import Seq, SimpleOpenIndex
    import numpy as np

    rng = np.random.default_rng(3)
    filler = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    entries = []
    planted = []
    for i in range(3000):
        toks = list(rng.choice(filler, size=8))
        if i % 250 == 0:  # 12 docs carry the phrase
            toks[2:4] = ["golf", "hotel"]
            planted.append(i)
        # decoys containing both words NON-consecutively
        if i % 97 == 0:
            toks[0], toks[-1] = "golf", "hotel"
        entries.append(DocEntry(key=f"r{i}/t/t/0-10", text=" ".join(toks)))
    meta = build_segment(str(tmp_path / "seg"), entries, kind="paragraph")
    para = ParagraphSearcher(SimpleOpenIndex(segment_list=[(meta, Seq(1))]))

    page1 = para.search(
        ParagraphSearchRequest(query='"golf hotel" alpha', top_k=5)
    )
    assert page1.total == len(planted)
    page2 = para.search(
        ParagraphSearchRequest(query='"golf hotel" alpha', top_k=5, offset=5)
    )
    page3 = para.search(
        ParagraphSearchRequest(query='"golf hotel" alpha', top_k=5, offset=10)
    )
    ids = [h.paragraph_id for h in page1.hits + page2.hits + page3.hits]
    assert len(ids) == len(planted) and len(set(ids)) == len(planted)
    got_docs = {int(p.split("/")[0][1:]) for p in ids}
    assert got_docs == set(planted)
