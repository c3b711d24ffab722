import numpy as np
import pytest

from nucliadb_tpu.index.text_engine import (
    DeviceTextEngine,
    TextQuery,
    build_segment,
    open_text_segment,
    tokenize,
)
from nucliadb_tpu.index.text_engine.builder import DocEntry, merge_text_segments
from nucliadb_tpu.index.text_engine.fuzzy import FuzzyIndex, levenshtein_leq
from nucliadb_tpu.query_language import LabelAtom, and_, not_
from nucliadb_tpu.types import Seq, SimpleOpenIndex

DOCS = [
    ("r1/f1", "the quick brown fox jumps over the lazy dog", ["/t/t"]),
    ("r1/f2", "a quick brown cat sleeps", ["/t/t"]),
    ("r2/f1", "the lazy dog sleeps all day", ["/t/a"]),
    ("r3/f1", "foxes are quick and brown animals", ["/t/a"]),
    ("r4/f1", "nothing in common here", ["/t/t"]),
]


def make_engine(tmp_path, docs=DOCS, n_segments=1):
    per = (len(docs) + n_segments - 1) // n_segments
    segs = []
    for s in range(n_segments):
        chunk = docs[s * per : (s + 1) * per]
        if not chunk:
            continue
        entries = [
            DocEntry(key=k, text=t, facets=f, columns={"created": 1000 + i})
            for i, (k, t, f) in enumerate(chunk)
        ]
        meta = build_segment(str(tmp_path / f"ts{s}"), entries, kind="text")
        segs.append((open_text_segment(meta.path), Seq(s + 1)))
    return DeviceTextEngine(segs)


def bm25_reference(docs_texts, query_terms, k1=1.2, b=0.75):
    """Plain-python BM25 for oracle comparison (Lucene idf)."""
    toks = [tokenize(t) for t in docs_texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    scores = np.zeros(n)
    for term in query_terms:
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        idf = np.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                scores[d] += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
    return scores


def test_tokenizer():
    assert tokenize("Hello, World! it's 42") == ["hello", "world", "it", "s", "42"]


def test_segment_roundtrip(tmp_path):
    entries = [DocEntry(key="a/b", text="hello world hello", facets=["/t/t"])]
    meta = build_segment(str(tmp_path / "s"), entries, kind="text")
    seg = open_text_segment(meta.path)
    assert seg.keys == ["a/b"]
    assert seg.terms == ["hello", "world"]
    ti = seg.terms.index("hello")
    lo, hi = seg.postings_offsets[ti], seg.postings_offsets[ti + 1]
    assert seg.postings_tfs[lo:hi].tolist() == [2]
    assert seg.dlen[0] == 3


def test_bm25_matches_reference(tmp_path):
    engine = make_engine(tmp_path)
    hits, matched = engine.search(TextQuery(text="quick brown", top_k=10))
    ref = bm25_reference([d[1] for d in DOCS], ["quick", "brown"])
    # keys sorted at build; DOCS keys already sorted
    got = {h.key: h.score for h in hits}
    for i, (key, text, _) in enumerate(DOCS):
        if ref[i] > 0:
            assert key in got
            np.testing.assert_allclose(got[key], ref[i], rtol=1e-4)
        else:
            assert key not in got
    # ranking correct
    order = [h.key for h in hits]
    expected = [DOCS[i][0] for i in np.argsort(-ref) if ref[i] > 0]
    assert order == expected


def test_bm25_multisegment_equals_single(tmp_path):
    e1 = make_engine(tmp_path / "a", n_segments=1)
    e2 = make_engine(tmp_path / "b", n_segments=3)
    h1, _ = e1.search(TextQuery(text="lazy dog", top_k=10))
    h2, _ = e2.search(TextQuery(text="lazy dog", top_k=10))
    assert [(h.key, round(h.score, 4)) for h in h1] == [
        (h.key, round(h.score, 4)) for h in h2
    ]


def test_and_semantics(tmp_path):
    engine = make_engine(tmp_path)
    hits, _ = engine.search(TextQuery(text="quick dog", top_k=10, all_terms=True))
    assert [h.key for h in hits] == ["r1/f1"]  # only doc with both
    hits_or, _ = engine.search(TextQuery(text="quick dog", top_k=10))
    assert len(hits_or) == 4


def test_facet_filter(tmp_path):
    engine = make_engine(tmp_path)
    hits, _ = engine.search(
        TextQuery(text="quick", top_k=10, filter=LabelAtom("/t/a"))
    )
    assert [h.key for h in hits] == ["r3/f1"]
    hits2, _ = engine.search(
        TextQuery(text="quick", top_k=10, filter=not_(LabelAtom("/t/a")))
    )
    assert all(h.key in ("r1/f1", "r1/f2") for h in hits2)


def test_key_prefix_filter_and_deletions(tmp_path):
    entries = [
        DocEntry(key=k, text=t, facets=f) for k, t, f in DOCS
    ]
    meta = build_segment(str(tmp_path / "s"), entries, kind="text")
    open_index = [(open_text_segment(meta.path), Seq(1))]
    engine = DeviceTextEngine(open_index, deletions=[("r1/", Seq(2))])
    hits, _ = engine.search(TextQuery(text="quick", top_k=10))
    assert all(not h.key.startswith("r1/") for h in hits)
    engine2 = DeviceTextEngine(open_index, deletions=[("r1/", Seq(1))])  # same seq: kept
    hits2, _ = engine2.search(TextQuery(text="quick", top_k=10))
    assert any(h.key.startswith("r1/") for h in hits2)


def test_fuzzy_search(tmp_path):
    engine = make_engine(tmp_path)
    hits, _ = engine.search(TextQuery(text="quikc", top_k=10))  # typo, no fuzzy
    assert hits == []
    hits_f, _ = engine.search(TextQuery(text="quick", top_k=10, fuzzy=True))
    assert len(hits_f) >= 3
    hits_typo, _ = engine.search(TextQuery(text="qick", top_k=10, fuzzy=True))
    assert any(h.key == "r1/f1" for h in hits_typo)


def test_fuzzy_index():
    fi = FuzzyIndex(["quick", "quack", "brown", "browns", "crown"])
    assert fi.expand("quick", 1) == ["quack", "quick"]  # one substitution apart
    assert fi.expand("quic", 1) == ["quick"]
    assert set(fi.expand("brown", 1)) == {"brown", "browns", "crown"}
    assert levenshtein_leq("kitten", "sitten", 1)
    assert not levenshtein_leq("kitten", "sitting", 2)


def test_fuzzy_expansion_cap(tmp_path):
    """An adversarial vocabulary (serial ids: every digit substitution is a
    real term) must not schedule unbounded posting rows: expansion is capped
    at MAX_EXPANSIONS keeping the highest-df neighbors (Lucene
    maxExpansions=50 behavior), and the exact token always survives."""
    from nucliadb_tpu.index.text_engine.engine import MAX_EXPANSIONS

    docs = [(f"r{i}/f", " ".join(f"w{j:04d}" for j in range(i, i + 5)), ["/t/t"])
            for i in range(400)]
    # make w0042 the dominant neighbor of w0041's d=1 ball
    docs += [(f"hot{i}/f", "w0042 filler", ["/t/t"]) for i in range(50)]
    engine = make_engine(tmp_path, docs=docs)
    out = engine.fuzzy_expand("w0041", 1)
    assert len(out) <= MAX_EXPANSIONS
    assert "w0041" in out  # exact token survives the cap
    assert "w0042" in out  # highest-df neighbor kept


def test_phrase_match(tmp_path):
    engine = make_engine(tmp_path)
    # "lazy dog" consecutive in r1/f1 and r2/f1
    did1 = engine.keys.index("r1/f1")
    did3 = engine.keys.index("r3/f1")
    assert engine.phrase_match(did1, ["lazy", "dog"])
    assert not engine.phrase_match(did1, ["dog", "lazy"])
    assert not engine.phrase_match(did3, ["lazy", "dog"])
    assert engine.phrase_match(did1, ["quick", "brown", "fox"])


def test_pure_filter_query(tmp_path):
    engine = make_engine(tmp_path)
    hits, matched = engine.search(
        TextQuery(text="", only_faceted=True, filter=LabelAtom("/t/t"), top_k=10)
    )
    assert {h.key for h in hits} == {"r1/f1", "r1/f2", "r4/f1"}
    assert matched.sum() == 3


def test_matched_bitmap_for_facets(tmp_path):
    engine = make_engine(tmp_path)
    _, matched = engine.search(TextQuery(text="sleeps", top_k=10))
    # facet counting host-side
    count_t = matched[engine.facet_postings("/t/t")].sum()
    count_a = matched[engine.facet_postings("/t/a")].sum()
    assert (count_t, count_a) == (1, 1)


def test_merge_text_segments(tmp_path):
    e = [DocEntry(key=k, text=t, facets=f) for k, t, f in DOCS[:2]]
    e2 = [DocEntry(key=k, text=t, facets=f) for k, t, f in DOCS[2:]]
    m1 = build_segment(str(tmp_path / "s1"), e, kind="text")
    m2 = build_segment(str(tmp_path / "s2"), e2, kind="text")
    open_index = SimpleOpenIndex(
        segment_list=[(m1, Seq(1)), (m2, Seq(2))],
        deletion_list=[("r4/", Seq(3))],
    )
    merged = merge_text_segments(str(tmp_path / "m"), open_index, kind="text")
    assert merged.records == 4
    seg = open_text_segment(merged.path)
    engine = DeviceTextEngine([(seg, Seq(4))])
    hits, _ = engine.search(TextQuery(text="quick brown", top_k=10))
    ref = bm25_reference([d[1] for d in DOCS[:4]], ["quick", "brown"])
    got = {h.key: h.score for h in hits}
    for i in range(4):
        if ref[i] > 0:
            np.testing.assert_allclose(got[DOCS[i][0]], ref[i], rtol=1e-4)


def test_search_batch_matches_single(tmp_path):
    engine = make_engine(tmp_path)
    queries = [
        TextQuery(text="quick brown", top_k=10),
        TextQuery(text="lazy dog", top_k=10),
        TextQuery(text="sleeps", top_k=10, filter=LabelAtom("/t/t")),
    ]
    batched = engine.search_batch(queries)
    for q, (bhits, bmatched) in zip(queries, batched):
        shits, smatched = engine.search(q)
        assert [(h.key, round(h.score, 5)) for h in bhits] == [
            (h.key, round(h.score, 5)) for h in shits
        ]
        assert (bmatched == smatched).all()
    with pytest.raises(ValueError):
        engine.search_batch([TextQuery(text="  ")])


def test_all_terms_fuzzy_does_not_cross_satisfy(tmp_path):
    """Regression: with fuzzy on, two variants of ONE token must not satisfy
    a two-token AND query (exact AND verifies per-token groups)."""
    entries = [
        DocEntry(key="r1/f", text="hello hellos greeting", facets=[]),
        DocEntry(key="r2/f", text="hello world greeting", facets=[]),
    ]
    meta = build_segment(str(tmp_path / "s"), entries, kind="text")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
    hits, _ = engine.search(
        TextQuery(text="hello world", top_k=10, all_terms=True, fuzzy=True)
    )
    assert {h.key for h in hits} == {"r2/f"}
    # fuzzy still matches typos of each token independently
    hits, _ = engine.search(
        TextQuery(text="helo world", top_k=10, all_terms=True, fuzzy=True)
    )
    assert {h.key for h in hits} == {"r2/f"}


def test_merge_equals_fresh_build(tmp_path):
    """The vectorized postings-level merge must produce the SAME segment a
    fresh build from the alive docs' original texts would (keys, terms,
    CSR postings, positions, dlen, facets, columns)."""
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(60)]
    docs = []
    for i in range(80):
        text = " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        docs.append(
            DocEntry(
                key=f"r{i:03d}/f{i % 3}",
                text=text,
                facets=[f"/l/{i % 4}"] + (["/t/t"] if i % 2 else []),
                columns={"created": 100 + i},
            )
        )
    splits = [docs[:30], docs[30:55], docs[55:]]
    segs = []
    for s, chunk in enumerate(splits):
        m = build_segment(str(tmp_path / f"s{s}"), chunk, kind="text")
        segs.append((m, Seq(s + 1)))
    deletions = [("r000", Seq(4)), ("r060", Seq(4)), ("r007/f1", Seq(4))]
    open_index = SimpleOpenIndex(segment_list=segs, deletion_list=deletions)
    merged = merge_text_segments(str(tmp_path / "m"), open_index, kind="text")

    from nucliadb_tpu.utils.keys import key_matches_prefix

    alive = [
        d for d in docs
        if not any(key_matches_prefix(d.key, p) for p, _ in deletions)
    ]
    fresh = build_segment(str(tmp_path / "fresh"), alive, kind="text")
    a = open_text_segment(merged.path)
    b = open_text_segment(fresh.path)
    assert a.keys == b.keys
    assert a.terms == b.terms
    np.testing.assert_array_equal(a.postings_offsets, b.postings_offsets)
    np.testing.assert_array_equal(a.postings_docs, b.postings_docs)
    np.testing.assert_array_equal(a.postings_tfs, b.postings_tfs)
    np.testing.assert_array_equal(a.positions_offsets, b.positions_offsets)
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.dlen, b.dlen)
    assert set(a.facets) == set(b.facets)
    for f in a.facets:
        np.testing.assert_array_equal(np.sort(a.facets[f]), np.sort(b.facets[f]))
    assert set(a.columns) == set(b.columns)
    for c in a.columns:
        np.testing.assert_array_equal(a.columns[c], b.columns[c])


def test_search_batch_applies_exclusions(tmp_path):
    """Regression: -term exclusions must apply on the batched path too (the
    unfiltered fast path used to skip build_mask for excluded-only queries)."""
    engine = make_engine(tmp_path)
    q = TextQuery(text="quick", excluded=["brown"], top_k=10)
    (bhits, _), = engine.search_batch([q])
    shits, _ = engine.search(q)
    assert {h.key for h in bhits} == {h.key for h in shits}
    assert all("brown" not in DOCS[h.doc_id][1] for h in bhits)


def test_fuzzy_depth2_index_complete(tmp_path):
    from nucliadb_tpu.index.text_engine.fuzzy import FuzzyIndex

    # +2-length neighbour: only reachable when the index stores depth-2
    # deletion variants; a depth-1 index must CLAMP to d=1 (complete set),
    # not return a silently incomplete d=2 neighborhood
    fi2 = FuzzyIndex(["abcde", "abc", "xbc"], max_distance=2)
    assert fi2.expand("abc", 2) == ["abc", "abcde", "xbc"]
    fi1 = FuzzyIndex(["abcde", "abc", "xbc"], max_distance=1)
    assert fi1.expand("abc", 2) == fi1.expand("abc", 1)


def test_open_segment_cache_sweeps_dead_paths(tmp_path):
    """Merged-away segments get their local dirs pruned by the searcher
    sync; the open-segment cache must release those entries (mmaps +
    unpacked keys) instead of pinning them to the cap — caught by a
    30-minute soak growing RSS on retained dead segments."""
    import shutil

    import nucliadb_tpu.index.text_engine.builder as b
    from nucliadb_tpu.index.text_engine.builder import (
        DocEntry,
        build_segment,
        open_text_segment,
    )

    with b._OPEN_CACHE_LOCK:
        b._OPEN_CACHE.clear()
    dead_dirs = []
    for i in range(3):
        d = str(tmp_path / f"dead{i}")
        build_segment(d, [DocEntry(key=f"r{i}/t/t/0-1", text="alpha beta")],
                      kind="paragraph")
        open_text_segment(d)
        dead_dirs.append(d)
    for d in dead_dirs:
        shutil.rmtree(d)  # the searcher sync's desired-vs-local prune
    # enough inserts to cross a sweep boundary
    for i in range(b._SWEEP_EVERY + 2):
        d = str(tmp_path / f"live{i}")
        build_segment(d, [DocEntry(key=f"x{i}/t/t/0-1", text="gamma")],
                      kind="paragraph")
        open_text_segment(d)
    with b._OPEN_CACHE_LOCK:
        cached_paths = {k[0] for k in b._OPEN_CACHE}
    for d in dead_dirs:
        assert not any(p.startswith(str(tmp_path / "dead")) for p in cached_paths), (
            d, cached_paths)
