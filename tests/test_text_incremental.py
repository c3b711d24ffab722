"""Incremental text-engine refresh (overlay) correctness + upload scaling.

The searcher-sync fast path consolidates only appended segments into an
overlay on top of the previous engine's base arenas (engine.py
``_try_extend``). These tests pin: result parity with a full rebuild,
deletion handling, chained refreshes, the overlay dense block, merge
fallback, and that host->device upload volume scales with the delta —
the p95-under-ingest guarantee (parity target: incremental segment sync,
nidx/src/searcher/sync.rs:57-219).
"""

import numpy as np
import pytest

from nucliadb_tpu.index.text_engine import (
    DeviceTextEngine,
    TextQuery,
    build_segment,
    open_text_segment,
    tokenize,
)
from nucliadb_tpu.index.text_engine import engine as engine_mod
from nucliadb_tpu.index.text_engine.builder import DocEntry
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import Seq

from test_text_engine import bm25_reference

BASE_DOCS = [
    ("r1/f1", "the quick brown fox jumps over the lazy dog", ["/t/t"]),
    ("r1/f2", "a quick brown cat sleeps", ["/t/t"]),
    ("r2/f1", "the lazy dog sleeps all day", ["/t/a"]),
    ("r3/f1", "foxes are quick and brown animals", ["/t/a"]),
]

# mixes existing terms (quick, dog) with overlay-only terms (zebra, quasar)
DELTA_DOCS = [
    ("r5/f1", "a quick zebra naps beside the dog", ["/t/t"]),
    ("r6/f1", "quasar zebra observations", ["/t/a"]),
]


def _seg(tmp_path, name, docs, created0=1000):
    entries = [
        DocEntry(key=k, text=t, facets=f, columns={"created": created0 + i})
        for i, (k, t, f) in enumerate(docs)
    ]
    meta = build_segment(str(tmp_path / name), entries, kind="text")
    return open_text_segment(meta.path)


def _engines(tmp_path, deletions=()):
    """(incremental engine built via prev, full-built engine) over
    BASE_DOCS + DELTA_DOCS."""
    s1 = _seg(tmp_path, "s1", BASE_DOCS)
    s2 = _seg(tmp_path, "s2", DELTA_DOCS, created0=2000)
    base = DeviceTextEngine([(s1, Seq(1))], deletions)
    inc = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))], deletions, prev=base)
    full = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))], deletions)
    # the incremental path reuses the previous engine's group as-is and
    # consolidates only the delta into a fresh group
    assert len(inc.groups) == 2 and inc.reused_groups == 1
    assert inc.groups[0] is base.groups[0]
    assert inc.groups[0].n_docs == len(BASE_DOCS)
    return inc, full


def _assert_same_results(inc, full, query):
    hi, mi = inc.search(query)
    hf, mf = full.search(query)
    assert [(h.key, round(h.score, 4)) for h in hi] == [
        (h.key, round(h.score, 4)) for h in hf
    ], query
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mf))


QUERIES = [
    TextQuery(text="quick dog", top_k=10),
    TextQuery(text="zebra", top_k=10),  # overlay-only term
    TextQuery(text="quick zebra", top_k=10, all_terms=True),
    TextQuery(text="quasat", top_k=10, fuzzy=True),  # typo of overlay term
    TextQuery(text="quick", top_k=10, filter=LabelAtom("/t/a")),
    TextQuery(text="sleeps naps", top_k=10),
]


def test_incremental_matches_full(tmp_path):
    inc, full = _engines(tmp_path)
    for q in QUERIES:
        _assert_same_results(inc, full, q)
    # scores also match the plain-python oracle (idf over the COMBINED df)
    texts = [d[1] for d in BASE_DOCS + DELTA_DOCS]
    ref = bm25_reference(texts, ["quick", "zebra"])
    got = {h.key: h.score for h in inc.search(TextQuery(text="quick zebra", top_k=10))[0]}
    for i, (key, _, _) in enumerate(BASE_DOCS + DELTA_DOCS):
        if ref[i] > 0:
            np.testing.assert_allclose(got[key], ref[i], rtol=1e-4)


def test_incremental_batch_matches_single(tmp_path):
    inc, _ = _engines(tmp_path)
    scored = [q for q in QUERIES if q.text.strip()]
    for q, (bh, bm) in zip(scored, inc.search_batch(scored)):
        sh, sm = inc.search(q)
        assert [(h.key, round(h.score, 4)) for h in bh] == [
            (h.key, round(h.score, 4)) for h in sh
        ]


def test_incremental_new_deletion_hits_base_docs(tmp_path):
    """A deletion arriving WITH the refresh kills base docs (seq ordering:
    deletions apply to segments with seq < deletion seq)."""
    s1 = _seg(tmp_path, "s1", BASE_DOCS)
    s2 = _seg(tmp_path, "s2", DELTA_DOCS)
    base = DeviceTextEngine([(s1, Seq(1))])
    dels = [("r1/", Seq(2))]
    inc = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(3))], dels, prev=base)
    full = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(3))], dels)
    assert inc.reused_groups == 1  # the deletion masks, it does not rebuild
    for q in QUERIES:
        _assert_same_results(inc, full, q)
    hits, _ = inc.search(TextQuery(text="quick", top_k=10))
    assert all(not h.key.startswith("r1/") for h in hits)


def test_incremental_chain_and_merge_fallback(tmp_path):
    """Refresh -> refresh keeps one overlay (rebuilt from all deltas);
    replacing base segments falls back to the full build."""
    s1 = _seg(tmp_path, "s1", BASE_DOCS)
    s2 = _seg(tmp_path, "s2", DELTA_DOCS[:1])
    s3 = _seg(tmp_path, "s3", DELTA_DOCS[1:])
    e0 = DeviceTextEngine([(s1, Seq(1))])
    e1 = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))], prev=e0)
    e2 = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2)), (s3, Seq(3))], prev=e1)
    # [s1] (the frozen full-width cold group) reuses; the small open pool
    # re-consolidates to cover s2+s3 (it stays below the freeze bar)
    assert e2.reused_groups == 1 and len(e2.groups) == 2
    assert e2.groups[0] is e0.groups[0]
    full = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2)), (s3, Seq(3))])
    for q in QUERIES:
        _assert_same_results(e2, full, q)

    # a merge replacing every segment -> nothing reusable -> one solo group
    merged = _seg(tmp_path, "m", BASE_DOCS + DELTA_DOCS)
    e3 = DeviceTextEngine([(merged, Seq(4))], prev=e2)
    assert e3.reused_groups == 0 and len(e3.groups) == 1
    for q in QUERIES:
        _assert_same_results(e3, full, q)


def test_overlay_dense_block(tmp_path, monkeypatch):
    """Terms whose overlay df exceeds the top overlay tier width go to the
    local dense block; scores must still match the full build."""
    monkeypatch.setattr(engine_mod, "OVERLAY_TIER_WIDTHS", (2, 4))
    monkeypatch.setattr(engine_mod, "OVERLAY_QUERY_CAP", (4, 4))
    delta = [
        (f"rD{i}/f1", "zebra stripes " + ("zebra " * (i % 3)), []) for i in range(8)
    ]  # df(zebra)=8 > 4 -> dense
    s1 = _seg(tmp_path, "s1", BASE_DOCS)
    s2 = _seg(tmp_path, "s2", delta)
    base = DeviceTextEngine([(s1, Seq(1))])
    inc = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))], prev=base)
    assert inc.groups[1].dense_dev is not None
    assert inc.groups[1].term_info["zebra"][0] == -1  # dense slot
    full = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))])
    for text in ("zebra", "zebra stripes", "quick zebra"):
        _assert_same_results(inc, full, TextQuery(text=text, top_k=16))


def test_vocabulary_helpers_cover_overlay(tmp_path):
    inc, _ = _engines(tmp_path)
    assert inc.has_term("zebra") and inc.has_term("quick")
    assert inc.term_df("quick") == 4  # 3 base + 1 overlay
    assert "zebra" in inc.prefix_terms("ze")
    assert "quasar" in inc.fuzzy_expand("quasat", 1)


def test_incremental_upload_scales_with_delta(tmp_path):
    """The refresh's host->device bytes must scale with the appended docs,
    not the corpus (the round-1 soak's p95 tail was the O(corpus)
    re-upload per sync)."""
    rng = np.random.default_rng(0)
    vocab = [f"w{i:04d}" for i in range(400)]
    big = [
        (
            f"rb{i:05d}/f1",
            " ".join(rng.choice(vocab, size=20)),
            [],
        )
        for i in range(3000)
    ]
    delta = [
        (f"rd{i:05d}/f1", " ".join(rng.choice(vocab, size=20)), [])
        for i in range(30)
    ]
    s1 = _seg(tmp_path, "s1", big)
    s2 = _seg(tmp_path, "s2", delta)

    before = engine_mod.UPLOAD_BYTES
    base = DeviceTextEngine([(s1, Seq(1))])
    full_cost = engine_mod.UPLOAD_BYTES - before

    before = engine_mod.UPLOAD_BYTES
    inc = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))], prev=base)
    inc_cost = engine_mod.UPLOAD_BYTES - before

    assert inc.reused_groups == 1
    assert inc_cost < full_cost / 10, (inc_cost, full_cost)

    # and it still answers correctly
    full = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))])
    q = TextQuery(text=f"{vocab[0]} {vocab[1]}", top_k=10)
    _assert_same_results(inc, full, q)


def test_adaptive_caps_score_all_terms(tmp_path):
    """A query with more distinct terms than the default per-tier caps must
    still score EVERY term (capacities double instead of silently dropping
    the lowest-idf terms — parity: tantivy scores all terms)."""
    rng = np.random.default_rng(1)
    vocab = [f"t{i:03d}" for i in range(60)]
    docs = [
        (f"r{i:03d}/f1", " ".join(rng.choice(vocab, size=12)), [])
        for i in range(50)
    ]
    s1 = _seg(tmp_path, "s", docs)
    engine = DeviceTextEngine([(s1, Seq(1))])
    query_terms = vocab[:48]  # well past TIER_QUERY_CAP[0]=32
    q = TextQuery(text=" ".join(query_terms), top_k=50)
    hits, _ = engine.search(q)
    ref = bm25_reference([d[1] for d in docs], query_terms)
    got = {h.key: h.score for h in hits}
    for i, (key, _, _) in enumerate(docs):
        if ref[i] > 0:
            assert key in got, key
            np.testing.assert_allclose(got[key], ref[i], rtol=1e-4)

    # AND over many terms: the doc containing all of them must match
    alldoc = [("rall/f1", " ".join(vocab[:40]), [])]
    s2 = _seg(tmp_path, "s2", alldoc)
    e2 = DeviceTextEngine([(s1, Seq(1)), (s2, Seq(2))])
    q_and = TextQuery(text=" ".join(vocab[:40]), top_k=5, all_terms=True)
    hits, _ = e2.search(q_and)
    assert "rall/f1" in {h.key for h in hits}


def test_group_freeze_and_merge_reuse(tmp_path, monkeypatch):
    """The r3 group-arena structure: big segments hold their own frozen
    groups (later refreshes reuse them untouched — even when a merge
    upstream SHIFTS their positions), the small-segment pool re-consolidates
    until it freezes at the bar, and uploads scale with the changed group,
    not the corpus (the reference searcher's incremental per-segment sync
    posture, nidx/src/searcher/sync.rs:57-219)."""
    monkeypatch.setattr(engine_mod, "GROUP_MIN_DOCS", 4)
    monkeypatch.setattr(engine_mod, "FRESH_FREEZE_DOCS", 4)
    rng = np.random.default_rng(2)
    vocab = [f"w{i:03d}" for i in range(100)]

    def docs(prefix, n):
        return [
            (f"{prefix}{i:03d}/f1", " ".join(rng.choice(vocab, size=12)), [])
            for i in range(n)
        ]

    runs = [docs(f"r{j}", 5) for j in range(4)]  # 5 >= GROUP_MIN: big
    segs = [_seg(tmp_path, f"s{j}", d) for j, d in enumerate(runs)]

    e = DeviceTextEngine([(segs[0], Seq(1))])
    for j in range(1, 4):
        e = DeviceTextEngine(
            [(s, Seq(i + 1)) for i, s in enumerate(segs[: j + 1])], prev=e
        )
    assert len(e.groups) == 4 and e.reused_groups == 3

    full = DeviceTextEngine([(s, Seq(i + 1)) for i, s in enumerate(segs)])
    for text in ("w001 w002", f"{vocab[3]} {vocab[4]} {vocab[5]}"):
        _assert_same_results(e, full, TextQuery(text=text, top_k=20))

    # a merge replacing the FIRST two segments: later groups reuse even
    # though their positions shift (doc ids are group-local + offset)
    merged = _seg(tmp_path, "m01", runs[0] + runs[1])
    before = engine_mod.UPLOAD_BYTES
    em = DeviceTextEngine(
        [(merged, Seq(5))]
        + [(s, Seq(i + 3)) for i, s in enumerate(segs[2:])],
        prev=e,
    )
    merge_cost = engine_mod.UPLOAD_BYTES - before
    assert em.reused_groups == 2 and len(em.groups) == 3
    before = engine_mod.UPLOAD_BYTES
    ref = DeviceTextEngine(
        [(merged, Seq(5))]
        + [(s, Seq(i + 3)) for i, s in enumerate(segs[2:])],
    )
    cold_cost = engine_mod.UPLOAD_BYTES - before
    assert merge_cost < cold_cost, (merge_cost, cold_cost)
    for text in ("w001 w002", f"{vocab[7]} {vocab[9]}"):
        _assert_same_results(em, ref, TextQuery(text=text, top_k=20))
    # host-side invariants across shifted groups
    assert em.keys == ref.keys
    hit = em.search(TextQuery(text=vocab[1], top_k=5))[0]
    for h in hit:
        sidx, soff = em.doc_seg[h.doc_id]
        assert em.segments[sidx].keys[h.doc_id - soff] == h.key

    # small segments POOL per refresh (no per-segment group churn), then
    # freeze at the bar and reuse from there on
    smalls = [_seg(tmp_path, f"sm{j}", docs(f"q{j}", 3)) for j in range(3)]
    base_list = [(merged, Seq(5))] + [
        (s, Seq(i + 3)) for i, s in enumerate(segs[2:])
    ]
    e1 = DeviceTextEngine(base_list + [(smalls[0], Seq(10))], prev=em)
    assert len(e1.groups) == 4  # open pool [sm0]
    e2 = DeviceTextEngine(
        base_list + [(s, Seq(10 + j)) for j, s in enumerate(smalls[:2])],
        prev=e1,
    )
    # [sm0, sm1] = 6 docs >= 4 -> frozen; the open pool re-consolidated
    # (no reuse of the 3-doc open run)
    assert len(e2.groups) == 4 and e2.reused_groups == 3
    e3 = DeviceTextEngine(
        base_list + [(s, Seq(10 + j)) for j, s in enumerate(smalls)],
        prev=e2,
    )
    # frozen [sm0, sm1] reused; [sm2] is the new open pool
    assert len(e3.groups) == 5 and e3.reused_groups == 4
    fullx = DeviceTextEngine(
        base_list + [(s, Seq(10 + j)) for j, s in enumerate(smalls)]
    )
    for text in ("w001 w002", f"{vocab[11]} {vocab[13]}"):
        _assert_same_results(e3, fullx, TextQuery(text=text, top_k=20))


def test_middle_group_dense_window(tmp_path, monkeypatch):
    """Dense blocks of NON-last groups window into the global score space;
    the window may overlap the next group's docs with zero contributions
    and must never corrupt them."""
    monkeypatch.setattr(engine_mod, "TIER_WIDTHS", (2, 4))
    monkeypatch.setattr(engine_mod, "TIER_QUERY_CAP", (4, 4))
    monkeypatch.setattr(engine_mod, "FRESH_FREEZE_DOCS", 6)
    # df(zebra) = 8 > top width 4 -> dense rows in group 0
    g0 = [
        (f"ra{i:03d}/f1", "zebra stripes " + ("zebra " * (i % 3)), [])
        for i in range(8)
    ]
    g1 = [("rb000/f1", "zebra savanna grass", []), ("rb001/f1", "plain grass", [])]
    s0 = _seg(tmp_path, "s0", g0)
    s1 = _seg(tmp_path, "s1", g1)
    e0 = DeviceTextEngine([(s0, Seq(1))])
    e = DeviceTextEngine([(s0, Seq(1)), (s1, Seq(2))], prev=e0)
    assert len(e.groups) == 2 and e.groups[0].dense_dev is not None
    texts = [d[1] for d in g0 + g1]
    for qtext in ("zebra", "zebra grass", "grass"):
        hits, _ = e.search(TextQuery(text=qtext, top_k=16))
        ref = bm25_reference(texts, tokenize(qtext))
        got = {h.key: h.score for h in hits}
        for i, (key, _, _) in enumerate(g0 + g1):
            if ref[i] > 0:
                assert key in got, (qtext, key)
                np.testing.assert_allclose(got[key], ref[i], rtol=1e-4)
