"""Host WAND tier ≡ device kernel: differential fuzz.

The cost-model router (engine.py host_tier / host_tier.py) may only change
WHERE a scored OR query executes, never WHAT it returns: hits (ids + scores
within float rounding), matched bitmaps, and match counts must equal the
device kernel's across segments, deletions, filters, key prefixes, security
masks, fuzzy expansion, min_score, phrase tokens and exclusions."""

import numpy as np
import pytest

import nucliadb_tpu.index.text_engine.host_tier as ht
from nucliadb_tpu.index.text_engine import (
    DeviceTextEngine,
    TextQuery,
    build_segment,
    open_text_segment,
)
from nucliadb_tpu.index.text_engine.builder import DocEntry
from nucliadb_tpu.index.text_engine.host_tier import host_tier_for
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import Seq

pytestmark = pytest.mark.skipif(
    not ht._HAS_WAND, reason="native WAND extension not built"
)

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]


def _build_engine(tmp_path, rng, n_docs=400, n_segments=3, deletions=True):
    entries_per_seg = -(-n_docs // n_segments)
    segs, di = [], 0
    for s in range(n_segments):
        entries = []
        for _ in range(min(entries_per_seg, n_docs - di)):
            k = int(rng.integers(3, 12))
            text = " ".join(rng.choice(VOCAB, size=k))
            facets = ["/l/ls/even" if di % 2 == 0 else "/l/ls/odd"]
            entries.append(
                DocEntry(key=f"r{di % 13}/t/t/0-10", text=text, facets=facets)
            )
            di += 1
        meta = build_segment(
            str(tmp_path / f"seg{s}-{rng.integers(1 << 30)}"), entries,
            kind="paragraph",
        )
        segs.append((open_text_segment(meta.path), Seq(s + 1)))
    dels = [("r3/", Seq(n_segments + 1))] if deletions else []
    return DeviceTextEngine(segs, dels)


def _hits_key(hits):
    return [(h.key, h.doc_id, round(h.score, 4)) for h in hits]


def _both(engine, tier, q, need_matched):
    engine._host_tier_cached = None  # force the device kernel
    dev = engine.search(q, need_matched=need_matched)
    engine._host_tier_cached = tier
    host = engine.search(q, need_matched=need_matched)
    return dev, host


def _assert_equal(dev, host, ctx):
    dhits, dmatched = dev
    hhits, hmatched = host
    # scores equal within rounding; ids may swap only on score ties
    assert len(dhits) == len(hhits), (ctx, _hits_key(dhits), _hits_key(hhits))
    for a, b in zip(dhits, hhits):
        assert abs(a.score - b.score) < 1e-3, (ctx, a, b)
    dids, hids = {h.doc_id for h in dhits}, {h.doc_id for h in hhits}
    if dids != hids:
        # tie-tolerance: symmetric difference must be all-tied at the cut
        scores = sorted((h.score for h in dhits), reverse=True)
        cut = scores[-1] if scores else 0.0
        for h in dhits + hhits:
            if h.doc_id in dids ^ hids:
                assert abs(h.score - cut) < 1e-3, (ctx, h, cut)
    if isinstance(dmatched, np.ndarray):
        assert isinstance(hmatched, np.ndarray), ctx
        np.testing.assert_array_equal(dmatched, hmatched, err_msg=str(ctx))
    else:
        assert dmatched.sum() == hmatched.sum(), ctx


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_tier_matches_kernel_fuzz(tmp_path, monkeypatch, seed):
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "1")
    rng = np.random.default_rng(seed)
    engine = _build_engine(tmp_path, rng)
    tier = host_tier_for(engine)
    assert tier is not None
    for trial in range(25):
        words = list(rng.choice(VOCAB, size=int(rng.integers(1, 4))))
        if rng.random() < 0.4:  # typo → fuzzy-only term
            w = words[0]
            words[0] = w[:2] + w[1] + w[3:] if len(w) > 3 else w + "x"
        q = TextQuery(
            text=" ".join(words),
            top_k=int(rng.integers(1, 40)),
            fuzzy=bool(rng.random() < 0.6),
            all_terms=bool(rng.random() < 0.35),
            filter=LabelAtom("/l/ls/even") if rng.random() < 0.4 else None,
            key_prefixes=["r1/", "r7/"] if rng.random() < 0.3 else None,
            excluded=[str(rng.choice(VOCAB))] if rng.random() < 0.3 else [],
            min_score=float(rng.random() * 2) if rng.random() < 0.3 else None,
            phrases=[f"{rng.choice(VOCAB)} {rng.choice(VOCAB)}"]
            if rng.random() < 0.2 else [],
        )
        if rng.random() < 0.3:
            m = np.zeros(engine.n_docs, bool)
            m[rng.random(engine.n_docs) < 0.5] = True
            q.extra_mask = m
        nm = bool(rng.random() < 0.5)
        dev, host = _both(engine, tier, q, nm)
        _assert_equal(dev, host, (seed, trial, q.text))


def test_host_tier_batch_and_routing(tmp_path, monkeypatch):
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "1")
    rng = np.random.default_rng(7)
    engine = _build_engine(tmp_path, rng)
    tier = host_tier_for(engine)
    queries = [
        TextQuery(text=" ".join(rng.choice(VOCAB, size=2)), top_k=10,
                  fuzzy=bool(i % 2))
        for i in range(8)
    ]
    engine._host_tier_cached = None
    dev = engine.search_batch(queries, need_matched=False)
    engine._host_tier_cached = tier
    host = engine.search_batch(queries, need_matched=False)
    for d, h, q in zip(dev, host, queries):
        _assert_equal(d, h, q.text)

    # all_terms (AND) queries run on the host tier too (r5): required-count
    # evaluator, identical results to the kernel incl. per-hit counts
    and_q = TextQuery(text="alpha bravo", all_terms=True, top_k=15)
    res = tier.search(and_q)
    assert res is not None
    engine._host_tier_cached = None
    dev_hits, dev_matched = engine.search(and_q)
    engine._host_tier_cached = tier
    host_hits, host_matched = engine.search(and_q)
    assert _hits_key(dev_hits) == _hits_key(host_hits)
    assert [h.term_count for h in dev_hits] == [h.term_count for h in host_hits]
    np.testing.assert_array_equal(dev_matched, host_matched)
    # unsatisfiable AND (token with no variant) returns empty on both
    impossible = TextQuery(text="alpha zzzzqqq", all_terms=True, fuzzy=False)
    ih, im = tier.search(impossible)
    assert ih == [] and not im.any()
    # pure-filter queries stay on the engine's host filter path
    assert tier.search(TextQuery(text="", only_faceted=True)) is None
    # disabled via env
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "0")
    assert host_tier_for(engine) is None
    # auto threshold: tiny corpora qualify
    monkeypatch.delenv("NDBTPU_TEXT_HOST_TIER")
    assert host_tier_for(engine) is not None


def test_sparse_count_crossover(tmp_path, monkeypatch):
    """bm25_match_multi's count-only mode takes a sort-based sparse path
    when postings << n_docs (crossover n_docs/96) and the fused bitmap path
    otherwise — both must equal the need_matched bitmap's sum, with and
    without masks."""
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "1")
    rng = np.random.default_rng(11)
    # 6000 docs; 'zulu' planted in ~12 docs -> 12*96 < 6000 (sparse path);
    # 'alpha' appears in ~1/16 of docs -> ~375*96 > 6000 (bitmap path)
    entries = []
    for i in range(6000):
        text = " ".join(rng.choice(VOCAB, size=6))
        if i % 500 == 0:
            text += " zulu"
        entries.append(DocEntry(key=f"r{i % 13}/t/t/0-10", text=text))
    meta = build_segment(str(tmp_path / "seg"), entries, kind="paragraph")
    engine = DeviceTextEngine(
        [(open_text_segment(meta.path), Seq(1))], [("r3/", Seq(2))]
    )
    tier = host_tier_for(engine)
    assert tier is not None
    for text in ("zulu", "alpha", "zulu alpha"):
        for q in (
            TextQuery(text=text, top_k=10),
            TextQuery(text=text, top_k=10, key_prefixes=["r1/", "r2/"]),
        ):
            _, bitmap = tier.search(q, need_matched=True)
            _, count = tier.search(q, need_matched=False)
            assert isinstance(bitmap, np.ndarray)
            assert int(bitmap.sum()) == count.sum(), (text, q.key_prefixes)


def test_host_tier_matched_semantics(tmp_path, monkeypatch):
    """matched = (any scheduled term hit) & mask — exactly the kernel's
    OR-query semantics, including deletions."""
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "1")
    rng = np.random.default_rng(3)
    engine = _build_engine(tmp_path, rng, n_docs=120, deletions=True)
    tier = host_tier_for(engine)
    q = TextQuery(text="alpha", top_k=5)
    dev, host = _both(engine, tier, q, True)
    _assert_equal(dev, host, "matched")
    assert isinstance(host[1], np.ndarray) and host[1].dtype == bool
    # deleted docs never match
    dead = np.nonzero(~engine.alive[: engine.n_docs])[0]
    assert len(dead) > 0 and not host[1][dead].any()


def test_need_total_skips_count_pass(tmp_path, monkeypatch):
    """need_total=False (the /find route) must skip the corpus-wide
    matched/count pass entirely and return the -1 'not computed' proxy."""
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "1")
    rng = np.random.default_rng(5)
    engine = _build_engine(tmp_path, rng, n_docs=200)
    tier = host_tier_for(engine)
    calls = {"match": 0, "count": 0}
    real_match = ht._native.bm25_match_multi
    real_count = ht._native.bm25_count_multi

    def spy_match(*a):
        calls["match"] += 1
        return real_match(*a)

    def spy_count(*a):
        calls["count"] += 1
        return real_count(*a)

    monkeypatch.setattr(ht._native, "bm25_match_multi", spy_match)
    monkeypatch.setattr(ht._native, "bm25_count_multi", spy_count)
    q = TextQuery(text="alpha bravo", top_k=5)
    hits, matched = tier.search(q, need_matched=False, need_total=False)
    assert calls == {"match": 0, "count": 0}
    assert matched.sum() == -1 and len(matched) == engine.n_docs
    hits2, matched2 = tier.search(q, need_matched=False, need_total=True)
    assert calls["match"] == 1
    assert matched2.sum() >= len(hits2) > 0
    assert [h.doc_id for h in hits] == [h.doc_id for h in hits2]
    # AND flavor: count pass likewise gated
    qa = TextQuery(text="alpha bravo", top_k=5, all_terms=True)
    tier.search(qa, need_matched=False, need_total=False)
    assert calls["count"] == 0
    tier.search(qa, need_matched=False, need_total=True)
    assert calls["count"] == 1
