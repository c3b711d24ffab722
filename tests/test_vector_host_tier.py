"""Host numpy exact tier ≡ device exact kernel: differential fuzz.

The cost-model router (device.py HOST_SCAN_ELEMS) may only change WHERE a
small-corpus exact scan executes, never WHAT it returns: scores (within f32
rounding), stable tie order, masks/deletions, min_score and the Fssc dedup
window must equal _search_exact's. This is the vector sibling of the text
engine's host WAND tier (host_tier.py) — below the threshold the per-call
device dispatch cost (CPU backend ~1-2 ms; tunneled TPU ~25 ms relay)
dominates a scan that takes tens of µs of host BLAS.
"""

import numpy as np
import pytest

from nucliadb_tpu.index.vector import (
    Elem,
    VectorConfig,
    VectorSearcher,
    VectorSearchRequest,
)
from nucliadb_tpu.index.vector.device import DeviceVectorIndex
from nucliadb_tpu.index.vector.segment import create_segment
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import Seq, SimpleOpenIndex


def _build(tmp_path, rng, n=300, d=32, similarity="dot", dups=False):
    cfg = VectorConfig(dimension=d, similarity=similarity)
    elems = []
    base = rng.standard_normal((n, d)).astype(np.float32)
    if dups:  # plant identical vectors for the Fssc dedup window
        base[1::7] = base[0::7][: base[1::7].shape[0]]
    for i in range(n):
        elems.append(
            Elem(
                key=f"r{i % 5}/f1/{i}/0-10",
                vectors=base[i : i + 1],
                labels=["/l/ls/even" if i % 2 == 0 else "/l/ls/odd"],
            )
        )
    meta = create_segment(str(tmp_path / f"s-{n}-{similarity}-{dups}"), elems, cfg)
    searcher = VectorSearcher(
        cfg,
        SimpleOpenIndex(
            segment_list=[(meta, Seq(1))],
            deletion_list=[("r3/", Seq(2))],
        ),
    )
    return searcher.index, cfg


def _both(index, *args, **kwargs):
    host_arena = index._host_arena
    assert host_arena is not None, "corpus should be host-tier eligible"
    hs, hi = index.search(*args, **kwargs)
    index._host_arena = None  # force the device kernel
    try:
        ds, di = index.search(*args, **kwargs)
    finally:
        index._host_arena = host_arena
    return (hs, hi), (ds, di)


def _assert_equal(host, dev, ctx):
    (hs, hi), (ds, di) = host, dev
    np.testing.assert_allclose(hs, ds, rtol=2e-5, atol=2e-5, err_msg=str(ctx))
    for b in range(hi.shape[0]):
        if not np.array_equal(hi[b], di[b]):
            # ids may swap only at float-tie positions
            for pos in np.nonzero(hi[b] != di[b])[0]:
                assert abs(hs[b][pos] - ds[b][pos]) < 1e-4, (ctx, b, pos)


@pytest.mark.parametrize("similarity", ["dot", "cosine"])
@pytest.mark.parametrize("dups", [False, True])
def test_host_tier_matches_device_fuzz(rng, tmp_path, similarity, dups):
    index, cfg = _build(tmp_path, rng, similarity=similarity, dups=dups)
    for trial in range(8):
        b = int(rng.integers(1, 6))
        q = rng.standard_normal((b, cfg.dimension)).astype(np.float32)
        k = int(rng.integers(1, 20))
        mask = None
        if rng.random() < 0.5:
            mask = rng.random(index.n_para) < 0.5
        ms = float(rng.random()) if rng.random() < 0.3 else None
        wd = bool(rng.random() < 0.5)
        host, dev = _both(
            index, q, k, para_mask=mask, min_score=ms, with_duplicates=wd
        )
        _assert_equal(host, dev, (similarity, dups, trial, k, ms, wd))


def test_threshold_gates_host_arena(rng, tmp_path, monkeypatch):
    import nucliadb_tpu.index.vector.device as dev_mod

    monkeypatch.setattr(dev_mod, "HOST_SCAN_ELEMS", 0)
    index, _ = _build(tmp_path, rng, n=64, d=8)
    assert index._host_arena is None  # disabled -> device path

    monkeypatch.setattr(dev_mod, "HOST_SCAN_ELEMS", 2_097_152)
    index2, _ = _build(tmp_path, rng, n=64, d=8)
    assert index2._host_arena is not None


def test_searcher_level_results_identical(rng, tmp_path):
    """Through VectorSearcher (labels, prefilters, hit materialization) the
    host tier serves byte-identical hit lists."""
    cfg = VectorConfig(dimension=24)
    elems = [
        Elem(
            key=f"r{i % 4}/f1/{i}/0-10",
            vectors=rng.standard_normal((1, 24)).astype(np.float32),
            labels=["/l/ls/even" if i % 2 == 0 else "/l/ls/odd"],
        )
        for i in range(150)
    ]
    meta = create_segment(str(tmp_path / "sl"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    q = rng.standard_normal(24).astype(np.float32)
    req = VectorSearchRequest(
        vectors=q, top_k=7, filter=LabelAtom("/l/ls/even")
    )
    host_hits = searcher.search(req)[0]
    searcher.index._host_arena = None
    dev_hits = searcher.search(req)[0]
    assert [(h.key, round(h.score, 4)) for h in host_hits] == [
        (h.key, round(h.score, 4)) for h in dev_hits
    ]


def test_route_pinned_by_corpus_size(rng, tmp_path, monkeypatch):
    """Below HOST_SCAN_ELEMS searches must NOT dispatch a device program;
    above it they must NOT take the host path — pins the cost-model route
    so a regression (e.g. an eligibility check lost in refactoring) cannot
    silently re-introduce per-call dispatch overhead on small corpora."""
    import nucliadb_tpu.index.vector.device as dev_mod

    calls = {"host": 0, "device": 0}
    orig_host = dev_mod.DeviceVectorIndex._search_host_exact
    orig_exact = dev_mod._search_exact

    def spy_host(self, *a, **kw):
        calls["host"] += 1
        return orig_host(self, *a, **kw)

    def spy_exact(*a, **kw):
        calls["device"] += 1
        return orig_exact(*a, **kw)

    monkeypatch.setattr(dev_mod.DeviceVectorIndex, "_search_host_exact", spy_host)
    monkeypatch.setattr(dev_mod, "_search_exact", spy_exact)

    small, cfg = _build(tmp_path, rng, n=120, d=16)
    small.search(rng.standard_normal((2, 16)).astype(np.float32), 5)
    assert calls == {"host": 1, "device": 0}

    monkeypatch.setattr(dev_mod, "HOST_SCAN_ELEMS", 64)  # force "too big"
    big, _ = _build(tmp_path, rng, n=121, d=16)
    assert big._host_arena is None
    big.search(rng.standard_normal((2, 16)).astype(np.float32), 5)
    assert calls["device"] == 1 and calls["host"] == 1
