"""Beyond-HBM corpora: the paged arena tiers answer correctly when the f32
arena exceeds the device budget (VERDICT r2 #7).

NDBTPU_VECTOR_ARENA_BUDGET caps what a DeviceVectorIndex may hold on device
(the artificial stand-in for HBM capacity); the tiers mirror the segment-
paging role of the reference's mmap'd stores (nidx_vector/src/data_store.rs
+ nidx/src/searcher/sync.rs:57-219):

- host_rerank: int8 codes resident, f32 rows page from host RAM per query
- stream: chunked device scans over the host arena (correct at any size)

Every tier is asserted IDENTICAL (same ids, same scores to f32 tolerance)
to the unbudgeted resident index across filters, deletions, min_score and
dedup — the same oracle discipline as the resident kernels.
"""

import numpy as np
import pytest

from nucliadb_tpu.index.vector import (
    Elem,
    VectorConfig,
    VectorIndexer,
    VectorSearcher,
    VectorSearchRequest,
)
from nucliadb_tpu.index.vector.config import Quantization
from nucliadb_tpu.index.vector.segment import create_segment
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import Seq, SimpleOpenIndex

D = 64
N = 600  # > EXACT_SCAN_THRESHOLD is irrelevant: the budget forces the tier
P_PAD = 4096  # the arena bucket floor (utils/buckets.MIN_BUCKET)
CODE_BYTES = P_PAD * (D + 4)  # int8 codes + f32 scale on device
VEC_BYTES = P_PAD * D * 4


def build(tmp_path, rng, quantization=Quantization.INT8, dup_rows=0):
    cfg = VectorConfig(dimension=D, similarity="dot", quantization=quantization)
    elems = []
    vecs = []
    base = rng.standard_normal((N, D)).astype(np.float32)
    for i in range(N):
        v = base[i : i + 1].copy()
        if dup_rows and i < dup_rows:
            v = base[0:1].copy()  # identical vectors (Fssc dedup targets)
        lab = ["/l/t/even"] if i % 2 == 0 else ["/l/t/odd"]
        elems.append(Elem(key=f"r{i}/f/{i}/0-10", vectors=v, labels=lab))
        vecs.append(v[0])
    meta = create_segment(str(tmp_path / "seg"), elems, cfg)
    oi = SimpleOpenIndex(segment_list=[(meta, Seq(1))],
                         deletion_list=[("r7/", Seq(2))])
    return cfg, oi, np.stack(vecs)


def tier_of(searcher):
    return searcher.index.paging


@pytest.mark.parametrize("budget,expected_tier", [
    (0, None),                      # unbudgeted: resident
    (CODE_BYTES + VEC_BYTES // 4, "host_rerank"),  # codes fit, f32 arena not
    (CODE_BYTES // 4, "stream"),    # nothing fits: chunked streaming scan
])
def test_paged_tiers_match_resident(tmp_path, monkeypatch, budget, expected_tier):
    rng = np.random.default_rng(42)
    cfg, oi, vecs = build(tmp_path, rng)

    monkeypatch.delenv("NDBTPU_VECTOR_ARENA_BUDGET", raising=False)
    resident = VectorSearcher(cfg, oi)
    assert tier_of(resident) is None

    if budget:
        monkeypatch.setenv("NDBTPU_VECTOR_ARENA_BUDGET", str(budget))
    searcher = VectorSearcher(cfg, oi)
    assert tier_of(searcher) == expected_tier

    queries = rng.standard_normal((5, D)).astype(np.float32)
    cases = [
        dict(top_k=10),
        dict(top_k=10, filter=LabelAtom("/l/t/even")),
        dict(top_k=7, min_score=0.5),
        dict(top_k=10, with_duplicates=True),
    ]
    for case in cases:
        req = VectorSearchRequest(vectors=queries, **case)
        got = searcher.search(req)
        want = resident.search(req)
        for g_row, w_row in zip(got, want):
            assert [h.key for h in g_row] == [h.key for h in w_row], case
            np.testing.assert_allclose(
                [h.score for h in g_row], [h.score for h in w_row],
                rtol=2e-3, atol=2e-3,
            )
    # deletions honored: r7 never appears
    req = VectorSearchRequest(vectors=vecs[7][None], top_k=5)
    for h in searcher.search(req)[0]:
        assert not h.key.startswith("r7/")


def test_stream_tier_dedup_and_chunking(tmp_path, monkeypatch):
    """The streaming tier crosses chunk boundaries (chunk_rows < corpus) and
    still applies the Fssc identical-vector dedup."""
    rng = np.random.default_rng(7)
    cfg, oi, vecs = build(tmp_path, rng, dup_rows=4)

    monkeypatch.setenv("NDBTPU_VECTOR_ARENA_BUDGET", str(512 * D * 4))
    searcher = VectorSearcher(cfg, oi)
    assert tier_of(searcher) == "stream"
    assert searcher.index.chunk_rows < searcher.index.p_pad  # really chunked

    q = vecs[0][None]  # nearest = the 4 identical duplicate rows
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=6))[0]
    dup_hits = [h for h in hits if np.allclose(vecs[int(h.key.split("/")[2])], vecs[0])]
    assert len(dup_hits) == 1  # duplicates collapsed (with_duplicates=False default)

    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=6, with_duplicates=True)
    )[0]
    dup_hits = [h for h in hits if np.allclose(vecs[int(h.key.split("/")[2])], vecs[0])]
    assert len(dup_hits) == 4


def test_host_rerank_capacity_math(tmp_path, monkeypatch):
    """The host_rerank tier holds only codes on device: budget just above
    code bytes selects it; just below falls to stream."""
    rng = np.random.default_rng(3)
    cfg, oi, _ = build(tmp_path, rng)
    monkeypatch.setenv("NDBTPU_VECTOR_ARENA_BUDGET", str(CODE_BYTES + 1))
    s1 = VectorSearcher(cfg, oi)
    assert tier_of(s1) == "host_rerank"
    monkeypatch.setenv("NDBTPU_VECTOR_ARENA_BUDGET", str(CODE_BYTES - 1))
    s2 = VectorSearcher(cfg, oi)
    assert tier_of(s2) == "stream"
