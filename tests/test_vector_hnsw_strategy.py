import numpy as np

from nucliadb_tpu.index.vector import (
    Elem,
    VectorConfig,
    VectorSearcher,
    VectorSearchRequest,
)
from nucliadb_tpu.index.vector.segment import create_segment
from nucliadb_tpu.types import Seq, SimpleOpenIndex


def test_hnsw_strategy_end_to_end(rng, tmp_path):
    n, d, k = 1500, 32, 10
    centers = rng.standard_normal((15, d)).astype(np.float32)
    v = centers[rng.integers(0, 15, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["hnsw"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    assert searcher.index.graph is not None

    q = centers[rng.integers(0, 15, 4)] + 0.3 * rng.standard_normal((4, d)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=k))

    true = q.astype(np.float64) @ v.astype(np.float64).T
    keys_sorted = sorted(e.key for e in elems)
    recalls = []
    for b in range(4):
        exact = {f"r/{i:05d}" for i in np.argsort(-true[b])[:k]}
        got = {h.key for h in hits[b]}
        recalls.append(len(exact & got) / k)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_ivf_strategy_end_to_end(rng, tmp_path):
    n, d, k = 1500, 32, 10
    centers = rng.standard_normal((15, d)).astype(np.float32)
    v = centers[rng.integers(0, 15, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["ivf"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    assert searcher.index.ivf is not None

    q = centers[rng.integers(0, 15, 4)] + 0.3 * rng.standard_normal((4, d)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=k))

    true = q.astype(np.float64) @ v.astype(np.float64).T
    recalls = []
    for b in range(4):
        exact = {f"r/{i:05d}" for i in np.argsort(-true[b])[:k]}
        got = {h.key for h in hits[b]}
        recalls.append(len(exact & got) / k)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_hnsw_graph_persisted_and_stitched(rng, tmp_path):
    """Segments persist their graph (disk-HNSW parity); the consolidated
    index stitches per-segment graphs instead of rebuilding."""
    import os
    from unittest import mock

    from nucliadb_tpu.index.vector.segment import open_segment
    from nucliadb_tpu.ops import hnsw as hnsw_ops

    n, d, k = 800, 32, 10
    centers = rng.standard_normal((10, d)).astype(np.float32)
    v = centers[rng.integers(0, 10, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["hnsw"])

    metas = []
    for s, lo in enumerate(range(0, n, n // 2)):
        elems = [
            Elem(key=f"r/{i:05d}", vectors=v[i : i + 1])
            for i in range(lo, lo + n // 2)
        ]
        metas.append(create_segment(str(tmp_path / f"s{s}"), elems, cfg))

    # graph columns exist on disk
    for meta in metas:
        assert os.path.exists(os.path.join(meta.path, "hnsw_adj.npy"))
        seg = open_segment(meta.path)
        assert seg.hnsw_adj is not None and seg.hnsw_adj.shape[0] == n // 2
        assert (seg.hnsw_adj < n // 2).all()

    # consolidation must NOT call build_graph (stitching path)
    with mock.patch.object(
        hnsw_ops, "build_graph", side_effect=AssertionError("rebuilt at load")
    ):
        searcher = VectorSearcher(
            cfg,
            SimpleOpenIndex(segment_list=[(m, Seq(i + 1)) for i, m in enumerate(metas)]),
        )
    assert searcher.index.graph is not None

    q = centers[rng.integers(0, 10, 4)] + 0.3 * rng.standard_normal((4, d)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=k))
    true = q.astype(np.float64) @ v.astype(np.float64).T
    recalls = []
    for b in range(4):
        exact = {f"r/{i:05d}" for i in np.argsort(-true[b])[:k]}
        got = {h.key for h in hits[b]}
        recalls.append(len(exact & got) / k)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_graph_vs_scan_cost_model(rng, tmp_path):
    """Under a selective filter the graph path yields to the exact scan
    (parity: the reference's use_hnsw analytic cost model,
    nidx_vector/src/segment.rs:626-660) — filtered results stay exact."""
    n, d, k = 1500, 32, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["hnsw"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    idx = searcher.index
    assert idx.graph is not None

    # unfiltered: graph is the chosen strategy
    assert idx._use_graph(idx.n_para, k)
    # 5% filter: scan wins
    assert not idx._use_graph(n // 20, k)

    # a 5%-selective mask returns EXACT top-k (the scan path ran)
    mask = np.zeros(n, dtype=bool)
    chosen = rng.choice(n, n // 20, replace=False)
    mask[chosen] = True
    q = v[chosen[:3]] + 0.01 * rng.standard_normal((3, d)).astype(np.float32)
    s, i = idx.search(q, k, para_mask=mask)
    true = q.astype(np.float64) @ v.astype(np.float64).T
    true[:, ~mask] = -np.inf
    for b in range(3):
        expect = set(np.argsort(-true[b])[:k].tolist())
        assert set(int(x) for x in i[b] if x >= 0) == expect
