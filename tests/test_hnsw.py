import jax.numpy as jnp
import numpy as np
import pytest

from nucliadb_tpu.ops import hnsw


def clustered(rng, n, d, centers=20, noise=0.3, center_vecs=None):
    """Clustered synthetic data like the reference's recall test
    (segment.rs:841-912); queries must come from the same centers."""
    if center_vecs is None:
        center_vecs = rng.standard_normal((centers, d)).astype(np.float32)
    v = center_vecs[rng.integers(0, len(center_vecs), n)] + noise * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32), center_vecs


def test_build_graph_structure(rng):
    v, _c = clustered(rng, 500, 32)
    adj, entry_ids = hnsw.build_graph(v, wave=128, seed=1)
    assert adj.shape == (500, hnsw.M_MAX_0)
    assert len(entry_ids) >= 500 // hnsw.M
    degrees = (adj >= 0).sum(axis=1)
    assert degrees.min() >= 1  # every node linked
    # edges point at valid nodes
    assert adj.max() < 500


def test_hnsw_recall_vs_bruteforce(rng):
    """The reference's primary oracle (segment.rs:841-912): recall >= 0.95
    (~0.98 expected) on clustered data."""
    n, d, b, k = 2000, 64, 16, 10
    v, centers = clustered(rng, n, d)
    q, _ = clustered(rng, b, d, center_vecs=centers)
    adj, entry_ids = hnsw.build_graph(v, wave=256, seed=2)

    n_pad = 2048
    arena = np.zeros((n_pad, d), np.float32)
    arena[:n] = v
    mask = np.zeros(n_pad, bool)
    mask[:n] = True

    s, i = hnsw.hnsw_search(
        jnp.asarray(arena),
        jnp.asarray(np.pad(adj, ((0, n_pad - n), (0, 0)), constant_values=-1)),
        jnp.asarray(entry_ids),
        jnp.asarray(q),
        jnp.asarray(mask),
        jnp.float32(-3e38),
        k,
    )
    ids = np.asarray(i)
    true = q.astype(np.float64) @ v.astype(np.float64).T
    recalls = []
    for bi in range(b):
        exact = set(np.argsort(-true[bi])[:k].tolist())
        recalls.append(len(exact & set(ids[bi].tolist())) / k)
    assert np.mean(recalls) >= 0.95, np.mean(recalls)


def _filtered_recall(rng, v, centers, adj, entry_ids, allowed: np.ndarray, k=10, b=8):
    n, d = v.shape
    n_pad = 1 << (n - 1).bit_length()
    q, _ = clustered(rng, b, d, center_vecs=centers)
    mask = np.zeros(n_pad, bool)
    mask[:n] = allowed
    s, i = hnsw.hnsw_search(
        jnp.asarray(np.pad(v, ((0, n_pad - n), (0, 0)))),
        jnp.asarray(np.pad(adj, ((0, n_pad - n), (0, 0)), constant_values=-1)),
        jnp.asarray(entry_ids),
        jnp.asarray(q),
        jnp.asarray(mask),
        jnp.float32(-3e38),
        k,
    )
    ids = np.asarray(i)
    assert (allowed[ids[ids >= 0]]).all()  # only mask-passing results
    allowed_idx = np.nonzero(allowed)[0]
    true = q.astype(np.float64) @ v[allowed_idx].astype(np.float64).T
    recalls = []
    for bi in range(b):
        kk = min(k, len(allowed_idx))
        exact = set(allowed_idx[np.argsort(-true[bi])[:kk]].tolist())
        got = set(x for x in ids[bi].tolist() if x >= 0)
        recalls.append(len(exact & got) / kk)
    return float(np.mean(recalls))


def test_hnsw_filtered_search(rng):
    """Filtered recall >= 0.9 across the 10-50% selectivity window (the
    range where the scan fallback doesn't engage) — parity target: the
    reference keeps expanding until k FILTERED results
    (closest_up_nodes, nidx_vector/src/hnsw/search.rs:188-240)."""
    n, d = 2000, 32
    v, centers = clustered(rng, n, d)
    adj, entry_ids = hnsw.build_graph(v, wave=256, seed=3)
    for selectivity in (0.1, 0.2, 0.5):
        allowed = rng.random(n) < selectivity
        r = _filtered_recall(rng, v, centers, adj, entry_ids, allowed)
        assert r >= 0.9, (selectivity, r)
    # block mask (a contiguous key-range filter, the prefilter shape)
    allowed = np.zeros(n, bool)
    allowed[:300] = True
    r = _filtered_recall(rng, v, centers, adj, entry_ids, allowed)
    assert r >= 0.9, ("block", r)


def test_hnsw_no_duplicate_results(rng):
    v, centers = clustered(rng, 300, 16)
    q, _ = clustered(rng, 2, 16, center_vecs=centers)
    adj, entry_ids = hnsw.build_graph(v, wave=128)
    s, i = hnsw.hnsw_search(
        jnp.asarray(np.pad(v, ((0, 212), (0, 0)))),
        jnp.asarray(np.pad(adj, ((0, 212), (0, 0)), constant_values=-1)),
        jnp.asarray(entry_ids),
        jnp.asarray(q),
        jnp.asarray(np.arange(512) < 300),
        jnp.float32(-3e38),
        10,
    )
    for row in np.asarray(i):
        real = [x for x in row.tolist() if x >= 0]
        assert len(real) == len(set(real))


def test_node_zero_is_retrievable(rng):
    """Regression: -1 pads clamped to 0 in the visited scatter used to
    permanently exclude node 0 from results."""
    n, d = 1000, 32
    v, centers = clustered(rng, n, d)
    adj, entry_ids = hnsw.build_graph(v, wave=256, seed=5)
    n_pad = 1024
    arena = np.zeros((n_pad, d), np.float32)
    arena[:n] = v
    q = v[0:1]  # query IS node 0's vector
    s, i = hnsw.hnsw_search(
        jnp.asarray(arena),
        jnp.asarray(np.pad(adj, ((0, n_pad - n), (0, 0)), constant_values=-1)),
        jnp.asarray(entry_ids),
        jnp.asarray(q),
        jnp.asarray(np.arange(n_pad) < n),
        jnp.float32(-3e38),
        10,
    )
    assert 0 in np.asarray(i)[0].tolist()


def test_last_node_reachable_without_padding(rng):
    """Regression: -1 pad ids in the visited scatter WRAPPED to the last
    row (jax negative indexing), permanently hiding node n_pad-1 whenever
    the arena has no padding rows."""
    import jax.numpy as jnp

    from nucliadb_tpu.ops.hnsw import build_graph, hnsw_search

    n, d = 256, 32  # n == n_pad: no padding row to absorb the wrap
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    adj, ent = build_graph(v)
    # query IS the last node's vector; it must be the top hit
    q = v[n - 1 : n]
    mask = np.ones(n, dtype=bool)
    s, i = hnsw_search(
        jnp.asarray(v), jnp.asarray(adj), jnp.asarray(ent), jnp.asarray(q),
        jnp.asarray(mask), -3e38, 5,
    )
    assert int(np.asarray(i)[0, 0]) == n - 1


def test_default_search_params_scale_with_corpus():
    """The DEFAULT search regime must meet the reference's >= 0.95
    recall@10 bar at every benched scale (segment.rs:906-909): small
    corpora keep the fast ef=50/6 point (0.9984 at 100k), corpora past the
    crossover get ef=100/12 (0.9531 at 1M vs 0.8883 under ef=50/6 —
    tools/hnsw_build_bench, BASELINE.md)."""
    from nucliadb_tpu.ops import hnsw as hnsw_ops

    assert hnsw_ops.default_search_params(50_000) == (
        hnsw_ops.EF_SEARCH, hnsw_ops.SEARCH_TRIPS)
    assert hnsw_ops.default_search_params(200_000) == (
        hnsw_ops.EF_SEARCH, hnsw_ops.SEARCH_TRIPS)
    assert hnsw_ops.default_search_params(1_000_000) == (
        hnsw_ops.EF_SEARCH_WIDE, hnsw_ops.SEARCH_TRIPS_WIDE)


def test_searcher_graph_path_uses_scaled_default(rng, tmp_path, monkeypatch):
    """The index-path graph search passes the size-scaled regime through to
    hnsw_search (device.py), not the module constants."""
    import numpy as np

    from nucliadb_tpu.index.vector import (
        Elem,
        VectorConfig,
        VectorSearcher,
        VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.segment import create_segment
    from nucliadb_tpu.ops import hnsw as hnsw_ops
    from nucliadb_tpu.types import Seq, SimpleOpenIndex

    seen = {}
    real = hnsw_ops.hnsw_search

    def spy(*args, **kwargs):
        seen["ef"] = kwargs.get("ef")
        seen["trips"] = kwargs.get("trips")
        return real(*args, **kwargs)

    monkeypatch.setattr(hnsw_ops, "hnsw_search", spy)
    monkeypatch.setattr(hnsw_ops, "EF_WIDE_THRESHOLD", 100)  # tiny crossover
    n, d = 256, 16
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["hnsw"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "seg"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    q = rng.standard_normal((2, d)).astype(np.float32)
    searcher.search(VectorSearchRequest(vectors=q, top_k=5))
    assert seen.get("ef") == hnsw_ops.EF_SEARCH_WIDE
    assert seen.get("trips") == hnsw_ops.SEARCH_TRIPS_WIDE
