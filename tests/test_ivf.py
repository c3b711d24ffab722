import jax.numpy as jnp
import numpy as np
import pytest

from nucliadb_tpu.ops import ivf


def clustered(rng, n, d, centers):
    v = centers[rng.integers(0, len(centers), n)] + 0.25 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_kmeans_converges(rng):
    d = 32
    centers = rng.standard_normal((8, d)).astype(np.float32) * 3
    v = clustered(rng, 1024, d, centers)
    centroids, assign = ivf.kmeans(
        jnp.asarray(v), jnp.ones(1024, bool), 16, iters=8
    )
    assign = np.asarray(assign)
    # most points share a cluster with their nearest ground-truth center mates
    sims = v @ np.asarray(centroids).T
    assert (np.argmax(sims, -1) == assign).mean() > 0.99


def test_ivf_recall(rng):
    n, d, b, k = 4096, 64, 8, 10
    centers = rng.standard_normal((30, d)).astype(np.float32)
    v = clustered(rng, n, d, centers)
    q = clustered(rng, b, d, centers)
    vj = jnp.asarray(v)
    index = ivf.build_ivf(vj, n, k_clusters=64)
    mask = jnp.ones(n, bool)
    s, i = ivf.ivf_search(index, vj, jnp.asarray(q), mask, jnp.float32(-3e38), k, nprobe=8)
    ids = np.asarray(i)
    true = q.astype(np.float64) @ v.astype(np.float64).T
    recalls = [
        len(set(np.argsort(-true[bi])[:k].tolist()) & set(ids[bi].tolist())) / k
        for bi in range(b)
    ]
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_ivf_mask_and_padding(rng):
    n, d = 1000, 32
    centers = rng.standard_normal((5, d)).astype(np.float32)
    v = np.zeros((1024, d), np.float32)
    v[:n] = clustered(rng, n, d, centers)
    index = ivf.build_ivf(jnp.asarray(v), n, k_clusters=16)
    mask = np.zeros(1024, bool)
    mask[:100] = True
    q = clustered(rng, 3, d, centers)
    s, i = ivf.ivf_search(
        index, jnp.asarray(v), jnp.asarray(q), jnp.asarray(mask), jnp.float32(-3e38),
        5, nprobe=16,
    )
    ids = np.asarray(i)
    assert ((ids < 100) | (ids == -1)).all()
    assert (ids >= 0).any()


def test_ivf_centroids_persisted_and_reused(rng, tmp_path):
    """Segments persist k-means centroids; consolidation reuses the biggest
    segment's and skips Lloyd iterations (one assignment pass only)."""
    import os
    from unittest import mock

    import numpy as np

    from nucliadb_tpu.index.vector import (
        Elem, VectorConfig, VectorSearcher, VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.segment import create_segment, open_segment
    from nucliadb_tpu.ops import ivf as ivf_ops
    from nucliadb_tpu.types import Seq, SimpleOpenIndex

    n, d, k = 1600, 32, 10
    centers = rng.standard_normal((12, d)).astype(np.float32)
    v = centers[rng.integers(0, 12, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["ivf"])

    # big segment (3/4) + small fresh segment (1/4)
    cut = 3 * n // 4
    m0 = create_segment(
        str(tmp_path / "big"),
        [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(cut)],
        cfg,
    )
    m1 = create_segment(
        str(tmp_path / "small"),
        [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(cut, n)],
        cfg,
    )
    assert os.path.exists(os.path.join(m0.path, "ivf_centroids.npy"))
    assert open_segment(m0.path).ivf_centroids is not None

    # consolidation must NOT run k-means (reuses persisted centroids)
    with mock.patch.object(
        ivf_ops, "kmeans", side_effect=AssertionError("kmeans at load")
    ):
        searcher = VectorSearcher(
            cfg,
            SimpleOpenIndex(segment_list=[(m0, Seq(1)), (m1, Seq(2))]),
        )
    assert searcher.index.ivf is not None

    q = centers[rng.integers(0, 12, 4)] + 0.3 * rng.standard_normal((4, d)).astype(
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
