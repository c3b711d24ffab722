import jax
import numpy as np
import pytest

from nucliadb_tpu.parallel import MeshShardedVectorIndex, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, query_axis=2)


def test_mesh_shape(mesh):
    assert mesh.shape == {"shard": 4, "query": 2}


def test_sharded_exact_matches_global(mesh, rng=None):
    rng = np.random.default_rng(0)
    n, d, b, k = 1000, 32, 4, 7
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    idx = MeshShardedVectorIndex(vecs, mesh)
    s, i = idx.search(q, k)
    ref = q @ vecs.T
    for bi in range(b):
        order = np.argsort(-ref[bi])[:k]
        assert i[bi].tolist() == order.tolist()
        np.testing.assert_allclose(s[bi], ref[bi][order], rtol=1e-4)


def test_sharded_quantized_recall(mesh):
    rng = np.random.default_rng(1)
    n, d, b, k = 4096, 64, 4, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    idx = MeshShardedVectorIndex(vecs, mesh, quantize=True)
    s, i = idx.search(q, k)
    ref = q @ vecs.T
    recalls = []
    for bi in range(b):
        exact = set(np.argsort(-ref[bi])[:k].tolist())
        recalls.append(len(exact & set(i[bi].tolist())) / k)
    assert np.mean(recalls) >= 0.95


def test_sharded_padding_not_returned(mesh):
    rng = np.random.default_rng(2)
    n, d = 999, 16  # not divisible by 4 shards
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = MeshShardedVectorIndex(vecs, mesh)
    q = rng.standard_normal((2, d)).astype(np.float32)
    s, i = idx.search(q, 5)
    assert (i < n).all() and (i >= 0).all()
