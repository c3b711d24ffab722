import jax.numpy as jnp
import numpy as np

from nucliadb_tpu.ops import distance


def _np_topk(scores, k):
    ids = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, ids, axis=-1), ids


def test_exact_scan_dot_matches_numpy(rng):
    q = rng.standard_normal((4, 64)).astype(np.float32)
    v = rng.standard_normal((200, 64)).astype(np.float32)
    s, i = distance.exact_scan_topk(jnp.asarray(q), jnp.asarray(v), 10, similarity="dot")
    ref = q @ v.T
    ref_s, ref_i = _np_topk(ref, 10)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(i), ref_i)


def test_exact_scan_cosine(rng):
    q = rng.standard_normal((2, 32)).astype(np.float32)
    v = rng.standard_normal((50, 32)).astype(np.float32)
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    s, i = distance.exact_scan_topk(jnp.asarray(q), jnp.asarray(vn), 5, similarity="cosine")
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    ref = qn @ vn.T
    ref_s, ref_i = _np_topk(ref, 5)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(i), ref_i)
    assert np.all(np.asarray(s) <= 1.0 + 1e-5)


def test_exact_scan_mask(rng):
    q = rng.standard_normal((1, 16)).astype(np.float32)
    v = rng.standard_normal((20, 16)).astype(np.float32)
    mask = np.zeros(20, dtype=bool)
    mask[[3, 7, 11]] = True
    s, i = distance.exact_scan_topk(jnp.asarray(q), jnp.asarray(v), 5, mask=jnp.asarray(mask))
    got = set(np.asarray(i)[0].tolist())
    assert got - {-1} <= {3, 7, 11}


def test_exact_rerank(rng):
    q = rng.standard_normal((2, 32)).astype(np.float32)
    v = rng.standard_normal((100, 32)).astype(np.float32)
    cand = jnp.asarray(np.stack([np.arange(20), np.arange(40, 60)]).astype(np.int32))
    s, i = distance.exact_rerank(jnp.asarray(q), jnp.asarray(v), cand, 5)
    ref = q @ v.T
    for b in range(2):
        cids = np.asarray(cand)[b]
        ref_order = cids[np.argsort(-ref[b, cids], kind="stable")[:5]]
        assert np.array_equal(np.asarray(i)[b], ref_order)


def test_exact_rerank_with_invalid_slots(rng):
    q = rng.standard_normal((1, 16)).astype(np.float32)
    v = rng.standard_normal((30, 16)).astype(np.float32)
    cand = jnp.asarray(np.array([[5, 9, -1, -1, 2]], dtype=np.int32))
    s, i = distance.exact_rerank(jnp.asarray(q), jnp.asarray(v), cand, 5)
    ids = np.asarray(i)[0]
    assert set(ids[ids >= 0].tolist()) == {5, 9, 2}
    assert (ids == -1).sum() == 2
