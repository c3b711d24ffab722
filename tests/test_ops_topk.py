import jax
import jax.numpy as jnp
import numpy as np

from nucliadb_tpu.ops import topk


def test_masked_topk_basic():
    scores = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    s, i = topk.masked_topk(scores, 2)
    assert i.tolist() == [[1, 2]]
    assert s.tolist() == [[5.0, 3.0]]


def test_masked_topk_mask_and_floor():
    scores = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    mask = jnp.array([True, False, True, True])
    s, i = topk.masked_topk(scores, 3, mask=mask, min_score=1.5)
    # 5.0 masked out; 1.0 below floor -> only 3.0 and 2.0 valid
    assert i.tolist() == [[2, 3, -1]]
    assert s[0, 2] < -1e30


def test_masked_topk_k_larger_than_n():
    scores = jnp.array([[4.0, 7.0]])
    s, i = topk.masked_topk(scores, 5)
    assert i.shape == (1, 5)
    assert i.tolist()[0][:2] == [1, 0]
    assert all(x == -1 for x in i.tolist()[0][2:])


def test_sharded_topk_allgather():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("shard",))
    n_per, b, k = 32, 2, 5
    rng = np.random.default_rng(1)
    # per-shard local scores/ids (ids globally offset)
    scores = jnp.asarray(rng.standard_normal((b, 4 * n_per), dtype=np.float32))

    def local_then_merge(s):
        # s: local [b, n_per] slice
        shard = jax.lax.axis_index("shard")
        local_s, local_i = jax.lax.top_k(s, k)
        local_i = local_i + shard * n_per
        return topk.sharded_topk_allgather(local_s, local_i, k, "shard")

    fn = shard_map(
        local_then_merge,
        mesh=mesh,
        in_specs=P(None, "shard"),
        out_specs=P(None, None),  # replicated result
        check_vma=False,
    )
    s_out, i_out = jax.jit(fn)(scores)
    # compare against global topk
    ref_s, ref_i = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(ref_s), rtol=1e-6)
    assert np.array_equal(np.asarray(i_out), np.asarray(ref_i))
