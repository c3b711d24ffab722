import jax.numpy as jnp
import numpy as np

from nucliadb_tpu.ops import distance, quant


def test_pack_bits_roundtrip(rng):
    bits = (rng.random((5, 64)) > 0.5).astype(np.uint32)
    packed = np.asarray(quant.pack_bits(jnp.asarray(bits)))
    assert packed.shape == (5, 2)
    # unpack manually
    unpacked = ((packed[..., :, None] >> np.arange(32, dtype=np.uint32)) & 1).reshape(5, 64)
    assert np.array_equal(unpacked, bits)


def test_binary_codes_transposed_layout(rng):
    v = rng.standard_normal((10, 64)).astype(np.float32)
    bc = quant.BinaryCodes.encode(jnp.asarray(v))
    assert bc.codes_t.shape == (2, 10)  # [D/32, N]
    assert bc.n_vectors == 10 and bc.dim == 64


def test_binary_estimate_within_bound(rng):
    """Parity with the reference's RaBitQ test discipline
    (rabitq.rs:284-306): the estimate must be close to the true dot and
    within the computed error bound for nearly all pairs."""
    n, d, b = 256, 512, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    bc = quant.BinaryCodes.encode(jnp.asarray(v))
    est, bound = quant.binary_estimate_scores(bc, jnp.asarray(q))
    est, bound = np.asarray(est), np.asarray(bound)
    true = q @ v.T
    err = np.abs(est - true)
    # mean abs error small for unit vectors
    assert err.mean() < 0.05
    # the bound is a ~1.9-sigma statistical bound (EPSILON=1.9, same constant
    # as the reference): expect >=94% coverage, not worst-case coverage
    assert (err <= bound).mean() > 0.93


def test_binary_scan_rerank_recall(rng):
    """End-to-end quantized scan + exact rerank must reach >=0.95 recall@10
    against brute force — the same oracle the reference uses for its vector
    index (nidx_vector/src/segment.rs:841-912)."""
    n, d, b, k = 2000, 256, 16, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    bc = quant.BinaryCodes.encode(jnp.asarray(v))
    _, cand = quant.binary_scan_candidates(bc, jnp.asarray(q), k)
    s, i = distance.exact_rerank(jnp.asarray(q), jnp.asarray(v), cand, k)

    true = q @ v.T
    recalls = []
    for bi in range(b):
        ref = set(np.argsort(-true[bi])[:k].tolist())
        got = set(np.asarray(i)[bi].tolist())
        recalls.append(len(ref & got) / k)
    assert np.mean(recalls) >= 0.95, np.mean(recalls)


def test_int8_scan_recall(rng):
    n, d, b, k = 2000, 128, 8, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ic = quant.Int8Codes.encode(jnp.asarray(v))
    _, cand = quant.int8_scan_candidates(ic, jnp.asarray(q), k)
    s, i = distance.exact_rerank(jnp.asarray(q), jnp.asarray(v), cand, k)
    true = q @ v.T
    recalls = []
    for bi in range(b):
        ref = set(np.argsort(-true[bi])[:k].tolist())
        got = set(np.asarray(i)[bi].tolist())
        recalls.append(len(ref & got) / k)
    assert np.mean(recalls) >= 0.99, np.mean(recalls)


def test_binary_scan_respects_mask(rng):
    n, d, k = 512, 64, 5
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    mask = np.zeros(n, dtype=bool)
    mask[:50] = True
    bc = quant.BinaryCodes.encode(jnp.asarray(v))
    _, cand = quant.binary_scan_candidates(bc, jnp.asarray(q), k, mask=jnp.asarray(mask))
    ids = np.asarray(cand)
    assert ((ids < 50) | (ids == -1)).all()
