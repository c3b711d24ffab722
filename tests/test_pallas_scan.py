"""Fused Pallas int8 scan kernel (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from nucliadb_tpu.ops.pallas_scan import NEG_INF, eligible, int8_scan_slots


def _quantize(q):
    qs = jnp.maximum(jnp.max(jnp.abs(q), -1), 1e-12) / 127.0
    return jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)


def test_slot_scan_matches_oracle(rng):
    n, d, b, k = 2048, 128, 8, 10
    block, slots = 512, 256
    codes = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    mask = jnp.ones((n,), bool).at[:50].set(False)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    qc = _quantize(q)

    ss, ii = int8_scan_slots(
        qc, codes, scale, mask, block_n=block, slots=slots, interpret=True
    )
    assert ss.shape == (b, slots) and ii.shape == (b, slots)

    # oracle: full masked score matrix
    est = np.array(
        (qc.astype(jnp.int32) @ codes.T.astype(jnp.int32)).astype(jnp.float32)
        * scale[None, :]
    )
    est[:, :50] = -np.inf

    ss_np, ii_np = np.asarray(ss), np.asarray(ii)
    # every slot holds the max over its residue class (exact, not approximate)
    for row in range(b):
        for s in range(0, slots, 37):  # sample slots
            cols = np.arange(s, n, slots)
            expect = est[row, cols].max()
            assert np.isclose(ss_np[row, s], expect, rtol=1e-6), (row, s)
            assert ii_np[row, s] in cols
            assert np.isclose(est[row, ii_np[row, s]], expect, rtol=1e-6)
    # masked ids never surface
    assert not np.isin(ii_np, np.arange(50)).any()

    # top-k over slots ~= true top-k (collisions only)
    ks, kpos = jax.lax.top_k(ss, k)
    ki = np.take_along_axis(ii_np, np.asarray(kpos), axis=1)
    true_i = np.argsort(-est, axis=1)[:, :k]
    recall = np.mean([len(set(true_i[r]) & set(ki[r])) / k for r in range(b)])
    assert recall >= 0.9, recall


def test_resident_slot_scan_matches_oracle(rng):
    """The single-pass resident-accumulator kernel produces the same exact
    per-slot maxima as the q-outer kernel (slot = residue class of the
    column id), across multiple query blocks sharing the VMEM table."""
    from nucliadb_tpu.ops.pallas_scan import int8_scan_slots_resident

    n, d, b, k = 4096, 128, 64, 10
    block, slots, block_b = 1024, 256, 16
    codes = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    mask = jnp.ones((n,), bool).at[::5].set(False)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    qc = _quantize(q)

    ss, ii = int8_scan_slots_resident(
        qc, codes, scale, mask,
        block_n=block, slots=slots, block_b=block_b, interpret=True,
    )
    assert ss.shape == (b, slots) and ii.shape == (b, slots)

    est = np.array(
        (qc.astype(jnp.int32) @ codes.T.astype(jnp.int32)).astype(jnp.float32)
        * scale[None, :]
    )
    est[:, ::5] = -np.inf

    ss_np, ii_np = np.asarray(ss), np.asarray(ii)
    for row in range(0, b, 7):  # rows from every query block
        for s in range(0, slots, 29):
            cols = np.arange(s, n, slots)
            expect = est[row, cols].max()
            assert np.isclose(ss_np[row, s], expect, rtol=1e-6), (row, s)
            assert ii_np[row, s] in cols
    assert not np.isin(ii_np, np.arange(0, n, 5)).any()

    ks, kpos = jax.lax.top_k(ss, k)
    ki = np.take_along_axis(ii_np, np.asarray(kpos), axis=1)
    true_i = np.argsort(-est, axis=1)[:, :k]
    recall = np.mean([len(set(true_i[r]) & set(ki[r])) / k for r in range(b)])
    assert recall >= 0.9, recall


def test_resident_eligibility_gate():
    from nucliadb_tpu.ops.pallas_scan import resident_eligible

    assert resident_eligible(1048576, 768, 1024, multi=False)
    assert not resident_eligible(1048576, 768, 2048, multi=False)  # B cap
    assert not resident_eligible(2048, 768, 64, multi=False)  # too small
    assert not resident_eligible(1048576, 100, 64, multi=False)


def test_resident2_top2_per_slot_oracle(rng):
    """The top-2 kernel keeps the two best masked scores of every slot
    residue class — exactly (score-compared; ids may differ on ties)."""
    from nucliadb_tpu.ops.pallas_scan import int8_scan_slots_resident2

    n, d, b = 4096, 128, 24
    block, slots, block_b = 1024, 128, 8
    codes = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    mask = jnp.ones((n,), bool).at[::7].set(False)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    qc = _quantize(q)

    ss, ii = int8_scan_slots_resident2(
        qc, codes, scale, mask,
        block_n=block, slots=slots, block_b=block_b, interpret=True,
    )
    assert ss.shape == (b, 2 * slots) and ii.shape == (b, 2 * slots)

    est = np.array(
        (qc.astype(jnp.int32) @ codes.T.astype(jnp.int32)).astype(jnp.float32)
        * scale[None, :]
    )
    est[:, ::7] = -np.inf

    ss_np, ii_np = np.asarray(ss), np.asarray(ii)
    s1, s2 = ss_np[:, :slots], ss_np[:, slots:]
    i1, i2 = ii_np[:, :slots], ii_np[:, slots:]
    assert (s1 >= s2 - 1e-6).all()
    both = (i1 >= 0) & (i2 >= 0)
    assert (i1[both] != i2[both]).all()
    for row in range(0, b, 5):
        for s in range(0, slots, 17):
            cols = np.arange(s, n, slots)
            want = np.sort(est[row, cols])[::-1][:2]
            got = np.sort([s1[row, s], s2[row, s]])[::-1]
            for w, g in zip(want, got):
                if w == -np.inf:
                    assert g <= NEG_INF / 2
                else:
                    assert np.isclose(w, g, rtol=1e-6), (row, s, want, got)
            assert i1[row, s] in cols
    assert not np.isin(ii_np, np.arange(0, n, 7)).any()


def test_resident2_survives_pair_collisions(rng):
    """Construct a corpus where the global top-k pairwise collides in slots:
    top-1-per-slot selection must lose items, top-2 must not (this is the
    recall@10 0.970 -> 1.0 headline mechanism)."""
    from nucliadb_tpu.ops.pallas_scan import (
        int8_scan_slots_resident,
        int8_scan_slots_resident2,
    )

    n, d, b, k = 4096, 128, 8, 10
    slots = 128
    codes = np.asarray(rng.integers(-40, 40, (n, d)), np.int8)
    # plant the true top-10 as 5 colliding PAIRS: ids (j, j+slots) share
    # slot j; both copies score far above the crowd
    q = rng.standard_normal((b, d)).astype(np.float32)
    qc = np.asarray(_quantize(jnp.asarray(q)))
    planted = []
    for j in range(5):
        planted += [j * 31, j * 31 + slots]
    for pid in planted:
        codes[pid] = np.clip(np.sign(qc[0]) * 90, -127, 127).astype(np.int8)
    scale = np.ones(n, np.float32)
    mask = np.ones(n, bool)

    args = (jnp.asarray(qc), jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(mask))
    ss1, ii1 = int8_scan_slots_resident(
        *args, block_n=1024, slots=slots, block_b=8, interpret=True
    )
    ss2, ii2 = int8_scan_slots_resident2(
        *args, block_n=1024, slots=slots, block_b=8, interpret=True
    )
    # query 0: the planted pairs are its exact top-10
    def got_top(ss, ii):
        _, pos = jax.lax.top_k(ss, k)
        return set(np.take_along_axis(np.asarray(ii), np.asarray(pos), 1)[0].tolist())

    top1 = got_top(ss1, ii1)
    top2 = got_top(ss2, ii2)
    assert len(set(planted) & top2) == len(planted), (planted, top2)
    assert len(set(planted) & top1) <= len(planted) - 5  # pair losses

    # eligibility: budget fits the 2S table; B cap raised to 2048
    from nucliadb_tpu.ops.pallas_scan import resident2_block_b, resident2_eligible

    assert resident2_eligible(1048576, 768, 2048, multi=False)
    assert not resident2_eligible(1048576, 768, 4096, multi=False)
    assert resident2_block_b(2048) == 256
    assert resident2_block_b(1024) == 512
    assert resident2_block_b(192) == 192


def test_all_masked_block():
    n, d, b = 1024, 128, 8
    codes = jnp.ones((n, d), jnp.int8)
    scale = jnp.ones((n,), jnp.float32)
    mask = jnp.zeros((n,), bool)  # nothing eligible
    q = jnp.ones((b, d), jnp.float32)
    ss, ii = int8_scan_slots(
        _quantize(q), codes, scale, mask, block_n=512, slots=256, interpret=True
    )
    assert (np.asarray(ss) <= NEG_INF / 2).all()
    assert (np.asarray(ii) == -1).all()


def test_eligibility_gate():
    assert eligible(1048576, 768, multi=False)
    assert eligible(786432, 768, multi=False)  # 1.5 * 2^19 bucket
    assert not eligible(4096, 768, multi=False)  # too small
    assert not eligible(1048576, 768, multi=True)
    assert not eligible(1048576, 100, multi=False)  # lane-unaligned dim


def test_device_index_pallas_flag(rng, tmp_path):
    """End-to-end: the 'pallas' config flag routes int8 search through the
    fused kernel (interpret mode on CPU) with identical result quality."""
    from nucliadb_tpu.index.vector import (
        Elem, VectorConfig, VectorSearcher, VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.segment import create_segment
    from nucliadb_tpu.ops import pallas_scan
    from nucliadb_tpu.types import Seq, SimpleOpenIndex
    from unittest import mock

    n, d, k = 1200, 128, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["pallas"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)

    # shrink the kernel blocks so the small test corpus is eligible
    with mock.patch.object(pallas_scan, "BLOCK_N", 512), mock.patch.object(
        pallas_scan, "SLOTS", 256
    ):
        searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
        # force the quantized path (tiny corpora normally take the exact scan)
        from nucliadb_tpu.ops import quant

        searcher.index.codes = quant.Int8Codes.encode(searcher.index.vectors)
        q = rng.standard_normal((4, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        hits = searcher.search(VectorSearchRequest(vectors=q, top_k=k))

    true = q.astype(np.float64) @ v.astype(np.float64).T
    recalls = []
    for b in range(4):
        exact = {f"r/{i:05d}" for i in np.argsort(-true[b])[:k]}
        got = {h.key for h in hits[b]}
        recalls.append(len(exact & got) / k)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_binary_slot_scan_matches_xla(rng):
    """The fused binary kernel's slot table holds, per slot, the max
    optimistic score (estimate + bound) over its residue class — identical
    semantics to the XLA binary_estimate_scores path."""
    import numpy as np

    from nucliadb_tpu.ops import quant
    from nucliadb_tpu.ops.pallas_scan import binary_eligible, binary_scan_slots

    n, d, b = 2048, 128, 8
    block, slots = 512, 256
    vecs = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bc = quant.BinaryCodes.encode(vecs)
    mask = jnp.ones((n,), bool).at[:64].set(False)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    planes, qmin, qstep, qsum = quant.quantize_query_planes(q)
    qnorm = jnp.linalg.norm(q, axis=-1)
    ss, ii = binary_scan_slots(
        planes, qmin, qstep, qsum, qnorm,
        bc.codes_t, bc.scale, bc.popcnt, bc.resid, mask,
        dim=d, block_n=block, slots=slots, interpret=True,
    )
    assert ss.shape == (b, slots) and ii.shape == (b, slots)

    est, bound = quant.binary_estimate_scores(bc, q)
    opt = np.array(est + bound)
    opt[:, :64] = -np.inf

    ss_np, ii_np = np.asarray(ss), np.asarray(ii)
    for row in range(0, b, 3):
        for s in range(0, slots, 41):
            cols = np.arange(s, n, slots)
            expect = opt[row, cols].max()
            assert np.isclose(ss_np[row, s], expect, rtol=1e-5), (row, s)
            assert ii_np[row, s] in cols
    assert not np.isin(ii_np, np.arange(64)).any()
    assert binary_eligible(n, d, multi=False, block_n=block)
    assert not binary_eligible(block, d, multi=False, block_n=block)


def test_binary_pallas_search_end_to_end(rng):
    """_search_binary_pallas == _search_binary (same rerank, same cut)."""
    import numpy as np

    from nucliadb_tpu.index.vector.device import (
        _search_binary,
        _search_binary_pallas,
    )
    from nucliadb_tpu.ops import pallas_scan, quant

    n, d, b, k = 2048, 128, 4, 5
    vecs = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bc = quant.BinaryCodes.encode(vecs)
    mask = jnp.ones((n,), bool)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    ms = jnp.float32(-3.0e38)

    old_block, old_slots = pallas_scan.BINARY_BLOCK_N, pallas_scan.SLOTS
    pallas_scan.BINARY_BLOCK_N, pallas_scan.SLOTS = 512, 256
    try:
        s_p, i_p = _search_binary_pallas(
            bc, vecs, q, mask, ms, k, "dot", interpret=True
        )
    finally:
        pallas_scan.BINARY_BLOCK_N, pallas_scan.SLOTS = old_block, old_slots
    s_x, i_x = _search_binary(bc, vecs, q, mask, ms, k, "dot")
    # both paths exact-rerank their candidates; the pallas slot table (256
    # slots here) may drop a borderline candidate vs the XLA 500-candidate
    # budget, so compare recall against the exact oracle instead of ids
    exact = np.asarray(q @ vecs.T)
    true_i = np.argsort(-exact, axis=1)[:, :k]
    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([len(set(true_i[r]) & set(ids[r])) / k for r in range(ids.shape[0])])
    r_p, r_x = recall(i_p), recall(i_x)
    assert r_p >= r_x - 0.25, (r_p, r_x)
    assert r_p >= 0.6, r_p
    # returned scores are exact dots of the returned ids
    got = np.take_along_axis(exact, np.asarray(i_p), axis=1)
    np.testing.assert_allclose(np.asarray(s_p), got, rtol=1e-5)
