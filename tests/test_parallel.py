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


def test_mesh_hybrid_one_program(mesh, tmp_path):
    """Hybrid find as ONE shard_map program: per-shard vector scan + BM25 +
    on-device RRF with all-gather merges — results match the single-chip
    fused hybrid semantics."""
    import os

    import numpy as np

    from nucliadb_tpu.index.text_engine import TextQuery
    from nucliadb_tpu.index.text_engine.builder import DocEntry, build_segment, open_text_segment
    from nucliadb_tpu.index.text_engine.engine import DeviceTextEngine
    from nucliadb_tpu.parallel import MeshHybridIndex
    from nucliadb_tpu.types import Seq

    rng = np.random.default_rng(7)
    n_shards = mesh.shape["shard"]
    d, per, k = 32, 12, 5
    words = ["fox", "dog", "cat", "owl", "bee", "elk"]
    shard_data = []
    all_vecs, all_texts = [], []
    for s in range(n_shards):
        vecs = rng.standard_normal((per, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        entries = []
        for j in range(per):
            text = " ".join(words[(s + j + t) % len(words)] for t in range(4))
            entries.append(DocEntry(key=f"r{s}_{j}/f", text=text))
            all_texts.append(text)
        meta = build_segment(os.path.join(str(tmp_path), f"s{s}"), entries, kind="text")
        engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
        shard_data.append((vecs, engine))
        all_vecs.append(vecs)

    idx = MeshHybridIndex(shard_data, mesh)
    assert idx.n_docs == n_shards * per

    q = all_vecs[2][3:5]  # two queries aligned with known records
    ts, ti = idx.search(q, TextQuery(text="fox dog", top_k=k), k)
    assert ts.shape == (2, k) and ti.shape == (2, k)
    assert (ti[ts > -1e30] >= 0).all()

    # oracle: global exact vector ranks + the (already component-tested)
    # mesh BM25 cut -> python RRF with the same k=60 formula
    per = idx.per_shard
    V = np.concatenate([np.pad(v, ((0, per - v.shape[0]), (0, 0)))
                        for v in all_vecs])
    valid = np.zeros(V.shape[0], bool)
    for s_i in range(n_shards):
        valid[s_i * per : s_i * per + all_vecs[s_i].shape[0]] = True
    exact = q @ V.T
    exact[:, ~valid] = -np.inf
    vec_ids = np.argsort(-exact, axis=1)[:, :k]
    _, bm_ids = idx.text.search(TextQuery(text="fox dog", top_k=k))
    # text_mesh global ids use cumulative-n_docs offsets; hybrid ids use
    # uniform per-shard strides — remap for the oracle
    bm_global = []
    for gid in bm_ids:
        shard = int(np.searchsorted(idx.text.offsets, gid, side="right") - 1)
        bm_global.append(shard * per + (int(gid) - idx.text.offsets[shard]))

    def rrf(va, vb):
        scores = {}
        for r, gid in enumerate(va):
            scores[gid] = scores.get(gid, 0.0) + 1.0 / (60.0 + r)
        for r, gid in enumerate(vb):
            scores[gid] = scores.get(gid, 0.0) + 1.0 / (60.0 + r)
        return sorted(scores, key=lambda g: (-scores[g], list(scores).index(g)))[:k]

    expect0 = rrf([int(x) for x in vec_ids[0]], bm_global)
    assert set(int(x) for x in ti[0] if x >= 0) == set(expect0), (ti[0], expect0)
    # the query's own record makes the fused cut
    own = 2 * per + 3
    assert own in ti[0]
    # every fused id decodes to a real key
    for gid in ti.flatten():
        if gid >= 0:
            assert idx.key(int(gid))
