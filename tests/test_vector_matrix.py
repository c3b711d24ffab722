"""Matrix-parameterized segment search tests.

Mirrors the reference's rstest matrix over similarity x store version
(nidx_vector/tests/ basic search #[values] matrix): every (similarity,
codec/strategy) combination must reach the recall oracle.
"""

import numpy as np
import pytest

import nucliadb_tpu.index.vector.config as vconfig
from nucliadb_tpu.index.vector import (
    Elem,
    VectorConfig,
    VectorSearcher,
    VectorSearchRequest,
)
from nucliadb_tpu.index.vector.segment import create_segment
from nucliadb_tpu.types import Seq, SimpleOpenIndex


@pytest.mark.parametrize("similarity", ["dot", "cosine"])
@pytest.mark.parametrize(
    "strategy", ["exact", "int8", "binary", "hnsw", "ivf"]
)
def test_search_matrix(similarity, strategy, rng, tmp_path, monkeypatch):
    n, d, k = 1200, 64, 10
    centers = rng.standard_normal((12, d)).astype(np.float32)
    v = centers[rng.integers(0, 12, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    if similarity == "dot":
        v /= np.linalg.norm(v, axis=-1, keepdims=True)

    flags = []
    quantization = "none"
    if strategy in ("int8", "binary"):
        quantization = strategy
        # force the quantized path at this small size
        monkeypatch.setattr(vconfig, "EXACT_SCAN_THRESHOLD", 100)
        import nucliadb_tpu.index.vector.device as vdevice

        monkeypatch.setattr(vdevice, "EXACT_SCAN_THRESHOLD", 100)
    elif strategy in ("hnsw", "ivf"):
        flags = [strategy]

    cfg = VectorConfig(
        dimension=d, similarity=similarity, quantization=quantization, flags=flags
    )
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))

    q = centers[rng.integers(0, 12, 4)] + 0.3 * rng.standard_normal((4, d)).astype(
        np.float32
    )
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=k))

    vv = np.asarray(v)
    if similarity == "cosine":
        vv = vv / np.linalg.norm(vv, axis=-1, keepdims=True)
        qq = q / np.linalg.norm(q, axis=-1, keepdims=True)
    else:
        qq = q
    true = qq.astype(np.float64) @ vv.astype(np.float64).T
    recalls = []
    for b in range(4):
        exact = {f"r/{i:05d}" for i in np.argsort(-true[b])[:k]}
        got = {h.key for h in hits[b]}
        recalls.append(len(exact & got) / k)
    floor = 1.0 if strategy == "exact" else 0.85
    assert np.mean(recalls) >= floor, (strategy, similarity, np.mean(recalls))


def test_bf16_storage_flag(rng, tmp_path):
    """bf16 arenas halve HBM; recall stays within noise of f32."""
    import jax.numpy as jnp

    from nucliadb_tpu.index.vector import (
        Elem, VectorConfig, VectorSearcher, VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.segment import create_segment
    from nucliadb_tpu.types import Seq, SimpleOpenIndex

    n, d, k = 1000, 64, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    cfg = VectorConfig(dimension=d, flags=["bf16"])
    elems = [Elem(key=f"r/{i:05d}", vectors=v[i : i + 1]) for i in range(n)]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    assert searcher.index.vectors.dtype == jnp.bfloat16

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
