import numpy as np
import pytest

from nucliadb_tpu.index.vector import VectorConfig, Elem
from nucliadb_tpu.index.vector.segment import (
    alive_mask,
    create_segment,
    merge_segments,
    open_segment,
)
from nucliadb_tpu.types import Seq, SimpleOpenIndex


def make_elems(rng, n, d, prefix="r1/f1"):
    return [
        Elem(
            key=f"{prefix}/{i}/0-10",
            vectors=rng.standard_normal((1, d)).astype(np.float32),
            labels=["/l/ls/even" if i % 2 == 0 else "/l/ls/odd"],
            metadata={"field": prefix, "position": {"start": 0, "end": 10}},
        )
        for i in range(n)
    ]


def test_create_open_roundtrip(rng, tmp_path):
    cfg = VectorConfig(dimension=32)
    elems = make_elems(rng, 10, 32)
    meta = create_segment(str(tmp_path / "s1"), elems, cfg)
    assert meta.records == 10
    seg = open_segment(meta.path)
    assert seg.n_paragraphs == 10
    assert seg.n_vectors == 10
    assert seg.keys == sorted(e.key for e in elems)
    assert set(seg.labels) == {"/l/ls/even", "/l/ls/odd"}
    assert len(seg.labels["/l/ls/even"]) == 5


def test_cosine_normalizes_on_write(rng, tmp_path):
    cfg = VectorConfig(dimension=16, similarity="cosine")
    meta = create_segment(str(tmp_path / "s"), make_elems(rng, 5, 16), cfg)
    seg = open_segment(meta.path)
    norms = np.linalg.norm(np.asarray(seg.vectors), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_alive_mask_seq_semantics(rng, tmp_path):
    """Deletions apply iff seq > segment seq (nidx_vector/src/lib.rs:166-200)."""
    cfg = VectorConfig(dimension=8)
    meta = create_segment(str(tmp_path / "s"), make_elems(rng, 4, 8, "r1/f1"), cfg)
    seg = open_segment(meta.path)
    # deletion at same seq as segment: NOT applied
    assert alive_mask(seg, Seq(5), [("r1/", Seq(5))]).all()
    # deletion at later seq: applied
    assert not alive_mask(seg, Seq(5), [("r1/", Seq(6))]).any()
    # prefix of a single paragraph
    m = alive_mask(seg, Seq(5), [(seg.keys[0], Seq(9))])
    assert not m[0] and m[1:].all()


def test_multivector_elem(rng, tmp_path):
    cfg = VectorConfig(dimension=8, cardinality="multi")
    elems = [
        Elem(key="r1/f1/0-10", vectors=rng.standard_normal((3, 8)).astype(np.float32)),
        Elem(key="r1/f1/10-20", vectors=rng.standard_normal((2, 8)).astype(np.float32)),
    ]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    seg = open_segment(meta.path)
    assert seg.n_paragraphs == 2
    assert seg.n_vectors == 5
    assert seg.vec_para.tolist() == [0, 0, 0, 1, 1]


def test_merge_drops_deleted_and_rebuilds(rng, tmp_path):
    cfg = VectorConfig(dimension=8)
    m1 = create_segment(str(tmp_path / "s1"), make_elems(rng, 4, 8, "r1/f1"), cfg)
    m2 = create_segment(str(tmp_path / "s2"), make_elems(rng, 3, 8, "r2/f1"), cfg)
    open_index = SimpleOpenIndex(
        segment_list=[(m1, Seq(1)), (m2, Seq(2))],
        deletion_list=[("r1/", Seq(3))],  # kills all of s1
    )
    merged = merge_segments(str(tmp_path / "merged"), open_index, cfg)
    assert merged.records == 3
    seg = open_segment(merged.path)
    assert all(k.startswith("r2/") for k in seg.keys)
    # vectors preserved bit-exact
    orig = open_segment(m2.path)
    np.testing.assert_array_equal(np.asarray(seg.vectors), np.asarray(orig.vectors))


def test_merge_preserves_tags(rng, tmp_path):
    cfg = VectorConfig(dimension=8)
    m1 = create_segment(str(tmp_path / "s1"), make_elems(rng, 2, 8, "r1/f1"), cfg, tags=["hidden"])
    m2 = create_segment(str(tmp_path / "s2"), make_elems(rng, 2, 8, "r2/f1"), cfg)
    open_index = SimpleOpenIndex(segment_list=[(m1, Seq(1)), (m2, Seq(2))])
    merged = merge_segments(str(tmp_path / "m"), open_index, cfg)
    assert "hidden" in merged.tags


def test_incremental_arena_extend_matches_full_build(tmp_path, rng):
    """A refresh that appends segments must produce byte-identical search
    behavior whether the arena was extended on device (delta upload) or
    rebuilt from scratch — and content changes must force the full path."""
    import numpy as np

    from nucliadb_tpu.index.vector import Elem, VectorSearchRequest, VectorSearcher
    from nucliadb_tpu.index.vector.config import VectorConfig
    from nucliadb_tpu.index.vector.device import DeviceVectorIndex
    from nucliadb_tpu.index.vector.segment import create_segment, open_segment
    from nucliadb_tpu.types import Seq, SimpleOpenIndex

    cfg = VectorConfig(dimension=16)

    def seg(n, name, base):
        elems = [
            Elem(
                key=f"r{base + i}/t/t/0/0-10",
                vectors=rng.standard_normal((1, 16)).astype(np.float32),
                labels=[],
                metadata={},
            )
            for i in range(n)
        ]
        meta = create_segment(str(tmp_path / name), elems, cfg)
        return (open_segment(meta.path), Seq(base))

    s1, s2, s3 = seg(40, "s1", 100), seg(30, "s2", 200), seg(25, "s3", 300)

    prev = DeviceVectorIndex(cfg, [s1, s2])
    incr = DeviceVectorIndex(cfg, [s1, s2, s3], prev=prev)
    full = DeviceVectorIndex(cfg, [s1, s2, s3])
    assert incr.n_para == full.n_para == 95
    np.testing.assert_array_equal(
        np.asarray(incr.vectors), np.asarray(full.vectors)
    )

    q = rng.standard_normal((3, 16)).astype(np.float32)
    si, ii = incr.search(q, 7)
    sf, if_ = full.search(q, 7)
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(if_))
    np.testing.assert_allclose(np.asarray(si), np.asarray(sf), rtol=1e-6)

    # prev still serves its own (shorter) corpus untouched
    sp, ip = prev.search(q, 7)
    assert int(np.asarray(ip).max()) < 70

    # a reordered/merged segment list breaks the prefix -> full rebuild path
    reordered = DeviceVectorIndex(cfg, [s2, s1, s3], prev=prev)
    sr, ir = reordered.search(q, 7)
    fresh = DeviceVectorIndex(cfg, [s2, s1, s3])
    s2_, i2_ = fresh.search(q, 7)
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(i2_))


def test_incremental_codes_extend_matches_full_encode(tmp_path, rng, monkeypatch):
    """Int8 codes extended row-by-row must equal a full re-encode."""
    import numpy as np

    from nucliadb_tpu.index.vector import Elem
    from nucliadb_tpu.index.vector import device as device_mod
    from nucliadb_tpu.index.vector.config import VectorConfig
    from nucliadb_tpu.index.vector.device import DeviceVectorIndex
    from nucliadb_tpu.index.vector.segment import create_segment, open_segment
    from nucliadb_tpu.types import Seq

    monkeypatch.setattr(device_mod, "EXACT_SCAN_THRESHOLD", 10)
    cfg = VectorConfig(dimension=16)

    def seg(n, name, base):
        elems = [
            Elem(
                key=f"r{base + i}/t/t/0/0-10",
                vectors=rng.standard_normal((1, 16)).astype(np.float32),
                labels=[],
                metadata={},
            )
            for i in range(n)
        ]
        meta = create_segment(str(tmp_path / name), elems, cfg)
        return (open_segment(meta.path), Seq(base))

    s1, s2 = seg(50, "c1", 100), seg(30, "c2", 200)
    prev = DeviceVectorIndex(cfg, [s1])
    assert prev.codes is not None  # threshold lowered -> codes exist
    incr = DeviceVectorIndex(cfg, [s1, s2], prev=prev)
    full = DeviceVectorIndex(cfg, [s1, s2])
    assert incr.codes is not None and full.codes is not None
    np.testing.assert_array_equal(
        np.asarray(incr.codes.codes), np.asarray(full.codes.codes)
    )
    np.testing.assert_allclose(
        np.asarray(incr.codes.scale), np.asarray(full.codes.scale), rtol=1e-6
    )
    q = rng.standard_normal((2, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(incr.search(q, 5)[1]), np.asarray(full.search(q, 5)[1])
    )
