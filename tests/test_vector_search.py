import numpy as np
import pytest

from nucliadb_tpu.index.vector import (
    Elem,
    VectorConfig,
    VectorIndexer,
    VectorSearcher,
    VectorSearchRequest,
)
from nucliadb_tpu.index.vector.segment import create_segment
from nucliadb_tpu.query_language import LabelAtom, KeyPrefixAtom, and_, not_
from nucliadb_tpu.types import FieldId, PrefilterResult, Seq, SimpleOpenIndex


def build_index(tmp_path, rng, n=200, d=64, similarity="dot", n_segments=2, labels=True):
    cfg = VectorConfig(dimension=d, similarity=similarity)
    per = n // n_segments
    segs = []
    all_vecs = []
    all_keys = []
    for s in range(n_segments):
        elems = []
        for i in range(per):
            gid = s * per + i
            v = rng.standard_normal((1, d)).astype(np.float32)
            key = f"r{gid % 5}/f1/{gid}/0-10"
            lab = ["/l/ls/even"] if (labels and gid % 2 == 0) else ["/l/ls/odd"]
            elems.append(Elem(key=key, vectors=v, labels=lab))
            all_vecs.append(v[0])
            all_keys.append(key)
        meta = create_segment(str(tmp_path / f"s{s}"), elems, cfg)
        segs.append((meta, Seq(s + 1)))
    open_index = SimpleOpenIndex(segment_list=segs)
    searcher = VectorSearcher(cfg, open_index)
    return searcher, np.stack(all_vecs), all_keys, cfg


def test_exact_search_matches_bruteforce(rng, tmp_path):
    """The primary correctness oracle, as in the reference
    (nidx_vector/src/segment.rs:841-912): results == brute force."""
    searcher, vecs, keys, _ = build_index(tmp_path, rng)
    q = rng.standard_normal(64).astype(np.float32)
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=5))[0]
    scores = vecs @ q
    order = np.argsort(-scores)[:5]
    # keys are stored sorted per segment; map expected keys by score
    expected = sorted(
        [(float(scores[i]), sorted(keys)[0]) for i in order], reverse=True
    )
    got_scores = [h.score for h in hits]
    np.testing.assert_allclose(got_scores, sorted(scores, reverse=True)[:5], rtol=1e-4)
    assert len(hits) == 5


def test_search_respects_label_filter(rng, tmp_path):
    searcher, vecs, keys, _ = build_index(tmp_path, rng)
    q = rng.standard_normal(64).astype(np.float32)
    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=10, filter=LabelAtom("/l/ls/even"))
    )[0]
    assert len(hits) == 10
    assert all("/l/ls/even" in h.labels for h in hits)


def test_search_not_filter(rng, tmp_path):
    searcher, _, _, _ = build_index(tmp_path, rng)
    q = rng.standard_normal(64).astype(np.float32)
    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=10, filter=not_(LabelAtom("/l/ls/even")))
    )[0]
    assert all("/l/ls/odd" in h.labels for h in hits)


def test_search_key_prefix_and_prefilter(rng, tmp_path):
    searcher, vecs, keys, _ = build_index(tmp_path, rng)
    q = rng.standard_normal(64).astype(np.float32)
    # via filter expression
    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=50, filter=KeyPrefixAtom(("r1/",)))
    )[0]
    assert 0 < len(hits)
    assert all(h.key.startswith("r1/") for h in hits)
    # via prefilter handoff
    pf = PrefilterResult.some([FieldId("r1", "f1")])
    hits2 = searcher.search(
        VectorSearchRequest(vectors=q, top_k=50, field_filter=pf)
    )[0]
    assert {h.key for h in hits2} == {h.key for h in hits}
    # prefilter NONE -> no results
    hits3 = searcher.search(
        VectorSearchRequest(
            vectors=q, top_k=5, field_filter=PrefilterResult.none()
        )
    )[0]
    assert hits3 == []


def test_min_score(rng, tmp_path):
    searcher, vecs, _, _ = build_index(tmp_path, rng)
    q = rng.standard_normal(64).astype(np.float32)
    max_score = float(np.max(vecs @ q))
    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=10, min_score=max_score + 1.0)
    )[0]
    assert hits == []


def test_deletions_applied_at_open(rng, tmp_path):
    cfg = VectorConfig(dimension=16)
    elems = [
        Elem(key=f"r1/f1/{i}/0-1", vectors=rng.standard_normal((1, 16)).astype(np.float32))
        for i in range(10)
    ]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    open_index = SimpleOpenIndex(
        segment_list=[(meta, Seq(1))], deletion_list=[("r1/", Seq(2))]
    )
    searcher = VectorSearcher(cfg, open_index)
    hits = searcher.search(
        VectorSearchRequest(vectors=rng.standard_normal(16).astype(np.float32), top_k=5)
    )[0]
    assert hits == []


def test_hidden_segments_excluded(rng, tmp_path):
    cfg = VectorConfig(dimension=16)
    e1 = [Elem(key="r1/f1/0/0-1", vectors=np.ones((1, 16), np.float32))]
    e2 = [Elem(key="r2/f1/0/0-1", vectors=np.ones((1, 16), np.float32))]
    m1 = create_segment(str(tmp_path / "s1"), e1, cfg, tags=["hidden"])
    m2 = create_segment(str(tmp_path / "s2"), e2, cfg)
    open_index = SimpleOpenIndex(segment_list=[(m1, Seq(1)), (m2, Seq(2))])
    searcher = VectorSearcher(cfg, open_index)
    q = np.ones(16, np.float32)
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=10))[0]
    assert [h.key for h in hits] == ["r2/f1/0/0-1"]
    # with_duplicates=True: the two resources share an identical vector and
    # would otherwise collapse under the default Fssc-style dedup
    hits_all = searcher.search(
        VectorSearchRequest(
            vectors=q, top_k=10, include_hidden=True, with_duplicates=True
        )
    )[0]
    assert {h.key for h in hits_all} == {"r1/f1/0/0-1", "r2/f1/0/0-1"}


def test_multivector_maxsim(rng, tmp_path):
    """MaxSim semantics parity with nidx_vector/src/multivector.rs:33-46."""
    cfg = VectorConfig(dimension=8, cardinality="multi")
    d = 8
    docs = {
        "r1/f1/0-10": rng.standard_normal((3, d)).astype(np.float32),
        "r1/f1/10-20": rng.standard_normal((4, d)).astype(np.float32),
        "r2/f1/0-10": rng.standard_normal((2, d)).astype(np.float32),
    }
    elems = [Elem(key=k, vectors=v) for k, v in docs.items()]
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    q = rng.standard_normal((2, d)).astype(np.float32)  # 2 sub-vectors
    hits = searcher.search(VectorSearchRequest(vectors=q[None], top_k=3))[0]
    # reference semantics: sum over query tokens of max over doc tokens
    expected = {
        k: sum(float(np.max(v @ q[m])) for m in range(2)) for k, v in docs.items()
    }
    got = {h.key: h.score for h in hits}
    for k, s in got.items():
        np.testing.assert_allclose(s, expected[k], rtol=1e-4)
    assert list(got) == sorted(expected, key=lambda k: -expected[k])


def test_indexer_from_resource(rng, tmp_path):
    from nucliadb_tpu.models.internal import (
        IndexParagraph,
        ResourceDoc,
        TextInformation,
        VectorSentence,
    )

    rd = ResourceDoc(resource_id="r1", labels=["/n/s/PROCESSED"])
    rd.texts["t/text1"] = TextInformation(text="hello world", labels=["/t/t"])
    para = IndexParagraph(start=0, end=11, labels=["/p/x"])
    para.vectorsets_sentences["vs1"] = {
        "r1/t/text1/0/0-11": VectorSentence(vector=rng.standard_normal(16).astype(np.float32))
    }
    rd.paragraphs["t/text1"] = {"r1/t/text1/0-11": para}

    cfg = VectorConfig(dimension=16)
    indexer = VectorIndexer(cfg)
    meta = indexer.index_resource(rd, "vs1", str(tmp_path / "seg"))
    assert meta is not None and meta.records == 1
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    hits = searcher.search(
        VectorSearchRequest(vectors=rng.standard_normal(16).astype(np.float32), top_k=1)
    )[0]
    assert hits[0].key == "r1/t/text1/0/0-11"
    assert "/n/s/PROCESSED" in hits[0].labels and "/p/x" in hits[0].labels
    # no sentences for unknown vectorset
    assert indexer.index_resource(rd, "nope", str(tmp_path / "seg2")) is None
import threading

import numpy as np

from nucliadb_tpu.index.vector.batcher import QueryCoalescer


class FakeSearcher:
    """Counts batch dispatches; scores = dot against stored rows."""

    def __init__(self, vectors):
        self.vectors = vectors
        self.calls = 0
        self.lock = threading.Lock()

    def search(self, request):
        import time

        with self.lock:
            self.calls += 1
        time.sleep(0.01)  # emulate the device dispatch round trip —
        # natural batching only engages while a dispatch is in flight
        q = np.atleast_2d(np.asarray(request.vectors, np.float32))
        scores = q @ self.vectors.T
        out = []
        for row in scores:
            order = np.argsort(-row)[: request.top_k]
            out.append([(int(i), float(row[i])) for i in order])
        return out


def test_coalescer_batches_concurrent_queries(rng):
    from nucliadb_tpu.index.vector import VectorSearchRequest

    vectors = rng.standard_normal((64, 8)).astype(np.float32)
    searcher = FakeSearcher(vectors)
    # concurrency=1 makes the batching deterministic for the call-count
    # assertion (the default 4 pipeline slots trade batch size for overlap)
    co = QueryCoalescer(max_batch=64, concurrency=1)

    queries = rng.standard_normal((16, 8)).astype(np.float32)
    results = [None] * 16
    barrier = threading.Barrier(16)

    def worker(i):
        barrier.wait()
        req = VectorSearchRequest(vectors=queries[i], top_k=5)
        results[i] = co.search_one(searcher, req)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # every caller got ITS OWN query's results (scores to float tolerance:
    # batched vs solo matmuls round differently)
    for i in range(16):
        solo = searcher.search(VectorSearchRequest(vectors=queries[i], top_k=5))[0]
        assert [h[0] for h in results[i]] == [h[0] for h in solo], i
        np.testing.assert_allclose(
            [h[1] for h in results[i]], [h[1] for h in solo], rtol=1e-5
        )
    # and the 16 queries rode far fewer dispatches than 16
    coalesced_calls = searcher.calls - 16  # minus the solo verification calls
    assert coalesced_calls <= 4, coalesced_calls


def test_coalescer_filtered_queries_go_solo(rng):
    from nucliadb_tpu.index.vector import VectorSearchRequest
    from nucliadb_tpu.query_language import LabelAtom

    req = VectorSearchRequest(
        vectors=rng.standard_normal(8).astype(np.float32),
        filter=LabelAtom("/l/a/b"),
    )
    assert not QueryCoalescer.eligible(req)
    batch = VectorSearchRequest(vectors=rng.standard_normal((4, 8)).astype(np.float32))
    assert not QueryCoalescer.eligible(batch)


def test_coalescer_propagates_errors(rng):
    from nucliadb_tpu.index.vector import VectorSearchRequest

    class Boom:
        def search(self, request):
            raise ValueError("boom")

    co = QueryCoalescer()
    import pytest

    with pytest.raises((ValueError, RuntimeError)):
        co.search_one(Boom(), VectorSearchRequest(vectors=rng.standard_normal(8).astype(np.float32)))


def test_with_duplicates_dedup(rng, tmp_path):
    """Identical-vector results collapse by default and survive with
    with_duplicates=True (parity: the reference's Fssc vector dedup,
    nidx_vector/src/searcher.rs:150-199; nodereader SearchRequest
    with_duplicates, proto default false)."""
    d = 32
    cfg = VectorConfig(dimension=d)
    base = rng.standard_normal((20, d)).astype(np.float32)
    dup = base[0].copy()
    elems = [
        Elem(key=f"r{i}/f1/{i}/0-10", vectors=base[i][None], labels=[])
        for i in range(20)
    ]
    # three more paragraphs carrying the EXACT same vector as r0
    for j in range(3):
        elems.append(Elem(key=f"dup{j}/f1/{j}/0-10", vectors=dup[None], labels=[]))
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))

    q = dup + 0.01 * rng.standard_normal(d).astype(np.float32)

    # default: duplicates collapse to one result
    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=6))[0]
    keys = [h.key for h in hits]
    dup_like = [k for k in keys if k.startswith(("r0/", "dup"))]
    assert len(dup_like) == 1, keys

    # with_duplicates=True returns every copy
    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=6, with_duplicates=True)
    )[0]
    keys = [h.key for h in hits]
    dup_like = [k for k in keys if k.startswith(("r0/", "dup"))]
    assert len(dup_like) == 4, keys


@pytest.mark.parametrize("flag", ["ivf", "hnsw"])
def test_with_duplicates_dedup_ivf_hnsw(rng, tmp_path, flag):
    """Regression: the ivf/hnsw strategies silently ignored the default
    Fssc dedup (with_duplicates=False); they now over-fetch and run the
    shared exact-rescore + duplicate-mask cut."""
    d = 32
    cfg = VectorConfig(dimension=d, flags=frozenset({flag}))
    base = rng.standard_normal((64, d)).astype(np.float32)
    dup = base[0].copy()
    elems = [
        Elem(key=f"r{i}/f1/{i}/0-10", vectors=base[i][None], labels=[])
        for i in range(64)
    ]
    for j in range(3):
        elems.append(Elem(key=f"dup{j}/f1/{j}/0-10", vectors=dup[None], labels=[]))
    meta = create_segment(str(tmp_path / "s"), elems, cfg)
    searcher = VectorSearcher(cfg, SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    q = dup + 0.001 * rng.standard_normal(d).astype(np.float32)

    hits = searcher.search(VectorSearchRequest(vectors=q, top_k=6))[0]
    keys = [h.key for h in hits]
    dup_like = [k for k in keys if k.startswith(("r0/", "dup"))]
    assert len(dup_like) == 1, keys

    hits = searcher.search(
        VectorSearchRequest(vectors=q, top_k=6, with_duplicates=True)
    )[0]
    keys = [h.key for h in hits]
    dup_like = [k for k in keys if k.startswith(("r0/", "dup"))]
    assert len(dup_like) == 4, keys
