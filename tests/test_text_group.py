"""Mesh text group: co-resident shards' BM25 legs as ONE sharded program.

Differential validation on the 8-device virtual CPU mesh (conftest.py):
MeshTextGroup.search + ParagraphSearcher.finish_kernel vs S sequential
ParagraphSearcher.search calls must return IDENTICAL responses (hits,
scores, ematches, totals) — the group program runs the same
``_bm25_groups_core`` kernel per shard over the same planned inputs
(parallel/text_group.py parity contract). The product-level wiring is
covered by test_mesh_serving.py's find fuzz (mesh on/off agree) plus the
"<= 2 sharded programs" dispatch-count test here.
"""

import numpy as np
import pytest

@pytest.fixture(autouse=True)
def _kernel_only(monkeypatch):
    """These tests pin group-program vs sequential KERNEL parity; the host
    WAND tier (host_tier.py) would otherwise serve the sequential side and
    fp near-ties could reorder cuts (host-vs-kernel equivalence is fuzzed
    with tie tolerance in test_host_tier.py)."""
    monkeypatch.setenv("NDBTPU_TEXT_HOST_TIER", "0")


from nucliadb_tpu.index.paragraph import (
    ParagraphIndexer,
    ParagraphSearcher,
    ParagraphSearchRequest,
)
from nucliadb_tpu.models.internal import (
    IndexParagraph,
    ResourceDoc,
    Security,
    TextInformation,
)
from nucliadb_tpu.parallel.text_group import MeshTextGroup
from nucliadb_tpu.query_language import LabelAtom
from nucliadb_tpu.types import FieldId, PrefilterResult, Seq, SimpleOpenIndex

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _make_resource(rng, rid, n_paras):
    labels = [f"/l/ls/{'even' if rng.random() < 0.5 else 'odd'}"]
    rd = ResourceDoc(resource_id=rid, labels=labels, created=1000, modified=1000)
    words, bounds, pos = [], [], 0
    for _ in range(n_paras):
        k = int(rng.integers(3, 9))
        para_words = list(rng.choice(VOCAB, size=k))
        words.extend(para_words)
        text_len = sum(len(w) + 1 for w in para_words)
        bounds.append((pos, pos + text_len - 1))
        pos += text_len
    text = " ".join(words)
    rd.texts["t/t1"] = TextInformation(text=text, labels=[])
    rd.paragraphs["t/t1"] = {
        f"{rid}/t/t1/{s}-{e}": IndexParagraph(start=s, end=e, index=i)
        for i, (s, e) in enumerate(bounds)
    }
    return rd


def _build_shard(tmp_path, rng, name, n_res, with_deletions):
    indexer = ParagraphIndexer()
    segs = []
    n_segments = int(rng.integers(1, 3))
    per_seg = -(-n_res // n_segments)
    ri = 0
    for s in range(n_segments):
        docs = []
        # one multi-resource segment per batch: index_resource handles one
        # resource, so build per-resource segments grouped by seq
        for _ in range(min(per_seg, n_res - ri)):
            rd = _make_resource(rng, f"{name}-r{ri}", int(rng.integers(1, 4)))
            m = indexer.index_resource(rd, str(tmp_path / f"{name}-s{s}-{ri}"))
            segs.append((m, Seq(len(segs) + 1)))
            ri += 1
    deletions = []
    if with_deletions:
        deletions.append((f"{name}-r1/", Seq(len(segs) + 1)))
    return ParagraphSearcher(
        SimpleOpenIndex(segment_list=segs, deletion_list=deletions)
    )


def _random_request(rng, shard_searchers, body=None):
    body = body or " ".join(rng.choice(VOCAB, size=int(rng.integers(1, 4))))
    if rng.random() < 0.2:
        body += f" -{rng.choice(VOCAB)}"
    field_filter = PrefilterResult.all()
    if rng.random() < 0.3:
        # restrict to a random subset of each shard's fields: prefilters are
        # per-shard, so use a resource-id prefix every shard resolves
        field_filter = None  # marker: build per shard below
    return ParagraphSearchRequest(
        query=body,
        top_k=int(rng.integers(3, 30)),
        fuzzy=bool(rng.random() < 0.6),
        filter=LabelAtom("/l/ls/even") if rng.random() < 0.4 else None,
        field_filter=field_filter or PrefilterResult.all(),
        min_score=float(rng.random()) if rng.random() < 0.3 else None,
        all_terms=bool(rng.random() < 0.3),
    ), field_filter is None


def _resp_key(resp):
    return (
        [(h.paragraph_id, round(h.score, 4), h.ematch, h.doc_id) for h in resp.hits],
        resp.total,
        sorted(resp.ematches),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_text_group_matches_sequential(tmp_path, seed):
    rng = np.random.default_rng(seed)
    searchers = [
        _build_shard(tmp_path, rng, f"sh{i}", int(rng.integers(2, 7)),
                     with_deletions=(i % 2 == 0))
        for i in range(4)
    ]
    assert MeshTextGroup.eligible(searchers)
    group = MeshTextGroup(searchers)

    for trial in range(12):
        req, per_shard_prefilter = _random_request(rng, searchers)
        preqs = []
        for i, p in enumerate(searchers):
            pr = ParagraphSearchRequest(**{**req.__dict__})
            if per_shard_prefilter:
                # a SOME prefilter naming one live field of this shard
                rid = f"sh{i}-r0"
                pr.field_filter = PrefilterResult.some(
                    [FieldId(rid, "t/t1")]
                )
            preqs.append(pr)
        expected = [p.search(pr) for p, pr in zip(searchers, preqs)]
        queries = [p.plan_kernel_query(pr) for p, pr in zip(searchers, preqs)]
        assert all(q is not None for q in queries), trial
        top_s, top_ic, counts = group.search(queries, req.top_k)
        for i, (p, pr, q) in enumerate(zip(searchers, preqs, queries)):
            got = p.finish_kernel(pr, q, top_s[i], top_ic[i], int(counts[i]))
            assert _resp_key(got) == _resp_key(expected[i]), (trial, i)


def test_text_group_fallback_regimes(tmp_path):
    """Phrases and deep-pagination cursors are NOT mesh-plannable: the
    planner returns None and the caller falls back per shard."""
    from nucliadb_tpu.index.paragraph import SearchAfter

    rng = np.random.default_rng(9)
    p = _build_shard(tmp_path, rng, "fb", 3, with_deletions=False)
    assert p.plan_kernel_query(
        ParagraphSearchRequest(query='"alpha bravo"', top_k=5)
    ) is None
    assert p.plan_kernel_query(
        ParagraphSearchRequest(
            query="alpha", top_k=5, search_after=SearchAfter(score=1.0)
        )
    ) is None
    assert p.plan_kernel_query(ParagraphSearchRequest(query="", top_k=5)) is None
    # a plannable request really plans
    assert p.plan_kernel_query(
        ParagraphSearchRequest(query="alpha bravo", top_k=5)
    ) is not None


def test_text_group_scale_many_shards(tmp_path):
    """8 shards, a few thousand paragraphs: group == sequential with
    deletions, label filters, fuzzy and all_terms (the keyword analogue of
    test_mesh_serving.test_group_scale_uneven_shards)."""
    rng = np.random.default_rng(42)
    searchers = [
        _build_shard(tmp_path, rng, f"big{i}", 40 + 10 * i,
                     with_deletions=(i < 4))
        for i in range(8)
    ]
    assert MeshTextGroup.eligible(searchers)
    group = MeshTextGroup(searchers)
    for body, all_terms, fuzzy in [
        ("alpha bravo charlie", False, True),
        ("delta echo", True, False),
        ("foxtrot -alpha", False, True),
    ]:
        req = ParagraphSearchRequest(
            query=body, top_k=20, all_terms=all_terms, fuzzy=fuzzy,
            filter=LabelAtom("/l/ls/even"),
        )
        expected = [p.search(req) for p in searchers]
        queries = [p.plan_kernel_query(req) for p in searchers]
        top_s, top_ic, counts = group.search(queries, req.top_k)
        for i, (p, q) in enumerate(zip(searchers, queries)):
            got = p.finish_kernel(req, q, top_s[i], top_ic[i], int(counts[i]))
            assert _resp_key(got) == _resp_key(expected[i]), (body, i)
