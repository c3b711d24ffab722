"""Differential test: vectorized relation-index evaluation vs the scalar
per-edge oracle (the pre-vectorization reference semantics kept in the
class — see index/relation/__init__.py `_compile_expr`)."""

import json
import math
import os
import random

import msgpack
import numpy as np
import pytest

from nucliadb_tpu.index.relation import (
    GraphSearchRequest,
    NodePattern,
    RelationPattern,
    RelationSearcher,
)
from nucliadb_tpu.types import SegmentMetadata, SimpleOpenIndex

VALUES = [
    "apple",
    "aple",  # d=1 from apple
    "apples",
    "Apple Pie",
    "banana",
    "banan",
    "orange",
    "Órange",  # diacritic-folds to orange
    "kiwi fruit",
    "kiwi fruits",
    "dragonfruit",
    "",
]
TYPES = ["ENTITY", "PLACE", "AGENT", ""]
SUBTYPES = ["", "fruit", "person"]
RELATIONS = ["likes", "knows", "visited", ""]
LABELS = ["strong", "weak", "LIKES", ""]
FACETS = [[], ["/g/u"], ["/g/da/labeler"], ["/g/da"], ["/g"], ["/g/x"], ["/other"]]


def make_edges(rng: random.Random, n: int) -> list[dict]:
    edges = []
    for i in range(n):
        edges.append(
            {
                "key": f"r{rng.randrange(20)}/f{rng.randrange(4)}",
                "source_value": rng.choice(VALUES),
                "source_type": rng.choice(TYPES),
                "source_subtype": rng.choice(SUBTYPES),
                "target_value": rng.choice(VALUES),
                "target_type": rng.choice(TYPES),
                "target_subtype": rng.choice(SUBTYPES),
                "relation": rng.choice(RELATIONS),
                "label": rng.choice(LABELS),
                "metadata": {},
                "facets": list(rng.choice(FACETS)),
            }
        )
    return edges


@pytest.fixture(scope="module")
def searcher(tmp_path_factory):
    rng = random.Random(7)
    edges = make_edges(rng, 400)
    seg_dir = str(tmp_path_factory.mktemp("relseg"))
    with open(os.path.join(seg_dir, "edges.msgpack"), "wb") as f:
        f.write(msgpack.packb(edges))
    meta = {"records": len(edges), "kind": "relation"}
    with open(os.path.join(seg_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    open_index = SimpleOpenIndex(
        segment_list=[
            (SegmentMetadata(path=seg_dir, records=len(edges), index_metadata=meta), 1)
        ]
    )
    return RelationSearcher(open_index)


def rand_node_leaf(rng: random.Random) -> dict:
    d: dict = {"prop": "node"}
    if rng.random() < 0.8:
        d["value"] = rng.choice(VALUES + ["appl", "banana oat", "kiwi"])
    if rng.random() < 0.4:
        d["type"] = rng.choice(TYPES)
    if rng.random() < 0.3:
        d["group"] = rng.choice(SUBTYPES)
    match = rng.choice(["exact", "exact", "fuzzy", "fuzzy_words", "semantic"])
    d["match"] = match
    if rng.random() < 0.4:
        d["prefix"] = True
    if match in ("fuzzy", "fuzzy_words") and rng.random() < 0.5:
        # proto FuzzyMatch.distance / Exact{WORDS} (distance=0) parametrization
        d["distance"] = rng.choice([0, 1, 2])
    if match == "semantic":
        d["semantic_matches"] = {
            "apple": 0.9,
            "banana": 0.5,
            "kiwi fruit": 0.7,
            "orange": -0.2,
        }
    return d


def rand_rel_leaf(rng: random.Random) -> dict:
    d: dict = {"prop": "relation"}
    if rng.random() < 0.7:
        d["type"] = rng.choice(RELATIONS)
    if rng.random() < 0.7:
        d["label"] = rng.choice(LABELS)
        if rng.random() < 0.3:
            d["match"] = "semantic"
            d["semantic_matches"] = {"strong": 0.8, "likes": 0.6}
    return d


def rand_generated_leaf(rng: random.Random) -> dict:
    by = rng.choice(["user", "processor", "data-augmentation"])
    d = {"prop": "generated", "by": by}
    if by == "data-augmentation" and rng.random() < 0.5:
        d["da_task"] = "labeler"
    return d


def rand_path_leaf(rng: random.Random) -> dict:
    def node_d():
        d = rand_node_leaf(rng)
        d.pop("prop")
        return d

    rel = rand_rel_leaf(rng)
    rel.pop("prop")
    return {
        "prop": "path",
        "source": node_d() if rng.random() < 0.8 else {},
        "destination": node_d() if rng.random() < 0.8 else {},
        "relation": rel if rng.random() < 0.7 else {},
        "undirected": rng.random() < 0.4,
    }


def rand_expr(rng: random.Random, depth: int = 0) -> dict:
    r = rng.random()
    if depth < 2 and r < 0.35:
        comb = rng.choice(["and", "or", "not"])
        if comb == "not":
            return {"not": rand_expr(rng, depth + 1)}
        return {comb: [rand_expr(rng, depth + 1) for _ in range(rng.randrange(1, 4))]}
    leaf = rng.choice(
        ["path", "node", "source_node", "destination_node", "relation", "generated", "facet"]
    )
    if leaf == "path":
        return rand_path_leaf(rng)
    if leaf == "relation":
        return rand_rel_leaf(rng)
    if leaf == "generated":
        return rand_generated_leaf(rng)
    if leaf == "facet":
        # GraphQuery.PathQuery facet leaf (proto plane) — exercise exact
        # facets, ancestors (tantivy descendant semantics) and misses
        return {"prop": "facet", "facet": rng.choice(
            ["/g/u", "/g/da", "/g/da/labeler", "/g", "/other", "/nope"]
        )}
    d = rand_node_leaf(rng)
    d["prop"] = leaf
    return d


def rand_node_expr(rng: random.Random, depth: int = 0) -> dict:
    r = rng.random()
    if depth < 2 and r < 0.35:
        comb = rng.choice(["and", "or", "not"])
        if comb == "not":
            return {"not": rand_node_expr(rng, depth + 1)}
        return {comb: [rand_node_expr(rng, depth + 1) for _ in range(rng.randrange(1, 4))]}
    if rng.random() < 0.2:
        return rand_generated_leaf(rng)
    return rand_node_leaf(rng)


def test_eval_expr_matches_scalar_oracle(searcher):
    rng = random.Random(101)
    for trial in range(120):
        q = rand_expr(rng)
        vec = searcher._eval_expr(q)
        pred = searcher._compile_expr(q)
        for i, e in enumerate(searcher.edges):
            expected = pred(e)
            got = float(vec[i])
            if expected is None:
                assert math.isnan(got), (trial, q, i, e, got)
            else:
                assert not math.isnan(got), (trial, q, i, e, expected)
                assert got == pytest.approx(expected, abs=1e-4), (trial, q, i, e)


def test_eval_node_expr_matches_scalar_oracle(searcher):
    rng = random.Random(202)
    for trial in range(80):
        q = rand_node_expr(rng)
        for position in ("source", "destination"):
            vec = searcher._eval_node_expr(q, position)
            pred = searcher._compile_node_expr(q, position)
            for i, e in enumerate(searcher.edges):
                expected = pred(e)
                got = float(vec[i])
                if expected is None:
                    assert math.isnan(got), (trial, q, position, i)
                else:
                    assert got == pytest.approx(expected, abs=1e-4), (trial, q, position, i)


def test_graph_search_matches_scalar(searcher):
    rng = random.Random(303)
    for _ in range(40):
        src_d = rand_node_leaf(rng)
        dst_d = rand_node_leaf(rng)
        req = GraphSearchRequest(
            source=NodePattern(
                value=src_d.get("value"),
                ntype=src_d.get("type"),
                subtype=src_d.get("group"),
                match=src_d.get("match", "exact"),
                prefix=bool(src_d.get("prefix", False)),
                semantic_matches=src_d.get("semantic_matches"),
            ),
            relation=RelationPattern(relation=rng.choice(RELATIONS + [None])),
            target=NodePattern(
                value=dst_d.get("value"),
                ntype=dst_d.get("type"),
                match=dst_d.get("match", "exact"),
                prefix=bool(dst_d.get("prefix", False)),
                semantic_matches=dst_d.get("semantic_matches"),
            ),
            undirected=rng.random() < 0.5,
            top_k=17,
        )
        got = searcher.graph_search(req)
        # oracle: first top_k matching edges in order
        expected = []
        for e in searcher.edges:
            if searcher._rel_score(req.relation, e) is None:
                continue
            fwd = searcher._node_matches(
                req.source, e["source_value"], e["source_type"], e["source_subtype"]
            ) and searcher._node_matches(
                req.target, e["target_value"], e["target_type"], e["target_subtype"]
            )
            bwd = req.undirected and (
                searcher._node_matches(
                    req.source, e["target_value"], e["target_type"], e["target_subtype"]
                )
                and searcher._node_matches(
                    req.target, e["source_value"], e["source_type"], e["source_subtype"]
                )
            )
            if fwd or bwd:
                expected.append(e["key"])
            if len(expected) >= req.top_k:
                break
        assert [p.resource_field for p in got] == expected


def test_graph_search_expr_ranking(searcher):
    rng = random.Random(404)
    for _ in range(30):
        q = rand_expr(rng)
        got = searcher.graph_search_expr(q, top_k=25)
        pred = searcher._compile_expr(q)
        scored = []
        for e in searcher.edges:
            s = pred(e)
            if s is None:
                continue
            scored.append((s, e))
        scored.sort(key=lambda t: (-t[0], t[1]["key"]))
        expected = [(e["key"], s) for s, e in scored[:25]]
        assert len(got) == len(expected)
        for p, (key, s) in zip(got, expected):
            # ties may order differently between float32 and python floats
            # only when scores are equal; compare score sequences + keys on
            # strictly-ordered entries
            assert p.score == pytest.approx(s, abs=1e-4)
        # the returned key multiset must match the oracle's top-k whenever
        # there is no tie straddling the cutoff
        if len(scored) <= 25 or scored[24][0] != scored[25][0]:
            assert sorted(p.resource_field for p in got) == sorted(k for k, _ in expected)


def test_nodes_and_relations_search_match_oracle(searcher):
    rng = random.Random(505)

    def edge_ok(e):
        return hash(e["key"]) % 3 != 0

    for _ in range(40):
        nq = rand_node_expr(rng)
        got = searcher.nodes_search(nq, top_k=1000, edge_ok=edge_ok)
        best: dict = {}
        for position in ("source", "destination"):
            pred = searcher._compile_node_expr(nq, position)
            for e in searcher.edges:
                if not edge_ok(e):
                    continue
                s = pred(e)
                if s is None:
                    continue
                key = (
                    (e["source_value"], e["source_type"], e["source_subtype"])
                    if position == "source"
                    else (e["target_value"], e["target_type"], e["target_subtype"])
                )
                if s > best.get(key, -1.0):
                    best[key] = s
        got_map = {(n.value, n.ntype, n.subtype): s for n, s in got}
        assert set(got_map) == set(best), nq
        for k, s in best.items():
            assert got_map[k] == pytest.approx(s, abs=1e-4)

    for _ in range(40):
        q = rand_expr(rng)
        got = searcher.relations_search(q, top_k=1000, edge_ok=edge_ok)
        pred = searcher._compile_expr(q)
        best = {}
        for e in searcher.edges:
            if not edge_ok(e):
                continue
            s = pred(e)
            if s is None:
                continue
            key = (e["relation"], e["label"])
            if s > best.get(key, -1.0):
                best[key] = s
        got_map = {(rel, label): s for rel, label, s in got}
        assert set(got_map) == set(best), q
        for k, s in best.items():
            assert got_map[k] == pytest.approx(s, abs=1e-4)


def test_neighbours_and_empty_index(searcher, tmp_path):
    paths = searcher.neighbours(["Apple", "órange"], top_k=10)
    assert paths
    for p in paths:
        norm = {"apple", "orange"}
        assert (
            p.source.value.lower() in ("apple", "orange", "órange")
            or p.target.value.lower() in ("apple", "orange", "órange")
            or p.source.value.lower().replace("ó", "o") in norm
            or p.target.value.lower().replace("ó", "o") in norm
        )
    empty = RelationSearcher(SimpleOpenIndex())
    assert empty.graph_search(GraphSearchRequest()) == []
    assert empty.graph_search_expr({"prop": "node", "value": "x"}) == []
    assert empty.nodes_search({"prop": "node", "value": "x"}) == []
    assert empty.relations_search({"prop": "relation", "type": "likes"}) == []
    assert empty.neighbours(["x"]) == []
    with pytest.raises(ValueError):
        empty.graph_search_expr({"prop": "wat"})


def test_projections_keep_negative_semantic_scores(searcher):
    """Regression: matched edges whose semantic score is <= -1 (dot/cosine
    legs can be negative) must still rank, not be dropped by an implicit
    score floor."""
    q = {
        "prop": "path",
        "source": {
            "value": "apple",
            "match": "semantic",
            "semantic_matches": {"apple": -1.7},
        },
        "destination": {},
        "relation": {},
    }
    nq = {
        "prop": "node",
        "value": "apple",
        "match": "semantic",
        "semantic_matches": {"apple": -1.7},
    }
    nodes = searcher.nodes_search(nq, top_k=10)
    assert any(n.value == "apple" and s == pytest.approx(-1.7) for n, s in nodes)
    rels = searcher.relations_search(q, top_k=50)
    # every edge sourced at 'apple' matches with the negative score
    expected = {
        (e["relation"], e["label"])
        for e in searcher.edges
        if e["source_value"] == "apple"
    }
    got = {(r, l) for r, l, s in rels}
    assert expected <= got
    assert all(s == pytest.approx(-1.7) for _, _, s in rels)


def test_dictionary_paths_used_and_equivalent(searcher, monkeypatch):
    """The term-dictionary accelerators (value postings, sorted prefix
    ranges, cached filter masks — VERDICT r4 task 4) must serve exact /
    prefix / fuzzy(d=1) node patterns, and fall back to the OSA loop only
    for the shapes the dictionary cannot answer (fuzzy+prefix, d>1, short
    tokens). Differential coverage lives in the fuzz above; this pins the
    ROUTE so a regression to O(U) scans cannot land silently."""
    calls = {"postings": 0, "range": 0}
    orig_post = RelationSearcher._value_postings
    orig_range = RelationSearcher._norm_range_ids

    def spy_post(self):
        calls["postings"] += 1
        return orig_post(self)

    def spy_range(self, lo, hi):
        calls["range"] += 1
        return orig_range(self, lo, hi)

    monkeypatch.setattr(RelationSearcher, "_value_postings", spy_post)
    monkeypatch.setattr(RelationSearcher, "_norm_range_ids", spy_range)

    searcher.graph_search(
        GraphSearchRequest(source=NodePattern(value="apple"), top_k=10)
    )
    assert calls["postings"] >= 1
    searcher.graph_search(
        GraphSearchRequest(source=NodePattern(value="appl", prefix=True), top_k=10)
    )
    assert calls["range"] >= 1
    before_fuzzy = calls["postings"]
    searcher.graph_search(
        GraphSearchRequest(
            source=NodePattern(value="aple", match="fuzzy"), top_k=10
        )
    )
    assert calls["postings"] > before_fuzzy  # fuzzy d=1 expands via dictionary

    # shapes the dictionary cannot serve keep the OSA loop: fuzzy+prefix
    before = dict(calls)
    searcher.graph_search(
        GraphSearchRequest(
            source=NodePattern(value="appl", match="fuzzy", prefix=True),
            top_k=10,
        )
    )
    assert calls["range"] == before["range"]

    # filter masks are cached per distinct value
    m1 = searcher._filter_mask("type", "ENTITY")
    m2 = searcher._filter_mask("type", "ENTITY")
    assert m1 is m2
