"""JSON index: vectorized evaluation vs the scalar oracle + scale check.

Parity target: the reference evaluates JSON filters as indexed queries
(nidx_json/src/search.rs); round 1 ran a per-doc python loop (O(docs) host
time per filtered query). The vectorized evaluator must agree with the
scalar semantics exactly and stay fast at large doc counts.
"""

import json
import random
import time

import numpy as np
import pytest

from nucliadb_tpu.index.json import (
    JsonAnd,
    JsonIndexer,
    JsonNot,
    JsonOr,
    JsonPredicate,
    JsonSearcher,
)
from nucliadb_tpu.models.internal import ResourceDoc
from nucliadb_tpu.types import Seq, SimpleOpenIndex


def _searcher(tmp_path, payloads, deletions=()):
    indexer = JsonIndexer()
    oi = SimpleOpenIndex(deletion_list=list(deletions))
    for i, payload in enumerate(payloads):
        res = ResourceDoc(
            resource_id=f"r{i:04d}",
            json_fields={"f1": json.dumps(payload)},
        )
        meta = indexer.index_resource(res, str(tmp_path / f"js{i}"))
        oi.segment_list.append((meta, Seq(i + 1)))
    return JsonSearcher(oi)


PAYLOADS = [
    {"price": 10, "tags": ["a", "b"], "meta": {"stock": True, "note": None}},
    {"price": 49.5, "tags": ["b"], "meta": {"stock": False}},
    {"price": 100, "tags": [], "name": "widget"},
    {"price": "100", "name": "gadget", "meta": {"note": "x"}},
    {"count": 3, "tags": ["a", "a"]},
]


def _keys(searcher, result):
    """Prefilter output is RESOURCE-granular (the reference's json side
    contributes resource uuids, prefilter.rs combine) — compare by rid."""
    if result.is_all:
        return {d["key"].split("/", 1)[0] for d in searcher.docs}
    if result.is_none:
        return set()
    assert all(f.field_id is None for f in result.fields)
    return {f.resource_id for f in result.fields}


EXPRS = [
    JsonPredicate(path="price", op="gt", value=40),
    JsonPredicate(path="price", op="gte", value=49.5),
    JsonPredicate(path="price", op="lt", value=50),
    JsonPredicate(path="price", op="lte", value=10),
    JsonPredicate(path="price", op="eq", value=100),
    JsonPredicate(path="price", op="eq", value="100"),
    JsonPredicate(path="price", op="ne", value=10),
    JsonPredicate(path="tags", op="eq", value="a"),
    JsonPredicate(path="tags", op="ne", value="a"),
    JsonPredicate(path="meta.stock", op="eq", value=True),
    JsonPredicate(path="meta.stock", op="eq", value=False),
    JsonPredicate(path="meta.note", op="eq", value=None),
    JsonPredicate(path="meta.note", op="ne", value=None),
    JsonPredicate(path="name", op="exists"),
    JsonPredicate(path="missing.path", op="exists"),
    JsonPredicate(path="missing.path", op="ne", value=1),
    JsonNot(JsonPredicate(path="price", op="gt", value=40)),
    JsonAnd([
        JsonPredicate(path="price", op="gt", value=5),
        JsonPredicate(path="tags", op="eq", value="b"),
    ]),
    JsonOr([
        JsonPredicate(path="name", op="eq", value="widget"),
        JsonPredicate(path="count", op="gte", value=3),
    ]),
]


def test_vectorized_matches_scalar_oracle(tmp_path):
    s = _searcher(tmp_path, PAYLOADS)
    for expr in EXPRS:
        got = _keys(s, s.prefilter(expr))
        want = {
            s.docs[i]["key"].split("/", 1)[0]
            for i in range(s.n_docs)
            if s._matches(expr, i)
        }
        assert got == want, expr


def test_random_expression_fuzz(tmp_path):
    rng = random.Random(5)
    payloads = []
    for _ in range(60):
        p = {}
        if rng.random() < 0.8:
            p["num"] = rng.choice([1, 2.5, 7, 100, True, False])
        if rng.random() < 0.7:
            p["tag"] = rng.sample(["x", "y", "z", "1"], k=rng.randint(1, 3))
        if rng.random() < 0.3:
            p["opt"] = rng.choice([None, "set", 0])
        payloads.append(p or {"empty": 1})
    s = _searcher(tmp_path, payloads)

    def rand_expr(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.35:
            kind = rng.choice([JsonAnd, JsonOr])
            return kind([rand_expr(depth + 1) for _ in range(rng.randint(1, 3))])
        if depth < 2 and r < 0.5:
            return JsonNot(rand_expr(depth + 1))
        path = rng.choice(["num", "tag", "opt", "nope"])
        op = rng.choice(["eq", "ne", "gt", "gte", "lt", "lte", "exists"])
        value = rng.choice([1, 2.5, 7, "x", "set", None, True, 0])
        return JsonPredicate(path=path, op=op, value=value)

    for _ in range(200):
        expr = rand_expr()
        got = _keys(s, s.prefilter(expr))
        want = {
            s.docs[i]["key"].split("/", 1)[0]
            for i in range(s.n_docs)
            if s._matches(expr, i)
        }
        assert got == want, expr


def test_deletions_respected(tmp_path):
    s = _searcher(
        tmp_path, PAYLOADS, deletions=[("r0000/", Seq(100))]
    )
    got = _keys(s, s.prefilter(JsonPredicate(path="price", op="gt", value=0)))
    assert not any(k.startswith("r0000/") for k in got)


def test_large_corpus_prefilter_is_fast(tmp_path):
    """200k docs, filtered query must evaluate in well under a second of
    host time (the round-1 loop took seconds at this size)."""
    n = 200_000
    rng = np.random.default_rng(0)
    prices = rng.integers(0, 1000, size=n)
    s = JsonSearcher.__new__(JsonSearcher)
    s.docs = [
        {"key": f"r{i:06d}/f1", "paths": [("price", int(prices[i]))]}
        for i in range(n)
    ]
    s.n_docs = n
    s._fields = []
    from nucliadb_tpu.types import FieldId

    s._fields = [FieldId(resource_id=f"r{i:06d}", field_id="f1") for i in range(n)]
    from nucliadb_tpu.index.json import _PathColumns

    col = _PathColumns()
    for i in range(n):
        col.all_docs.append(i)
        col.num_vals.append(float(prices[i]))
        col.num_docs.append(i)
    s.columns = {"price": col.freeze()}
    s._path_counts = {}

    expr = JsonAnd([
        JsonPredicate(path="price", op="gte", value=100),
        JsonPredicate(path="price", op="lt", value=110),
    ])
    t0 = time.monotonic()
    result = s.prefilter(expr)
    dt = time.monotonic() - t0
    expected = int(((prices >= 100) & (prices < 110)).sum())
    assert len(result.fields) == expected
    assert dt < 0.5, f"vectorized prefilter took {dt:.3f}s"
