"""Relation (graph) engine at scale: path/node/fuzzy/neighbour queries at
1M+ edges (VERDICT r4 task 10; parity target: the reference serves these
from tantivy term dictionaries, nidx_relation/src/lib.rs:124-263).

Synthetic entity graph: ~100k distinct node values (zipf popularity, so
hub nodes exist like real KGs), 8 relation types, facet tails. Queries are
the product shapes /graph serves: exact-source path queries (selective and
hub), relation-constrained paths, prefix and fuzzy node matches, undirected
neighbour expansion, node listings.

Usage: python tools/graph_bench.py [n_edges] [reps]
Prints one JSON line per query shape plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import msgpack
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(n_edges: int, seg_dir: str) -> dict:
    rng = np.random.default_rng(5)
    n_nodes = max(n_edges // 10, 1000)
    # zipf popularity: node 0 is a hub appearing in ~1/ln(n) of edges
    src = np.minimum(rng.zipf(1.2, n_edges) - 1, n_nodes - 1)
    dst = np.minimum(rng.zipf(1.2, n_edges) - 1, n_nodes - 1)
    rel = rng.integers(0, 8, n_edges)
    relations = ["likes", "knows", "visited", "works_at", "born_in",
                 "cites", "links", "owns"]
    types = ["ENTITY", "PLACE", "AGENT", "THING"]
    edges = []
    for i in range(n_edges):
        s, d = int(src[i]), int(dst[i])
        edges.append({
            "key": f"r{i % 50000}/f{i % 3}",
            "source_value": f"entity {s}",
            "source_type": types[s % 4],
            "source_subtype": "fruit" if s % 7 == 0 else "",
            "target_value": f"entity {d}",
            "target_type": types[d % 4],
            "target_subtype": "",
            "relation": relations[int(rel[i])],
            "label": "",
            "metadata": {},
            "facets": ["/g/u"] if i % 11 == 0 else [],
        })
    os.makedirs(seg_dir, exist_ok=True)
    with open(os.path.join(seg_dir, "edges.msgpack"), "wb") as f:
        f.write(msgpack.packb(edges))
    meta = {"records": len(edges), "kind": "relation"}
    with open(os.path.join(seg_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    # mid-frequency REAL sources (not hubs): ids that occur, above the head
    mids = src[src > 100]
    return meta, [f"entity {int(x)}" for x in mids[:1000]]


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import tempfile

    from nucliadb_tpu.index.relation import (
        GraphSearchRequest, NodePattern, RelationPattern, RelationSearcher,
    )
    from nucliadb_tpu.types import SegmentMetadata, SimpleOpenIndex

    tmp = tempfile.mkdtemp(prefix="graph_bench_")
    seg_dir = os.path.join(tmp, "seg")
    t0 = time.time()
    meta, mid_sources = build_graph(n_edges, seg_dir)
    gen_s = time.time() - t0

    t0 = time.time()
    searcher = RelationSearcher(SimpleOpenIndex(segment_list=[(
        SegmentMetadata(path=seg_dir, records=n_edges, index_metadata=meta), 1
    )]))
    searcher._build_columns()
    open_s = time.time() - t0

    rng = np.random.default_rng(9)
    selective = [mid_sources[int(x)] for x in rng.integers(0, len(mid_sources), reps)]
    shapes = {
        "path_selective_source": lambda i: GraphSearchRequest(
            source=NodePattern(value=selective[i % reps]), top_k=50),
        "path_hub_source": lambda i: GraphSearchRequest(
            source=NodePattern(value="entity 0"), top_k=50),
        "path_rel_constrained": lambda i: GraphSearchRequest(
            source=NodePattern(value=selective[i % reps]),
            relation=RelationPattern(relation="knows"), top_k=50),
        "node_prefix": lambda i: GraphSearchRequest(
            source=NodePattern(value=f"entity 123", prefix=True), top_k=50),
        "node_fuzzy": lambda i: GraphSearchRequest(
            source=NodePattern(value="entiti 7", match="fuzzy"), top_k=50),
        "undirected": lambda i: GraphSearchRequest(
            source=NodePattern(value=selective[i % reps]),
            undirected=True, top_k=50),
    }
    results = {}
    for name, make in shapes.items():
        searcher.graph_search(make(0))  # warm caches
        t0 = time.time()
        total_paths = 0
        for i in range(reps):
            total_paths += len(searcher.graph_search(make(i)))
        ms = (time.time() - t0) / reps * 1e3
        results[name] = {"ms_per_query": round(ms, 2), "avg_paths": total_paths // reps}

    # boolean tree through graph_search_expr (the /graph API + proto plane
    # route, TopDocs::order_by_score ranking): path leaf AND generated-by
    def expr_q(i):
        return {"and": [
            {"prop": "path",
             "source": {"value": selective[i % reps]},
             "destination": {}, "relation": {}},
            {"prop": "generated", "by": "user"},
        ]}

    searcher.graph_search_expr(expr_q(0), top_k=50)
    t0 = time.time()
    total_paths = 0
    for i in range(reps):
        total_paths += len(searcher.graph_search_expr(expr_q(i), top_k=50))
    results["expr_path_and_generated"] = {
        "ms_per_query": round((time.time() - t0) / reps * 1e3, 2),
        "avg_paths": total_paths // reps,
    }

    t0 = time.time()
    for i in range(reps):
        searcher.neighbours([selective[i % reps]], top_k=50)
    results["neighbours"] = {
        "ms_per_query": round((time.time() - t0) / reps * 1e3, 2)}
    t0 = time.time()
    for i in range(reps):
        searcher.suggest_nodes("entity 12", top_k=10)
    results["suggest_nodes"] = {
        "ms_per_query": round((time.time() - t0) / reps * 1e3, 2)}

    # ---- multi-tenant QPS: concurrent clients over a query mix ----------
    # (VERDICT r4 task 4: the graph row needs a QPS-under-concurrency
    # column). Mix = the product shapes above, round-robin, N threads.
    import threading

    mix = [make for make in shapes.values()]
    n_threads = int(os.environ.get("GRAPH_BENCH_THREADS", 8))
    duration = float(os.environ.get("GRAPH_BENCH_SECONDS", 6.0))
    done = [0] * n_threads
    stop_at = time.time() + duration
    errors = []

    def client(ti: int) -> None:
        i = ti
        try:
            while time.time() < stop_at:
                searcher.graph_search(mix[i % len(mix)](i))
                i += 1
                done[ti] += 1
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(t,)) for t in range(n_threads)]
    t0 = time.time()
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.time() - t0
    concurrent = {
        "qps": round(sum(done) / wall, 1),
        "clients": n_threads,
        "seconds": round(wall, 1),
        "queries": sum(done),
        "errors": len(errors),
        "host_cores": os.cpu_count(),
    }

    print(json.dumps({
        "metric": f"graph_{n_edges}_edges",
        "n_edges": n_edges,
        "generate_s": round(gen_s, 1),
        "open_and_columns_s": round(open_s, 1),
        "queries": results,
        "concurrent": concurrent,
        "p50_all_shapes_ms": round(float(np.median(
            [v["ms_per_query"] for v in results.values()])), 2),
    }))


if __name__ == "__main__":
    main()
