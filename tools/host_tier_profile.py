"""Profile the host WAND tier's per-query cost into phases (VERDICT r4
task 3): plan_terms (tokenize + fuzzy expansion + df/idf), cursor assembly,
WAND evaluation, matched-count pass, and hit materialization — on the SAME
synthetic zipf corpus bench_suite config 3 uses, against the bare
single-core evaluator (tools/wand_baseline.py).

Usage: python tools/host_tier_profile.py [n_docs] [batch]
Emits one JSON line with the phase split and the tier/evaluator ratio.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    os.environ.setdefault("NDBTPU_TEXT_HOST_TIER", "1")

    import bench_suite
    from nucliadb_tpu.index.text_engine import (
        DeviceTextEngine,
        TextQuery,
        build_segment,
        open_text_segment,
    )
    from nucliadb_tpu.index.text_engine.builder import DocEntry
    from nucliadb_tpu.types import Seq

    words = bench_suite._vocab()
    rng = np.random.default_rng(11)
    zipf = np.minimum(rng.zipf(1.3, size=(n_docs, 24)) - 1, len(words) - 8)
    hot = rng.random(n_docs) < 0.02
    entries = []
    for i in range(n_docs):
        toks = [words[j] for j in zipf[i]]
        if hot[i]:
            toks[:3] = ["quick", "brown", "fox"]
        entries.append(DocEntry(key=f"r{i}/t/t/0-10", text=" ".join(toks)))
    tmp = tempfile.mkdtemp()
    meta = build_segment(os.path.join(tmp, "seg"), entries, kind="paragraph")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
    tier = engine.host_tier()
    assert tier is not None

    rng_q = np.random.default_rng(23)
    queries = []
    for i in range(bq):
        t1 = words[int(rng_q.integers(0, 2000))]
        t2 = words[int(rng_q.integers(0, 2000))]
        typo = "quikc" if i % 2 else "borwn"
        queries.append(TextQuery(text=f"{t1} {t2} {typo}", top_k=20, fuzzy=True))

    # warm every cache (fuzzy memo, cursor cache, maxtf)
    engine.search_batch(queries, need_matched=False)

    import nucliadb_tpu_native as _native

    # ---- phase split (mirrors host_tier.search's body) ----
    t_plan = t_cursors = t_wand = t_count = t_hits = 0.0
    reps = 3
    for _ in range(reps):
        for q in queries:
            t0 = time.perf_counter()
            terms, _req = engine._plan_terms(q)
            t1_ = time.perf_counter()
            t_plan += t1_ - t0
            doc_bufs, tf_bufs, offs, weights, maxtf = [], [], [], [], []
            for term, weight in terms:
                t_docs, t_tfs, t_offs, t_mts, idf = tier._bundle(term)
                if idf == 0.0:
                    continue
                w = weight * idf
                doc_bufs += t_docs
                tf_bufs += t_tfs
                offs += t_offs
                maxtf += t_mts
                weights += [w] * len(t_offs)
            offs_np = np.asarray(offs, np.int64)
            w_np = np.asarray(weights, np.float32)
            mt_np = np.asarray(maxtf, np.float32)
            t2_ = time.perf_counter()
            t_cursors += t2_ - t1_
            s_b, i_b, _c_b = _native.bm25_wand_req_multi(
                doc_bufs, tf_bufs, offs_np, w_np, mt_np, tier.dl_norm,
                tier._alive_u8, 20, tier._k1, 1,
            )
            t3_ = time.perf_counter()
            t_wand += t3_ - t2_
            _count = _native.bm25_match_multi(
                doc_bufs, offs_np, tier._alive_u8, engine.n_docs, False
            )
            t4_ = time.perf_counter()
            t_count += t4_ - t3_
            top_s = np.frombuffer(s_b, np.float32)
            top_i = np.frombuffer(i_b, np.int64)
            _hits = [
                (engine.keys[d], float(s), int(d), engine.attrs[d])
                for s, d in zip(top_s, top_i)
                if d >= 0
            ]
            t_hits += time.perf_counter() - t4_
    nq = reps * bq

    # ---- end-to-end batch path (what config 3 measures) ----
    t0 = time.perf_counter()
    for _ in range(reps):
        engine.search_batch(queries, need_matched=False)
    e2e = (time.perf_counter() - t0) / reps

    # ---- bare evaluator ----
    from tools.wand_baseline import WandBaseline

    wand = WandBaseline([e.text for e in entries])
    wand.search(queries[0].text, 20)
    t0 = time.perf_counter()
    for _ in range(reps):
        for q in queries:
            wand.search(q.text, 20)
    bare = (time.perf_counter() - t0) / nq

    out = {
        "metric": f"host_tier_profile_{n_docs}",
        "n_docs": n_docs,
        "batch": bq,
        "per_query_us": {
            "plan_terms": round(t_plan / nq * 1e6, 1),
            "cursor_assembly": round(t_cursors / nq * 1e6, 1),
            "wand": round(t_wand / nq * 1e6, 1),
            "matched_count": round(t_count / nq * 1e6, 1),
            "hit_build": round(t_hits / nq * 1e6, 1),
            "sum": round((t_plan + t_cursors + t_wand + t_count + t_hits)
                         / nq * 1e6, 1),
            "e2e_batch_path": round(e2e / bq * 1e6, 1),
            "bare_evaluator": round(bare * 1e6, 1),
        },
        "tier_qps": round(bq / e2e, 1),
        "bare_qps": round(1.0 / bare, 1),
        "ratio": round((bq / e2e) * bare, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
