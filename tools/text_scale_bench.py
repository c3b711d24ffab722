"""Text engine at the reference's log-merge top bucket (10M records/segment,
nidx/src/settings.rs:247-255) — VERDICT r4 task 6.

Builds an n-doc paragraph segment with the config-3 zipf corpus recipe,
then measures: native segment build time, engine open time, host WAND tier
QPS (batched + single-call, OR and AND shapes), and — optionally, when the
device is reachable and NDBTPU_SCALE_DEVICE=1 — the batched device kernel
for the same batch. The recorded host-vs-kernel ratio at each scale is the
empirical basis for NDBTPU_TEXT_HOST_TIER_MAX_DOCS.

Usage: python tools/text_scale_bench.py [n_docs] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NDBTPU_SCALE_DEVICE", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    os.environ.setdefault("NDBTPU_TEXT_HOST_TIER", "1")
    os.environ.setdefault("NDBTPU_TEXT_HOST_TIER_MAX_DOCS", str(n_docs))

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
    t0 = time.time()
    # generate in chunks to bound peak memory of the index arrays
    entries = []
    chunk = 1_000_000
    for lo in range(0, n_docs, chunk):
        hi = min(lo + chunk, n_docs)
        zipf = np.minimum(rng.zipf(1.3, size=(hi - lo, 24)) - 1, len(words) - 8)
        hot = rng.random(hi - lo) < 0.02
        for i in range(hi - lo):
            toks = [words[j] for j in zipf[i]]
            if hot[i]:
                toks[:3] = ["quick", "brown", "fox"]
            entries.append(
                DocEntry(key=f"r{lo + i}/t/t/0-10", text=" ".join(toks))
            )
    gen_s = time.time() - t0

    tmp = tempfile.mkdtemp(prefix="text_scale_")
    t0 = time.time()
    meta = build_segment(os.path.join(tmp, "seg"), entries, kind="paragraph")
    build_s = time.time() - t0
    texts = None
    entries = None  # free ~GBs before the engine opens

    t0 = time.time()
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
    open_s = time.time() - t0
    tier = engine.host_tier()

    rng_q = np.random.default_rng(23)
    or_queries, and_queries = [], []
    for i in range(bq):
        t1 = words[int(rng_q.integers(0, 2000))]
        t2 = words[int(rng_q.integers(0, 2000))]
        typo = "quikc" if i % 2 else "borwn"
        or_queries.append(
            TextQuery(text=f"{t1} {t2} {typo}", top_k=20, fuzzy=True)
        )
        and_queries.append(
            TextQuery(text=f"{t1} {t2}", top_k=20, fuzzy=bool(i % 2),
                      all_terms=True)
        )

    out = {
        "metric": f"text_scale_{n_docs}",
        "n_docs": n_docs,
        "batch": bq,
        "gen_s": round(gen_s, 1),
        "build_segment_s": round(build_s, 1),
        "open_s": round(open_s, 1),
        "host_tier": tier is not None,
    }
    if tier is not None:
        reps = 3
        engine.search_batch(or_queries, need_matched=False)  # warm
        t0 = time.time()
        for _ in range(reps):
            engine.search_batch(or_queries, need_matched=False)
        out["host_or_qps"] = round(bq * reps / (time.time() - t0), 1)
        t0 = time.time()
        for _ in range(reps):
            engine.search_batch(
                or_queries, need_matched=False, need_total=False
            )
        out["host_or_qps_no_total"] = round(bq * reps / (time.time() - t0), 1)
        engine.search_batch(and_queries, need_matched=False)
        t0 = time.time()
        for _ in range(reps):
            engine.search_batch(and_queries, need_matched=False)
        out["host_and_qps"] = round(bq * reps / (time.time() - t0), 1)
        t0 = time.time()
        for q in or_queries[:64]:
            engine.search(q, need_matched=False)
        out["host_single_call_qps"] = round(64 / (time.time() - t0), 1)

    if os.environ.get("NDBTPU_SCALE_DEVICE", "0") == "1":
        engine._host_tier_cached = None
        engine.search_batch(or_queries, need_matched=False)  # compile/warm
        t0 = time.time()
        for _ in range(2):
            engine.search_batch(or_queries, need_matched=False)
        out["device_kernel_or_qps"] = round(bq * 2 / (time.time() - t0), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
