"""Beyond-HBM paged-tier QPS at a corpus larger than device memory
(VERDICT r4 task 4b; BASELINE.md beyond-HBM row).

Drives the REAL index path (create_segment → VectorSearcher) at n×d whose
f32 arena exceeds ``NDBTPU_VECTOR_ARENA_BUDGET`` (the HBM stand-in,
device.py:187-237 — the counterpart of the reference's mmap'd stores,
nidx_vector/src/data_store.rs):

  host_rerank  int8 codes resident (n×(d+4) bytes), f32 rows page from
               host RAM per query — the estimate scan stays on the MXU.
  stream       nothing resident: chunked exact device scans over the host
               arena. Every batch moves the WHOLE corpus across the
               host↔device link, so its QPS *is* that link's bandwidth:
               ~10 MB/s on this tunneled chip (minutes/batch measured
               here), ~50 GB/s on a real PCIe v5e host (≈4 s/batch at
               4M×768 — still a correctness tier; the production answer
               at this scale is mesh placement across chips).

Usage: python tools/beyond_hbm_bench.py [n] [d] [batch] [host_rerank|stream|both|build]
Prints one JSON line per tier. ``build`` only writes/caches the segment
(host-side numpy; run it under JAX_PLATFORMS=cpu while the chip is busy).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    which = sys.argv[4] if len(sys.argv) > 4 else "both"

    from nucliadb_tpu.index.vector import (
        Elem,
        VectorConfig,
        VectorSearcher,
        VectorSearchRequest,
    )
    from nucliadb_tpu.index.vector.config import Quantization
    from nucliadb_tpu.index.vector.segment import create_segment
    from nucliadb_tpu.types import Seq, SimpleOpenIndex
    from nucliadb_tpu.utils.platform import configure_jax

    configure_jax()

    cfg = VectorConfig(
        dimension=d, similarity="dot", quantization=Quantization.INT8
    )
    seg_dir = os.environ.get(
        "BEYOND_HBM_SEG", f"/tmp/beyond_hbm_seg_{n}x{d}"
    )
    t0 = time.time()
    if not os.path.exists(os.path.join(seg_dir, "vectors.npy")):
        rng = np.random.default_rng(5)
        # clustered corpus (1024 centers) so int8 estimate ranking is the
        # realistic regime, generated in chunks to bound peak RAM
        centers = rng.standard_normal((1024, d)).astype(np.float32)
        elems = []
        chunk = 262_144
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            assign = rng.integers(0, 1024, hi - lo)
            block = centers[assign] + 0.35 * rng.standard_normal(
                (hi - lo, d)
            ).astype(np.float32)
            block /= np.linalg.norm(block, axis=1, keepdims=True) + 1e-12
            for i in range(hi - lo):
                elems.append(
                    Elem(key=f"r{lo + i:08d}/f/0/0-10", vectors=block[i : i + 1])
                )
        create_segment(seg_dir, elems, cfg)
        del elems
        gc.collect()
    build_s = time.time() - t0
    if which == "build":
        print(json.dumps({"metric": f"beyond_hbm_build_{n}x{d}",
                          "build_s": round(build_s, 1), "seg_dir": seg_dir}))
        return

    with open(os.path.join(seg_dir, "meta.json")) as f:
        seg_meta = json.load(f)
    from nucliadb_tpu.types import SegmentMetadata

    meta = SegmentMetadata(
        path=seg_dir, records=n, tags=frozenset(), index_metadata=seg_meta
    )
    oi = SimpleOpenIndex(segment_list=[(meta, Seq(1))], deletion_list=[])

    rng_q = np.random.default_rng(9)
    vecs_mm = np.load(os.path.join(seg_dir, "vectors.npy"), mmap_mode="r")
    q_rows = rng_q.integers(0, n, b)
    queries = np.asarray(vecs_mm[np.sort(q_rows)], np.float32) + (
        0.05 * rng_q.standard_normal((b, d)).astype(np.float32)
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # exact host oracle on the first 8 queries (recall@10 of each tier)
    k = 10
    n_oracle = 8
    t0 = time.time()
    scores = vecs_mm @ queries[:n_oracle].T  # [n, 8] — chunked by BLAS
    oracle_ids = np.argsort(-scores, axis=0)[:k].T  # [8, k]
    oracle_s = time.time() - t0
    del scores

    def run_tier(budget: int, expect: str, reps: int):
        os.environ["NDBTPU_VECTOR_ARENA_BUDGET"] = str(budget)
        t0 = time.time()
        searcher = VectorSearcher(cfg, oi)
        open_s = time.time() - t0
        tier = searcher.index.paging
        assert tier == expect, (tier, expect)
        req = VectorSearchRequest(vectors=queries, top_k=k)
        t0 = time.time()
        hits = searcher.search(req)  # warm/compile
        warm_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            hits = searcher.search(req)
        dt = (time.time() - t0) / reps
        got = np.array(
            [[int(h.key.split("/")[0][1:]) for h in row] for row in hits[:n_oracle]]
        )
        recall = float(np.mean([
            len(set(got[i].tolist()) & set(oracle_ids[i].tolist())) / k
            for i in range(n_oracle)
        ]))
        del searcher
        gc.collect()
        print(json.dumps({
            "metric": f"beyond_hbm_{expect}_{n}x{d}",
            "value": round(b / dt, 2),
            "unit": "qps",
            "vs_baseline": None,
            "detail": {
                "s_per_batch": round(dt, 3), "batch": b,
                "recall_at_10_vs_exact": round(recall, 4),
                "budget_bytes": budget, "open_s": round(open_s, 1),
                "warm_s": round(warm_s, 1), "build_s": round(build_s, 1),
                "oracle_s": round(oracle_s, 1), "reps": reps,
            },
        }), flush=True)

    code_bytes = (n + 1) * (d + 4)  # ~p_pad × (int8 row + f32 scale)
    if which in ("host_rerank", "both"):
        # codes fit (≈3.1 GB at 4M×768), the 12.3 GB f32 arena does not
        run_tier(int(code_bytes * 1.5), "host_rerank", reps=4)
    if which in ("stream", "both"):
        # nothing fits: budget below code bytes → chunked streaming scan
        run_tier(int(code_bytes * 0.5), "stream", reps=1)


if __name__ == "__main__":
    main()
