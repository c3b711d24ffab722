"""Recall-vs-QPS curve for the headline int8 scan + exact rerank path.

Sweeps the rerank candidate budget (the quality/throughput knob — the
reference's RERANKING_FACTOR, nidx_vector/src/vector_types/rabitq.rs:30-36)
at 1M x 768, top-10, batch 2048, against the on-device exact HIGHEST-
precision oracle. Output feeds the BASELINE.md curve (VERDICT r2 weak #7).

Usage: python tools/recall_curve.py  (runs on the ambient device; same
on-device corpus generation + download-forced timing discipline as
bench.py — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nucliadb_tpu.ops import quant
from nucliadb_tpu.ops.topk import NEG_INF, masked_topk
from nucliadb_tpu.utils.platform import configure_jax

N = int(os.environ.get("CURVE_N", 1_000_000))
D = int(os.environ.get("CURVE_D", 768))
B = int(os.environ.get("CURVE_B", 2048))
K = int(os.environ.get("CURVE_K", 10))
ORACLE_QUERIES = int(os.environ.get("CURVE_ORACLE_Q", 1024))
BUDGETS = [10, 20, 40, 100, 400, 2000]
# the resident2 candidate table is 2*RESIDENT2_SLOTS = 512 wide: budgets
# beyond it clamp (the kernel is the DEFAULT selector for k <= 128)
SELECTORS = os.environ.get("CURVE_SELECTORS", "amk,res2").split(",")


def _rerank(vectors, queries, cand, k):
    safe = jnp.maximum(cand, 0)
    cand_vecs = vectors[safe]
    exact = jnp.einsum(
        "bd,bcd->bc", queries, cand_vecs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    valid = cand >= 0
    top_s, pos = masked_topk(exact, k, mask=valid)
    top_ids = jnp.where(pos >= 0, jnp.take_along_axis(cand, jnp.maximum(pos, 0), -1), -1)
    return top_s, top_ids


@partial(jax.jit, static_argnames=("k", "c"))
def search_budget(codes, scale, vectors, queries, mask, k, c):
    """XLA approx_max_k selection with an explicit candidate budget c."""
    cd = quant.Int8Codes(codes=codes, scale=scale)
    est = quant.int8_estimate_scores(cd, queries)
    _, cand = quant.approx_candidates(est, c, mask=mask)
    return _rerank(vectors, queries, cand, k)


@partial(jax.jit, static_argnames=("k", "c"))
def search_budget_res2(codes, scale, vectors, queries, mask, k, c):
    """Top-2-per-slot resident Pallas selection (the default on TPU)."""
    from nucliadb_tpu.ops import pallas_scan

    qs = jnp.maximum(jnp.max(jnp.abs(queries), axis=-1), 1e-12) / 127.0
    qc = jnp.clip(jnp.round(queries / qs[:, None]), -127, 127).astype(jnp.int8)
    slot_s, slot_i = pallas_scan.int8_scan_slots_resident2(qc, codes, scale, mask)
    c_eff = min(c, slot_s.shape[-1])
    top_s, pos = jax.lax.top_k(slot_s, c_eff)
    cand = jnp.where(
        top_s > pallas_scan.NEG_INF / 2,
        jnp.take_along_axis(slot_i, pos, axis=-1),
        -1,
    )
    return _rerank(vectors, queries, cand, k)


def main() -> None:
    configure_jax(init_backend=True)
    from bench_suite import _gen_device_corpus
    from nucliadb_tpu.utils.buckets import bucket

    n_pad = bucket(N)  # corpus generator wants the padded arena size
    vectors, q_bufs = _gen_device_corpus(n_pad, D, B)
    queries = q_bufs[0]
    mask = np.zeros(vectors.shape[0], bool)
    mask[:N] = True
    mask_j = jax.device_put(jnp.asarray(mask))
    codes = quant.Int8Codes.encode(vectors)
    np.asarray(codes.scale[:2])

    # exact oracle over the first ORACLE_QUERIES (chunked: at 1M x 1024
    # queries the full HIGHEST-precision score matrix is ~4 GB — chunk it
    # so the oracle fits next to the arena + codes)
    oracle_q = min(ORACLE_QUERIES, B)
    oracle_chunk = min(128, oracle_q)
    assert oracle_q % oracle_chunk == 0

    @jax.jit
    def oracle(vv, mm, qq):
        def one(qc):
            scores = jax.lax.dot_general(
                qc, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return masked_topk(scores, K, mask=mm)[1]

        return jax.lax.map(
            one, qq.reshape(-1, oracle_chunk, qq.shape[-1])
        ).reshape(-1, K)

    oracle_ids = np.asarray(oracle(vectors, mask_j, queries[:oracle_q]))

    rows = []
    fns = {"amk": search_budget, "res2": search_budget_res2}
    for sel in SELECTORS:
        fn = fns[sel]
        for c in BUDGETS:
            if sel == "res2" and c > 512:
                continue  # beyond the 2*S candidate table
            s, i = fn(codes.codes, codes.scale, vectors, queries, mask_j, K, c)
            got = np.asarray(i)  # compile + warm + download
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                _ = np.asarray(
                    fn(codes.codes, codes.scale, vectors, queries, mask_j, K, c)[1]
                )
                best = min(best, time.time() - t0)
            recalls = [
                len(set(got[j][got[j] >= 0]) & set(oracle_ids[j][oracle_ids[j] >= 0])) / K
                for j in range(oracle_q)
            ]
            row = {
                "selector": sel,
                "rerank_budget": c,
                "oracle_queries": oracle_q,
                "recall_at_10": round(float(np.mean(recalls)), 4),
                "qps": round(B / best, 1),
                "ms_per_batch": round(best * 1e3, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"curve": rows, "n": N, "d": D, "batch": B, "k": K}))


if __name__ == "__main__":
    main()
