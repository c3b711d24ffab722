"""Headline benchmark: vector search QPS at high recall on the real TPU.

Config 2-ish of BASELINE.md: single shard, 1M x 768-d vectors (clustered
synthetic like the reference's recall test, nidx_vector/src/segment.rs:
841-912), int8-quantized scan + exact rerank, top-10, batch 32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurement rules learned the hard way on this platform (see
.claude/skills/verify/SKILL.md):
- benchmark data is generated ON DEVICE (the host<->TPU relay moves
  ~10 MB/s; uploading a 6 GB corpus congests every other transfer),
- ``block_until_ready`` does not actually wait on this platform — every
  timed call's result is DOWNLOADED, which forces completion,
- throughput is measured with R dispatched batches then R downloads
  (overlapping the ~25 ms tunnel round trip); distinct query buffers per
  iteration prevent execution coalescing.

``vs_baseline``: the reference publishes no numbers and its Rust toolchain
is absent here, so the measured baseline is the same workload on the host
CPU (numpy f32 exact scan — what nidx's brute-force path computes).
Recall is reported against an on-device float32 exact-scan oracle
(HIGHEST-precision matmul).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _probe_device(timeout_s: float = 240.0) -> None:
    """Fail fast (JSON error line + exit 1) when the chip is unreachable.

    Backend init dials the TPU tunnel and has NO timeout of its own — a
    down relay turns the bench into an indefinite hang. Probing in a
    subprocess (init is per-process and uncancellable) bounds the wait.
    """
    import subprocess
    import sys

    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(len(d))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        ok = res.returncode == 0
        detail = (res.stderr or "")[-400:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"device init exceeded {timeout_s:.0f}s"
    if not ok:
        print(json.dumps({
            "metric": "qps_at_recall", "value": 0, "unit": "qps",
            "vs_baseline": 0, "error": f"tpu unreachable: {detail}",
        }))
        raise SystemExit(1)


def main() -> None:
    _probe_device()

    import jax
    import jax.numpy as jnp

    from nucliadb_tpu.index.vector.device import (
        _search_binary,
        _search_exact,
        _search_int8,
        bucket,
    )
    from nucliadb_tpu.ops import quant
    from nucliadb_tpu.utils.platform import configure_jax

    configure_jax()

    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("BENCH_D", 768))
    # batch 2048: queries batch on the device the way a production searcher
    # batches concurrent requests. The [B, N] estimate matrix never
    # materializes (XLA fuses the int8 matmul with approx_max_k's partial
    # reduction — measured r2), so large batches are HBM-safe, and B=2048
    # runs at 8.8 ms per 1024 queries vs 11.5 at B=1024.
    b = int(os.environ.get("BENCH_B", 2048))
    k = int(os.environ.get("BENCH_K", 10))
    codec = os.environ.get("BENCH_QUANT", "int8")
    # reps doubles as the CHAIN LENGTH of the primary measurement: one
    # dispatched program runs `reps` scans back-to-back (lax.map), which is
    # what the production searcher's continuous batching executes under
    # sustained load; the ~25 ms relay round trip amortizes over the chain.
    reps = int(os.environ.get("BENCH_REPS", 12))
    # 1024-query oracle: a recall measured on 64 queries bounds the true
    # recall only loosely (VERDICT r3 weak #3); the exact scan is cheap
    oracle_queries = min(b, int(os.environ.get("BENCH_ORACLE_Q", 1024)))
    p_pad = bucket(n + 1)

    # ---- on-device clustered corpus + queries -----------------------------
    n_centers = 1024

    @jax.jit
    def gen_corpus(key):
        # block-structured clusters (no big gather: 2M-row gathers are slow
        # to lower on this stack); generated in center-chunks via lax.map so
        # temporaries stay ~100MB instead of 3 full corpus copies
        kc, kn = jax.random.split(key)
        per = p_pad // n_centers
        centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
        noise_keys = jax.random.split(kn, n_centers)

        def one_center(args):
            center, nkey = args
            block = center[None, :] + 0.35 * jax.random.normal(nkey, (per, d), jnp.float32)
            return block / jnp.linalg.norm(block, axis=-1, keepdims=True)

        vecs = jax.lax.map(one_center, (centers, noise_keys), batch_size=32)
        # padding rows keep (masked) random values — zeroing them would cost
        # another full-corpus copy of HBM
        return vecs.reshape(p_pad, d), centers

    @jax.jit
    def gen_queries(key, centers):
        ka, kn = jax.random.split(key)
        assign = jax.random.randint(ka, (b,), 0, n_centers)
        qs = centers[assign] + 0.35 * jax.random.normal(kn, (b, d), jnp.float32)
        return qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    import sys

    def stage(msg):
        if os.environ.get("BENCH_VERBOSE"):
            print(f"# {msg}", file=sys.stderr, flush=True)

    vectors, centers = gen_corpus(jax.random.PRNGKey(42))
    q_bufs = [gen_queries(jax.random.PRNGKey(100 + j), centers) for j in range(reps)]
    _ = np.asarray(q_bufs[-1][:1, :2])  # force generation
    stage("corpus generated")
    mask = np.zeros(p_pad, bool)
    mask[:n] = True
    mask_j = jax.device_put(jnp.asarray(mask))
    ms = jnp.float32(-3.0e38)

    t_enc = time.time()
    if codec == "int8":
        codes = quant.Int8Codes.encode(vectors)
        _ = np.asarray(codes.scale[:2])
        run = lambda qq: _search_int8(codes, vectors, qq, mask_j, ms, k, "dot")
    elif codec == "binary":
        codes = quant.BinaryCodes.encode(vectors)
        _ = np.asarray(codes.scale[:2])
        run = lambda qq: _search_binary(codes, vectors, qq, mask_j, ms, k, "dot")
    else:
        run = lambda qq: _search_exact(vectors, qq, mask_j, ms, k, "dot")
    encode_s = time.time() - t_enc

    stage(f"codec ready (encode {encode_s:.1f}s)")
    # warm (compile) + force completion
    s, i = run(q_bufs[0])
    first_ids = np.asarray(i)
    stage("warmed")

    # per-dispatch throughput (secondary): R separate dispatches, then all
    # downloads — per-call relay submission (~20 ms serial on this tunnel)
    # dominates, which is why the chained number below is the headline
    t0 = time.time()
    outs = [run(q_bufs[j % len(q_bufs)]) for j in range(min(reps, 8))]
    ids_list = [np.asarray(i) for s, i in outs]
    dt = (time.time() - t0) / min(reps, 8)
    qps_dispatch = b / dt
    stage(f"per-dispatch throughput measured ({dt*1000:.1f} ms/batch)")

    # PRIMARY wall throughput: ONE dispatched program runs all `reps` query
    # batches back-to-back via lax.map and every result is downloaded —
    # exactly what the production searcher's continuous batching executes
    # under sustained load (distinct query buffers prevent coalescing; the
    # download forces completion on this platform where block_until_ready
    # does not). Arenas are jit ARGUMENTS (a closure would inline 4 GB of
    # constants into the program and ship them to the compile service).
    q8 = jnp.stack(q_bufs)

    if codec == "int8":

        @jax.jit
        def run8(cc, cs, vv, mm, qq8):
            cd = quant.Int8Codes(codes=cc, scale=cs)
            return jax.lax.map(
                lambda qq: _search_int8(cd, vv, qq, mm, ms, k, "dot")[1], qq8
            )

        args8 = (codes.codes, codes.scale, vectors, mask_j, q8)
    elif codec == "binary":

        @jax.jit
        def run8(ct, cs, cr, cp, vv, mm, qq8):
            cd = quant.BinaryCodes(
                codes_t=ct, scale=cs, resid=cr, popcnt=cp, dim=d
            )
            return jax.lax.map(
                lambda qq: _search_binary(cd, vv, qq, mm, ms, k, "dot")[1], qq8
            )

        args8 = (codes.codes_t, codes.scale, codes.resid, codes.popcnt,
                 vectors, mask_j, q8)
    else:

        @jax.jit
        def run8(vv, mm, qq8):
            return jax.lax.map(
                lambda qq: _search_exact(vv, qq, mm, ms, k, "dot")[1], qq8
            )

        args8 = (vectors, mask_j, q8)

    _ = np.asarray(run8(*args8))  # compile + warm
    best = 1e9
    for _r in range(2):
        t0 = time.time()
        _ = np.asarray(run8(*args8))
        best = min(best, time.time() - t0)
    dt_dev = best / reps
    qps_chained = b / dt_dev
    stage(f"chained wall throughput measured ({dt_dev*1000:.1f} ms/batch)")

    # latency: sequential dispatch+download (includes tunnel round trip)
    t0 = time.time()
    for j in range(4):
        s, i = run(q_bufs[j % len(q_bufs)])
        _ = np.asarray(s)
    lat_ms = (time.time() - t0) / 4 * 1000

    # ---- recall vs on-device exact oracle (HIGHEST precision matmul) ------
    # chunked over queries: a single [1024, p_pad] f32 score matrix is
    # ~4 GB HBM next to the 3.2 GB arena — 128-query tiles keep the oracle
    # inside memory at any BENCH_ORACLE_Q
    oracle_chunk = min(128, oracle_queries)
    assert oracle_queries % oracle_chunk == 0

    @jax.jit
    def oracle(vv, mm, qq):  # arenas as ARGUMENTS, never closure constants
        from nucliadb_tpu.ops.topk import masked_topk

        def one(qc):
            scores = jax.lax.dot_general(
                qc, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return masked_topk(scores, k, mask=mm)[1]

        return jax.lax.map(
            one, qq.reshape(-1, oracle_chunk, qq.shape[-1])
        ).reshape(-1, k)

    oracle_ids = np.asarray(oracle(vectors, mask_j, q_bufs[0][:oracle_queries]))
    got_ids = first_ids[:oracle_queries]
    recalls = [
        len(set(oracle_ids[bi].tolist()) & set(got_ids[bi].tolist())) / k
        for bi in range(oracle_queries)
    ]
    recall = float(np.mean(recalls))
    # the r1 bench sampled only 8 oracle queries (reported 1.0); keep that
    # figure for cross-round comparability next to the wider honest sample
    recall8 = float(np.mean(recalls[: min(8, oracle_queries)]))

    # ---- CPU baseline: numpy f32 exact scan, same shapes -------------------
    cpu_n = min(n, 1_000_000)
    cpu_vecs = np.random.default_rng(0).standard_normal((cpu_n, d), dtype=np.float32)
    cpu_q = np.random.default_rng(1).standard_normal((b, d), dtype=np.float32)
    t0 = time.time()
    scores_cpu = cpu_q @ cpu_vecs.T
    np.argpartition(-scores_cpu, k, axis=-1)
    cpu_dt = (time.time() - t0) * (n / cpu_n)
    qps_cpu = b / cpu_dt

    print(
        json.dumps(
            {
                "metric": f"vector_qps_{codec}_{n}x{d}_top{k}_batch{b}x{reps}chained",
                "value": round(qps_chained, 1),
                "unit": "qps",
                "vs_baseline": round(qps_chained / qps_cpu, 1),
                "detail": {
                    "recall_at_10_vs_exact": round(recall, 4),
                    "recall_oracle_queries": oracle_queries,
                    "recall_at_10_first8_r1_metric": round(recall8, 4),
                    "ms_per_batch_chained": round(dt_dev * 1000, 2),
                    "qps_per_dispatch_pipelined": round(qps_dispatch, 1),
                    "ms_per_batch_per_dispatch": round(dt * 1000, 2),
                    "ms_per_query_latency": round(lat_ms, 2),
                    "cpu_exact_qps_baseline": round(qps_cpu, 2),
                    "encode_s": round(encode_s, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
