"""BASELINE.md benchmark suite: the five reference configs on this build.

Usage: ``python bench_suite.py [vec100k] [vec1m_filtered] [bm25] [find]
[scatter4]`` (no args = all). Prints ONE JSON line per config.

The reference (nuclia/nucliadb) publishes no numbers and its Rust toolchain
is absent in this image, so each config reports:
- ``value``  — this build on the real TPU (or product latency over HTTP),
- ``vs_baseline`` — speedup over the same workload on the host CPU
  (numpy f32 exact scan for vector configs; a numpy CSR BM25 scorer for the
  text config — both are what nidx's hot loops compute, minus SIMD tuning).

Measurement rules (see .claude/skills/verify/SKILL.md): corpus generated ON
DEVICE; every timed result is downloaded (block_until_ready does not wait on
this platform); R dispatches then R downloads to overlap the tunnel RTT.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPS = int(os.environ.get("BENCH_REPS", 8))


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def _gen_device_corpus(n_pad: int, d: int, b: int, n_centers: int = 1024):
    """Clustered corpus + queries, generated on device (bench.py recipe)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen_corpus(key):
        kc, kn = jax.random.split(key)
        per = n_pad // n_centers
        centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
        noise_keys = jax.random.split(kn, n_centers)

        def one_center(args):
            center, nkey = args
            block = center[None, :] + 0.35 * jax.random.normal(nkey, (per, d), jnp.float32)
            return block / jnp.linalg.norm(block, axis=-1, keepdims=True)

        vecs = jax.lax.map(one_center, (centers, noise_keys), batch_size=32)
        return vecs.reshape(n_pad, d), centers

    @jax.jit
    def gen_queries(key, centers):
        ka, kn = jax.random.split(key)
        assign = jax.random.randint(ka, (b,), 0, n_centers)
        qs = centers[assign] + 0.35 * jax.random.normal(kn, (b, d), jnp.float32)
        return qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    vectors, centers = gen_corpus(jax.random.PRNGKey(42))
    q_bufs = [gen_queries(jax.random.PRNGKey(100 + j), centers) for j in range(8)]
    _ = np.asarray(q_bufs[-1][:1, :2])
    return vectors, q_bufs


def _cpu_exact_qps(n: int, d: int, b: int, k: int) -> float:
    cpu_n = min(n, 200_000)
    vecs = np.random.default_rng(0).standard_normal((cpu_n, d), dtype=np.float32)
    q = np.random.default_rng(1).standard_normal((b, d), dtype=np.float32)
    t0 = time.time()
    scores = q @ vecs.T
    np.argpartition(-scores, k, axis=-1)
    return b / ((time.time() - t0) * (n / cpu_n))


def _throughput(run, q_bufs, reps=REPS):
    s, i = run(q_bufs[0])  # compile
    _ = np.asarray(s)
    t0 = time.time()
    outs = [run(q_bufs[j % len(q_bufs)]) for j in range(reps)]
    ids = [np.asarray(i) for _, i in outs]
    dt = (time.time() - t0) / reps
    return dt, ids


def _recall(ids_got: np.ndarray, ids_oracle: np.ndarray, k: int) -> float:
    m = min(len(ids_got), len(ids_oracle))
    return float(
        np.mean(
            [
                len(set(ids_oracle[j].tolist()) & set(ids_got[j].tolist())) / k
                for j in range(m)
            ]
        )
    )


def bench_vec100k() -> None:
    """Config 1: single-shard 100k x 768 f32 dot, top-10 (exact scan — the
    small-segment fast path the cost model picks; recall 1.0)."""
    import jax
    import jax.numpy as jnp

    from nucliadb_tpu.index.vector.device import _search_exact, bucket
    from nucliadb_tpu.ops.topk import masked_topk

    n = int(os.environ.get("BENCH_N1", 100_000))
    d, b, k = 768, int(os.environ.get("BENCH_B", 256)), 10
    n_pad = bucket(n + 1)
    vectors, q_bufs = _gen_device_corpus(n_pad, d, b)
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    mask_j = jax.device_put(jnp.asarray(mask))
    ms = jnp.float32(-3.0e38)

    run = lambda qq: _search_exact(vectors, qq, mask_j, ms, k, "dot")
    dt, ids = _throughput(run, q_bufs)

    @jax.jit
    def oracle(vv, mm, qq):
        scores = jax.lax.dot_general(
            qq, vv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return masked_topk(scores, k, mask=mm)

    _, oids = oracle(vectors, mask_j, q_bufs[0][:8])
    rec = _recall(ids[0][:8], np.asarray(oids), k)
    qps_cpu = _cpu_exact_qps(n, d, b, k)
    _emit(
        {
            "metric": "config1_vec_100k_exact_top10",
            "value": round(b / dt, 1),
            "unit": "qps",
            "vs_baseline": round(b / dt / qps_cpu, 1),
            "detail": {"recall_at_10": round(rec, 4), "ms_per_batch": round(dt * 1e3, 2),
                       "cpu_qps": round(qps_cpu, 1), "batch": b},
        }
    )


def bench_vec1m_filtered() -> None:
    """Config 2: 1M x 768 cosine + label prefilter (10% selectivity), int8
    codes + exact rerank, top-10 — recall vs the exact masked oracle."""
    import jax
    import jax.numpy as jnp

    from nucliadb_tpu.index.vector.device import _search_int8, bucket
    from nucliadb_tpu.ops import quant
    from nucliadb_tpu.ops.topk import masked_topk

    n = int(os.environ.get("BENCH_N", 1_000_000))
    d, b, k = 768, int(os.environ.get("BENCH_B", 256)), 10
    n_pad = bucket(n + 1)
    vectors, q_bufs = _gen_device_corpus(n_pad, d, b)
    # label prefilter: every 10th paragraph carries the label
    mask = np.zeros(n_pad, bool)
    mask[:n:10] = True
    mask_j = jax.device_put(jnp.asarray(mask))
    ms = jnp.float32(-3.0e38)

    codes = quant.Int8Codes.encode(vectors)
    _ = np.asarray(codes.scale[:2])
    run = lambda qq: _search_int8(codes, vectors, qq, mask_j, ms, k, "cosine")
    dt, ids = _throughput(run, q_bufs)

    @jax.jit
    def oracle(vv, mm, qq):
        scores = jax.lax.dot_general(
            qq, vv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return masked_topk(scores, k, mask=mm)

    _, oids = oracle(vectors, mask_j, q_bufs[0][:8])
    rec = _recall(ids[0][:8], np.asarray(oids), k)
    qps_cpu = _cpu_exact_qps(n // 10, d, b, k)  # CPU scans only the filtered rows
    _emit(
        {
            "metric": f"config2_vec_{n}_filtered_cosine_top10",
            "value": round(b / dt, 1),
            "unit": "qps",
            "vs_baseline": round(b / dt / qps_cpu, 1),
            "detail": {"recall_at_10": round(rec, 4), "ms_per_batch": round(dt * 1e3, 2),
                       "selectivity": 0.1, "cpu_qps": round(qps_cpu, 1), "batch": b},
        }
    )


_WORDS = None


def _vocab():
    # Random letter strings, like natural-language vocabulary: a typical
    # term has ~0 edit-distance-1 neighbors that are also real terms. (A
    # serial-identifier vocab like w0001..w9999 gives every term ~36 real
    # d=1 neighbors — a worst case the engine bounds with MAX_EXPANSIONS,
    # but not what fuzzy search costs on text.)
    global _WORDS
    if _WORDS is None:
        rng = np.random.default_rng(7)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        seen = {"quick", "brown", "fox", "lazy", "dog", "search", "database"}
        out = []
        while len(out) < 20_000:
            ln = int(rng.integers(5, 10))
            w = "".join(letters[rng.integers(0, 26, ln)])
            if w not in seen:
                seen.add(w)
                out.append(w)
        _WORDS = out + ["quick", "brown", "fox", "lazy", "dog", "search",
                        "database"]
    return _WORDS


def bench_bm25(tmp_dir: str) -> None:
    """Config 3: BM25 fuzzy + phrase, top-20, over a synthetic zipf corpus
    (the nidx_paragraph workload: scoring + fuzzy expansion + phrase check)."""
    from nucliadb_tpu.index.text_engine import (
        DeviceTextEngine,
        TextQuery,
        build_segment,
        open_text_segment,
    )
    from nucliadb_tpu.index.text_engine.builder import DocEntry
    from nucliadb_tpu.types import Seq

    n_docs = int(os.environ.get("BENCH_DOCS", 100_000))
    words = _vocab()
    rng = np.random.default_rng(11)
    zipf = np.minimum(rng.zipf(1.3, size=(n_docs, 24)) - 1, len(words) - 8)
    hot = rng.random(n_docs) < 0.02  # 2% of docs carry the query terms
    entries = []
    for i in range(n_docs):
        toks = [words[j] for j in zipf[i]]
        if hot[i]:
            toks[:3] = ["quick", "brown", "fox"]
        entries.append(
            DocEntry(key=f"r{i}/t/t/0-10", text=" ".join(toks), facets=["/t/t"],
                     columns={"created": float(i)})
        )
    meta = build_segment(os.path.join(tmp_dir, "bm25seg"), entries, kind="paragraph")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])

    query = TextQuery(text="quick brown fxo", top_k=20, fuzzy=True,
                      phrases=["quick brown"])
    hits, _ = engine.search(query, need_matched=False)  # compile/warm
    assert hits, "query must match the planted docs"
    t0 = time.time()
    reps = REPS
    for _ in range(reps):
        hits, _ = engine.search(query, need_matched=False)
    dt = (time.time() - t0) / reps

    # Production serving shape: concurrent queries coalesce into ONE device
    # dispatch (text_engine/batcher.py -> engine.search_batch), up to the
    # coalescer's 512-query cap — the measured throughput peak on this chip
    # (64 -> 494 QPS, 256 -> 944, 512 -> 1092, 1024 -> 1064). Headline value
    # is the batched QPS at the cap.
    bq = int(os.environ.get("BENCH_BM25_BATCH", 512))
    rng_q = np.random.default_rng(23)
    batch_queries = []
    for i in range(bq):
        # distinct mid-frequency terms + one typo'd term (fuzzy d=1 work)
        t1, t2 = words[int(rng_q.integers(0, 2000))], words[int(rng_q.integers(0, 2000))]
        typo = "quikc" if i % 2 else "borwn"
        batch_queries.append(
            TextQuery(text=f"{t1} {t2} {typo}", top_k=20, fuzzy=True)
        )

    # Route A — the cost-model DEFAULT (engine.search host-tier routing):
    # scored OR queries run on the host WAND tier below the doc threshold
    # (index/text_engine/host_tier.py). This is what production serves.
    tier = engine.host_tier()
    host_bdt = None
    if tier is not None:
        engine.search_batch(batch_queries, need_matched=False)  # warm caches
        t0 = time.time()
        for _ in range(reps):
            out = engine.search_batch(batch_queries, need_matched=False)
        host_bdt = (time.time() - t0) / reps
        assert len(out) == bq

    # Route B — the batched device kernel (tier disabled): the path corpora
    # above NDBTPU_TEXT_HOST_TIER_MAX_DOCS and AND-semantics queries take.
    engine._host_tier_cached = None
    engine.search_batch(batch_queries, need_matched=False)  # compile/warm
    t0 = time.time()
    for _ in range(reps):
        out = engine.search_batch(batch_queries, need_matched=False)
    bdt = (time.time() - t0) / reps
    assert len(out) == bq
    engine._host_tier_cached = tier

    # CPU baseline: the in-tree single-core C++ BM25+WAND scorer over the
    # SAME corpus, tokenizer, scoring variant, and fuzzy-expansion policy
    # (tools/wand_baseline.py + native/bm25_wand.cpp) — the honest stand-in
    # for what nidx pays tantivy per keyword query. Caveat retained: tantivy
    # adds SIMD-tuned block codecs; treat the ratio as indicative, not a
    # tantivy measurement.
    cpu_qps = cpu_dt = None
    try:
        from tools.wand_baseline import WandBaseline

        wand = WandBaseline([e.text for e in entries])
        wand.search(batch_queries[0].text, 20)  # touch caches once
        t0 = time.time()
        for q in batch_queries:
            wand.search(q.text, 20)
        cpu_dt = (time.time() - t0) / bq
        cpu_qps = 1.0 / cpu_dt
    except ImportError:
        pass  # native extension not built: emit without the CPU ratio
    # ---- AND (all_terms) + phrase shapes (VERDICT r4 task 2) -------------
    # AND queries: pairs of co-occurring terms (sampled from real docs so
    # conjunctions actually match) + the same typo'd fuzzy term mix.
    rng_a = np.random.default_rng(31)
    and_queries = []
    for i in range(bq):
        di = int(rng_a.integers(0, n_docs))
        toks = [words[j] for j in zipf[di][:2]]
        and_queries.append(
            TextQuery(text=f"{toks[0]} {toks[1]}", top_k=20, fuzzy=bool(i % 2),
                      all_terms=True)
        )
    engine.search_batch(and_queries, need_matched=False)  # warm
    t0 = time.time()
    for _ in range(reps):
        out = engine.search_batch(and_queries, need_matched=False)
    and_dt = (time.time() - t0) / reps
    and_route = (
        "host_wand_tier" if engine.host_tier() is not None else "device_kernel"
    )
    # the device kernel's AND number for the same batch (the pre-r5 route)
    engine._host_tier_cached = None
    engine.search_batch(and_queries, need_matched=False)  # compile/warm
    t0 = time.time()
    for _ in range(reps):
        engine.search_batch(and_queries, need_matched=False)
    and_kernel_dt = (time.time() - t0) / reps
    engine._host_tier_cached = tier
    _emit(
        {
            "metric": f"config3_and_allterms_{n_docs}_top20",
            "value": round(bq / and_dt, 1),
            "unit": "qps",
            "vs_baseline": round(and_kernel_dt / and_dt, 2),
            "detail": {"route": and_route,
                       "ms_per_batch": round(and_dt * 1e3, 2),
                       "device_kernel_qps": round(bq / and_kernel_dt, 1),
                       "batched_queries_per_dispatch": bq,
                       "n_docs": n_docs},
        }
    )

    # phrase queries through the PARAGRAPH layer (position verification +
    # exact totals live there): quoted bigram sampled from real docs.
    from nucliadb_tpu.index.paragraph import (
        ParagraphSearcher,
        ParagraphSearchRequest,
    )
    from nucliadb_tpu.types import SimpleOpenIndex

    para = ParagraphSearcher(SimpleOpenIndex(segment_list=[(meta, Seq(1))]))
    para.engine = engine  # reuse the warm engine + host tier
    rng_p = np.random.default_rng(41)
    phrase_reqs = []
    for i in range(min(bq, 128)):
        di = int(rng_p.integers(0, n_docs))
        t1p, t2p = words[zipf[di][0]], words[zipf[di][1]]
        phrase_reqs.append(
            ParagraphSearchRequest(query=f'"{t1p} {t2p}"', top_k=20)
        )
    for r in phrase_reqs[:4]:
        para.search(r)
    t0 = time.time()
    for r in phrase_reqs:
        para.search(r)
    phrase_dt = (time.time() - t0) / len(phrase_reqs)
    _emit(
        {
            "metric": f"config3_phrase_{n_docs}_top20",
            "value": round(1.0 / phrase_dt, 1),
            "unit": "qps",
            "vs_baseline": None,
            "detail": {"ms_per_query": round(phrase_dt * 1e3, 3),
                       "route": and_route,
                       "exact_totals": True,
                       "n_docs": n_docs},
        }
    )

    default_bdt = host_bdt if host_bdt is not None else bdt
    _emit(
        {
            "metric": f"config3_bm25_fuzzy_phrase_{n_docs}_top20",
            "value": round(bq / default_bdt, 1),
            "unit": "qps",
            "vs_baseline": (
                round((bq / default_bdt) / cpu_qps, 1) if cpu_qps else None
            ),
            "detail": {"batched_queries_per_dispatch": bq,
                       "route": "host_wand_tier" if host_bdt is not None
                       else "device_kernel",
                       "ms_per_batch": round(default_bdt * 1e3, 2),
                       "device_kernel_qps": round(bq / bdt, 1),
                       "device_kernel_ms_per_batch": round(bdt * 1e3, 2),
                       "single_call_ms": round(dt * 1e3, 2),
                       "single_call_qps": round(1.0 / dt, 1),
                       "cpu_wand_ms_per_query": (
                           round(cpu_dt * 1e3, 3) if cpu_dt else None
                       ),
                       "cpu_wand_qps_single_core": (
                           round(cpu_qps, 1) if cpu_qps else None
                       ),
                       "n_docs": n_docs},
        }
    )


def bench_find(tmp_dir: str) -> None:
    """Config 4: hybrid /find p50 over HTTP against the standalone server
    (product latency: HTTP + parse + both index legs + fusion + hydration)."""
    import asyncio
    import threading

    import httpx

    from nucliadb_tpu.standalone.app import StandaloneApp

    dim = 128
    app = StandaloneApp(data_dir=os.path.join(tmp_dir, "srv"), port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(app.server.start())
        started.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    started.wait(15)
    c = httpx.Client(base_url=f"http://127.0.0.1:{app.server.port}", timeout=480)

    def embed(text):
        r = np.random.default_rng(abs(hash(text)) % (2**31))
        v = r.standard_normal(dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    kbid = c.post(
        "/api/v1/kbs", json={"slug": "benchkb", "vectorsets": {"m": {"dimension": dim}}}
    ).json()["uuid"]
    n_res = int(os.environ.get("BENCH_RESOURCES", 200))
    words = _vocab()
    rng = np.random.default_rng(3)
    t_ing = time.time()
    for i in range(n_res):
        body = " ".join(words[j] for j in rng.integers(0, 1000, size=40))
        c.post(
            f"/api/v1/kb/{kbid}/resources",
            json={
                "title": f"doc {i}",
                "texts": {"t": {"body": body}},
                "embeddings": {"m": {"t": [{"start": 0, "end": len(body), "vector": embed(body)}]}},
            },
        )
    ingest_dps = n_res / (time.time() - t_ing)

    q = {"query": "w0001 w0002", "vector": embed("w0001 w0002"), "top_k": 10}
    c.post(f"/api/v1/kb/{kbid}/find", json=q)  # warm
    lats = []
    for _ in range(20):
        t0 = time.time()
        r = c.post(f"/api/v1/kb/{kbid}/find", json=q)
        assert r.status_code == 200
        lats.append(time.time() - t0)
    lats.sort()
    # per-phase breakdown (median of 5 debug-mode requests): the product
    # pipeline's own phase clocks (find.py metrics.phases) — where each
    # warm /find millisecond goes, recorded in the bench artifact
    phase_runs = []
    for _ in range(5):
        rd = c.post(f"/api/v1/kb/{kbid}/find", json=dict(q, debug=True))
        phase_runs.append(rd.json().get("timings") or {})
    phases = {
        k: round(float(np.median([p.get(k, 0.0) for p in phase_runs])) * 1e3, 2)
        for k in sorted({k for p in phase_runs for k in p})
    }
    app.stop_background()
    _emit(
        {
            "metric": "config4_hybrid_find_p50",
            "value": round(lats[len(lats) // 2] * 1e3, 1),
            "unit": "ms",
            "vs_baseline": None,
            "detail": {"p95_ms": round(lats[int(len(lats) * 0.95)] * 1e3, 1),
                       "ingest_docs_per_s": round(ingest_dps, 1),
                       "resources": n_res,
                       "phase_ms_median": phases},
        }
    )


_CONC_SERVER = r'''
import json, sys, tempfile, threading, time, asyncio
import numpy as np
import logging; logging.disable(logging.WARNING)
from nucliadb_tpu.standalone.app import StandaloneApp

dim = 128
app = StandaloneApp(data_dir=tempfile.mkdtemp(prefix="bench5_"), port=0)
loop = asyncio.new_event_loop(); started = threading.Event()
def _run():
    asyncio.set_event_loop(loop); loop.run_until_complete(app.server.start())
    started.set(); loop.run_forever()
threading.Thread(target=_run, daemon=True).start(); started.wait(30)
app.start_background()
import httpx
c = httpx.Client(base_url=f"http://127.0.0.1:{app.server.port}", timeout=600)
kbid = c.post("/api/v1/kbs", json={"slug": "b", "vectorsets": {"m": {"dimension": dim}}}).json()["uuid"]
words = [f"w{i:04d}" for i in range(3000)]
def embed(text):
    r = np.random.default_rng(abs(hash(text)) % (2**31))
    v = r.standard_normal(dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()
rng = np.random.default_rng(3)
n_res = int(sys.argv[1])
for i in range(n_res):
    body = " ".join(words[j] for j in rng.integers(0, 1000, size=40))
    r = c.post(f"/api/v1/kb/{kbid}/resources", json={
        "title": f"doc {i}", "texts": {"t": {"body": body}},
        "embeddings": {"m": {"t": [{"start": 0, "end": len(body), "vector": embed(body)}]}},
    })
    assert r.status_code == 201, r.text
app.node.wait_for_sync()
for i in range(8):  # compile/warm the hot programs before clients arrive
    c.post(f"/api/v1/kb/{kbid}/find",
           json={"query": f"{words[i]} {words[i+1]}", "vector": embed(str(i)), "top_k": 10})
print(json.dumps({"port": app.server.port, "kbid": kbid}), flush=True)
threading.Event().wait()
'''

_CONC_CLIENT = r'''
import json, socket, sys, time, threading
import numpy as np
port, kbid, threads, duration, seed0 = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), float(sys.argv[4]), int(sys.argv[5]))
words = [f"w{i:04d}" for i in range(3000)]
dim = 128
def embed(text):
    r = np.random.default_rng(abs(hash(text)) % (2**31))
    v = r.standard_normal(dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()
def requests_for(seed, n=64):
    # precomputed raw HTTP bytes: the client must burn as little of the
    # (shared, single-core) host as possible while load-testing the server
    rr = np.random.default_rng(seed)
    out = []
    for i in range(n):
        t1, t2 = words[int(rr.integers(0, 1000))], words[int(rr.integers(0, 1000))]
        body = json.dumps({"query": f"{t1} {t2}", "vector": embed(t1 + t2), "top_k": 10}).encode()
        out.append((
            f"POST /api/v1/kb/{kbid}/find HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/json\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body)
    return out
lats, oks, errs = [], [0], [0]
lock = threading.Lock()
stop = time.time() + duration
def client(ci):
    reqs = requests_for(seed0 + ci)
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    buf = b""
    my = []
    i = 0
    while time.time() < stop:
        req = reqs[i % len(reqs)]; i += 1
        t0 = time.time()
        s.sendall(req)
        # read headers
        while b"\r\n\r\n" not in buf:
            buf += s.recv(65536)
        head, _, buf = buf.partition(b"\r\n\r\n")
        status = int(head.split(b" ", 2)[1])
        n = int([l for l in head.split(b"\r\n") if l.lower().startswith(b"content-length")][0].split(b":")[1])
        while len(buf) < n:
            buf += s.recv(65536)
        buf = buf[n:]
        my.append(time.time() - t0)
        with lock:
            (oks if status == 200 else errs)[0] += 1
    with lock:
        lats.extend(my)
ts = [threading.Thread(target=client, args=(i,)) for i in range(threads)]
t0 = time.time()
[t.start() for t in ts]; [t.join() for t in ts]
wall = time.time() - t0
lats.sort()
n = len(lats)
print(json.dumps({
    "qps": n / wall, "n": n, "errors": errs[0],
    "p50_ms": lats[n // 2] * 1e3 if n else None,
    "p95_ms": lats[int(n * 0.95)] * 1e3 if n else None,
}))
'''


def bench_find_concurrent(tmp_dir: str) -> None:
    """Config 5: concurrent product-level /find — 32 keep-alive clients (2
    OS processes x 16 threads, precomputed raw-socket requests) against the
    standalone server for a steady-state window. This is the deployment
    metric the engine QPS numbers do NOT capture: HTTP parse + query plan +
    both coalesced index legs + fusion + hydration + serialize, under load
    (VERDICT r2 weak #1). NOTE: this host has ONE CPU core — the product
    plane is host-Python-bound, so this measures the per-core serving rate;
    the reference scales the same bound with uvicorn replicas, this build
    with --workers/component mode on multi-core hosts."""
    import subprocess
    import sys as _sys

    n_res = int(os.environ.get("BENCH_RESOURCES", 200))
    duration = float(os.environ.get("BENCH_CONC_SECONDS", 12.0))
    server_src = os.path.join(tmp_dir, "conc_server.py")
    client_src = os.path.join(tmp_dir, "conc_client.py")
    with open(server_src, "w") as f:
        f.write(_CONC_SERVER)
    with open(client_src, "w") as f:
        f.write(_CONC_CLIENT)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.abspath(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    ).strip(os.pathsep)
    server = subprocess.Popen(
        [_sys.executable, server_src, str(n_res)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env, text=True,
    )
    try:
        line = server.stdout.readline()
        info = json.loads(line)
        port, kbid = info["port"], info["kbid"]
        # warm burst at the SAME concurrency as the measurement so every
        # coalesced batch shape the load will produce is compiled before the
        # window opens (first compiles go through the remote service and
        # would otherwise dominate p95)
        warm_procs = [
            subprocess.Popen(
                [_sys.executable, client_src, str(port), kbid, "16", "6.0",
                 str(500 + i)],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
            )
            for i in range(2)
        ]
        for p in warm_procs:
            p.wait(timeout=600)
        outs = []
        procs = [
            subprocess.Popen(
                [_sys.executable, client_src, str(port), kbid, "16",
                 str(duration), str(100 + 37 * i)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
            )
            for i in range(2)
        ]
        for p in procs:
            out, err = p.communicate(timeout=duration + 600)
            outs.append(json.loads(out))
        total_n = sum(o["n"] for o in outs)
        total_err = sum(o["errors"] for o in outs)
        qps = sum(o["qps"] for o in outs)
        p50 = max(o["p50_ms"] for o in outs if o["p50_ms"] is not None)
        p95 = max(o["p95_ms"] for o in outs if o["p95_ms"] is not None)
        assert total_err == 0, f"{total_err} non-200 responses under load"
        _emit({
            "metric": "config5_concurrent_find_32clients",
            "value": round(qps, 1),
            "unit": "qps",
            "vs_baseline": None,
            "detail": {
                "p50_ms": round(p50, 1), "p95_ms": round(p95, 1),
                "requests": total_n, "clients": 32, "errors": total_err,
                "resources": n_res, "seconds": duration,
                "host_cores": os.cpu_count(),
            },
        })
    finally:
        server.kill()


def bench_scatter4() -> None:
    """Config 5: 4 shards x N/4, scatter + top-k merge. One chip hosting 4
    shards runs all four scans and the global top-k merge as ONE dispatched
    device program (exactly what the mesh path in parallel/hybrid_mesh.py
    runs per slice, with the ICI all-gather replaced by an in-program
    concat; dryrun-validated on the 8-device CPU mesh by __graft_entry__.py).
    Dispatches are pipelined; every merged result is downloaded."""
    import functools

    import jax
    import jax.numpy as jnp

    from nucliadb_tpu.index.vector.device import _search_int8, bucket
    from nucliadb_tpu.ops import quant

    n_total = int(os.environ.get("BENCH_N", 1_000_000))
    shards = 4
    n = n_total // shards
    d, b, k = 768, int(os.environ.get("BENCH_B", 64)), 10
    n_pad = bucket(n + 1)
    ms = jnp.float32(-3.0e38)
    vectors, q_bufs = _gen_device_corpus(n_pad, d, b)
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    mask_j = jax.device_put(jnp.asarray(mask))
    codes = quant.Int8Codes.encode(vectors)
    _ = np.asarray(codes.scale[:2])

    # one arena reused for all 4 shards = same FLOPs/bytes as 4 distinct
    # shards without 4x the HBM (a real deployment puts one shard per chip
    # of a mesh anyway)
    @functools.partial(jax.jit, static_argnames=("k",))
    def scatter_merge(codes, vectors, mask, ms, q4, k):
        def one_shard(qq):
            return _search_int8(codes, vectors, qq, mask, ms, k, "dot")

        ss, ii = jax.lax.map(one_shard, q4)  # [S, B, k]
        # global top-k merge over per-shard top-k (shard_merge parity),
        # tagging each hit with its shard
        allsc = jnp.transpose(ss, (1, 0, 2)).reshape(ss.shape[1], -1)
        alli = jnp.transpose(ii, (1, 0, 2)).reshape(ss.shape[1], -1)
        shard_of = jnp.broadcast_to(
            jnp.repeat(jnp.arange(ss.shape[0], dtype=jnp.int32), k)[None, :],
            alli.shape,
        )
        msc, sel = jax.lax.top_k(allsc, k)
        mi = jnp.take_along_axis(alli, sel, axis=1)
        mshard = jnp.take_along_axis(shard_of, sel, axis=1)
        return msc, mi, mshard

    def run(j):
        q4 = jnp.stack([q_bufs[(j + s_) % len(q_bufs)] for s_ in range(shards)])
        return scatter_merge(codes, vectors, mask_j, ms, q4, k)

    s, i, sh = run(0)  # compile/warm
    _ = np.asarray(s)
    reps = REPS
    t0 = time.time()
    outs = [run(j) for j in range(reps)]  # pipelined dispatches
    merged = [(np.asarray(s), np.asarray(i), np.asarray(sh)) for s, i, sh in outs]
    dt = (time.time() - t0) / reps
    assert merged[0][0].shape == (b, k)
    _emit(
        {
            "metric": f"config5_scatter4_{n_total}_top10",
            "value": round(dt * 1e3, 1),
            "unit": "ms_per_batch",
            "vs_baseline": None,
            "detail": {"shards": shards, "batch": b,
                       "qps": round(b / dt, 1),
                       "merge": "in-program concat + top_k (device)"},
        }
    )


def bench_ingest_merge(tmp_dir: str) -> None:
    """Config 7: indexer-plane ingest + merge throughput (VERDICT r4 4c).

    Isolates the index node from the HTTP product plane (config 4's
    78 docs/s includes parse/extract/bus): resources/s and paragraphs/s
    through ``IndexerService`` (per-index segment build + single-txn
    metadata commit), then merge throughput in records/s through
    ``SchedulerService`` planning + ``WorkerService`` execution until the
    merge queue drains. Reference anchors: the nidx indexer + merge workers
    (nidx/src/indexer.rs, nidx/src/worker.rs; merge policies
    nidx/src/settings.rs:247-277)."""
    from nucliadb_tpu.index.vector import VectorConfig
    from nucliadb_tpu.models.internal import (
        IndexParagraph,
        ResourceDoc,
        TextInformation,
        VectorSentence,
    )
    from nucliadb_tpu.services import EmbeddedNode

    dim = int(os.environ.get("BENCH_INGEST_DIM", 128))
    n_res = int(os.environ.get("BENCH_INGEST_RESOURCES", 400))
    paras_per_res = 5
    words = _vocab()
    rng = np.random.default_rng(17)

    node = EmbeddedNode(data_dir=os.path.join(tmp_dir, "ingest_node"))
    shard_id = node.create_shard("benchkb", {"m": VectorConfig(dimension=dim)})

    def make_res(i: int) -> ResourceDoc:
        rid = f"res{i:06d}"
        rd = ResourceDoc(resource_id=rid, created=1000.0 + i, modified=1000.0 + i)
        body = " ".join(words[j] for j in rng.integers(0, 2000, size=40 * paras_per_res))
        rd.texts["t/t1"] = TextInformation(text=body)
        paras = {}
        for p in range(paras_per_res):
            lo, hi = p * 40, (p + 1) * 40
            para = IndexParagraph(start=lo, end=hi)
            v = rng.standard_normal(dim).astype(np.float32)
            v /= np.linalg.norm(v)
            para.vectorsets_sentences["m"] = {
                f"{rid}/t/t1/{p}/{lo}-{hi}": VectorSentence(vector=v)
            }
            paras[f"{rid}/t/t1/{lo}-{hi}"] = para
        rd.paragraphs["t/t1"] = paras
        return rd

    resources = [make_res(i) for i in range(n_res)]  # built OUTSIDE the clock
    t0 = time.time()
    for rd in resources:
        node.index(shard_id, rd)
    node.wait_for_sync()
    ingest_s = time.time() - t0
    n_seg_before = sum(
        len(node.metadata.ready_segments(idx.id))
        for idx in node.metadata.get_indexes(shard_id)
    )
    records_before = n_res * paras_per_res

    t0 = time.time()
    rounds = 0
    while True:
        done = node.tick_background()
        rounds += 1
        if not done.get("merjobs", done.get("jobs", 0)) and rounds > 1:
            if node.scheduler.tick() == 0:
                while node.worker.run_one():
                    pass
                break
    merge_s = time.time() - t0
    n_seg_after = sum(
        len(node.metadata.ready_segments(idx.id))
        for idx in node.metadata.get_indexes(shard_id)
    )
    _emit(
        {
            "metric": f"config7_ingest_merge_{n_res}res",
            "value": round(n_res / ingest_s, 1),
            "unit": "resources_per_s",
            "vs_baseline": None,
            "detail": {
                "paragraphs_per_s": round(records_before / ingest_s, 1),
                "ingest_s": round(ingest_s, 2),
                "merge_records_per_s": round(records_before / merge_s, 1),
                "merge_s": round(merge_s, 2),
                "segments_before_merge": n_seg_before,
                "segments_after_merge": n_seg_after,
                "dim": dim,
                "paragraphs": records_before,
            },
        }
    )

    # ---- HA-on column (VERDICT r4 task 8): the same workload through a
    # network substrate, without and WITH an attached warm standby (every
    # mutating RPC — including put_blob segment uploads — ships
    # synchronously before the ack; zero acked-write loss posture).
    if os.environ.get("BENCH_INGEST_HA", "1") != "1":
        return
    from nucliadb_tpu.substrate import (
        RemoteMetadataStore,
        RemoteStorage,
        SubstrateServer,
    )

    def run_pass(tag: str, with_standby: bool) -> dict:
        pdir = os.path.join(tmp_dir, f"sub_{tag}")
        primary = SubstrateServer(os.path.join(pdir, "primary"))
        primary.start()
        standby = None
        if with_standby:
            standby = SubstrateServer(
                os.path.join(pdir, "standby"), follower=True
            )
            standby.start()
            primary.attach_follower(f"127.0.0.1:{standby.port}")
        addr = f"127.0.0.1:{primary.port}"
        node2 = EmbeddedNode(
            data_dir=os.path.join(pdir, "node"),
            metadata=RemoteMetadataStore(addr),
            storage=RemoteStorage(addr),
        )
        sid = node2.create_shard("benchkb", {"m": VectorConfig(dimension=dim)})
        t0 = time.time()
        for rd in resources:
            node2.index(sid, rd)
        node2.wait_for_sync()
        dt = time.time() - t0
        t0 = time.time()
        r = 0
        while True:
            done = node2.tick_background()
            r += 1
            if not done.get("merjobs", done.get("jobs", 0)) and r > 1:
                if node2.scheduler.tick() == 0:
                    while node2.worker.run_one():
                        pass
                    break
        mdt = time.time() - t0
        applied = standby._applied if standby is not None else None
        primary.stop(0)
        if standby is not None:
            standby.stop(0)
        return {
            "ingest_res_per_s": round(n_res / dt, 1),
            "ingest_s": round(dt, 2),
            "merge_records_per_s": round(records_before / mdt, 1),
            "standby_applied_ops": applied,
        }

    no_ha = run_pass("noha", with_standby=False)
    ha = run_pass("ha", with_standby=True)
    _emit(
        {
            "metric": f"config7_ha_ingest_{n_res}res",
            "value": ha["ingest_res_per_s"],
            "unit": "resources_per_s",
            "vs_baseline": round(
                ha["ingest_res_per_s"] / no_ha["ingest_res_per_s"], 3
            ),
            "detail": {
                "substrate_no_standby": no_ha,
                "substrate_with_standby": ha,
                "local_backends_res_per_s": round(n_res / ingest_s, 1),
                "note": "vs_baseline = HA-on / HA-off over the SAME network "
                        "substrate; synchronous ship incl. put_blob",
            },
        }
    )


def main() -> None:
    import tempfile

    from nucliadb_tpu.utils.platform import configure_jax

    configure_jax()
    which = set(sys.argv[1:]) or {
        "vec100k", "vec1m_filtered", "bm25", "find", "find_concurrent",
        "scatter4", "ingest_merge",
    }
    tmp = tempfile.mkdtemp(prefix="bench_suite_")
    if "vec100k" in which:
        bench_vec100k()
    if "vec1m_filtered" in which:
        bench_vec1m_filtered()
    if "bm25" in which:
        bench_bm25(tmp)
    if "find" in which:
        bench_find(tmp)
    if "find_concurrent" in which:
        bench_find_concurrent(tmp)
    if "scatter4" in which:
        bench_scatter4()
    if "ingest_merge" in which:
        bench_ingest_merge(tmp)


if __name__ == "__main__":
    main()
