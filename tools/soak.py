"""Mixed-workload soak: concurrent ingest + hybrid /find + suggest +
graph queries against the standalone HTTP server for N seconds; asserts
zero non-2xx responses and reports throughput + RSS drift (leak guard).

Usage: python tools/soak.py [seconds] [clients]
"""

from __future__ import annotations

import asyncio
import json
import os
import resource
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dim = 128

    import httpx

    from nucliadb_tpu.standalone.app import StandaloneApp

    app = StandaloneApp(data_dir=tempfile.mkdtemp(), host="127.0.0.1", port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(app.server.start())
        started.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    started.wait(30)
    app.start_background()
    base = f"http://127.0.0.1:{app.server.port}"

    boot = httpx.Client(base_url=base, timeout=120)
    kbid = boot.post(
        "/api/v1/kbs", json={"slug": "soak", "vectorsets": {"m": {"dimension": dim}}}
    ).json()["uuid"]
    words = [f"w{i:04d}" for i in range(3000)]

    def embed(seed: int):
        r = np.random.default_rng(seed)
        v = r.standard_normal(dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    def body_for(rng, i):
        body = " ".join(words[j] for j in rng.integers(0, 1000, size=40))
        return {
            "title": f"doc {i}", "texts": {"t": {"body": body}},
            "usergenerated_relations": [
                {"from_": {"value": f"entity {i % 50}", "type": "entity"},
                 "to": {"value": f"entity {(i * 7) % 50}", "type": "entity"},
                 "relation": "knows", "label": ""},
            ],
            "embeddings": {"m": {"t": [
                {"start": 0, "end": len(body), "vector": embed(i)}
            ]}},
        }

    rng0 = np.random.default_rng(1)
    for i in range(50):  # seed corpus + warm compiles
        r = boot.post(f"/api/v1/kb/{kbid}/resources", json=body_for(rng0, i))
        assert r.status_code == 201, r.text
    for i in range(4):
        boot.post(f"/api/v1/kb/{kbid}/find", json={
            "query": f"{words[i]} {words[i + 1]}", "vector": embed(i),
            "top_k": 10, "features": ["keyword", "semantic", "relations"]})

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    stop_at = time.time() + seconds
    counts = {"ingest": 0, "find": 0, "suggest": 0, "graph": 0, "throttled": 0}
    lats: dict[str, list[float]] = {k: [] for k in counts}
    errors: list[str] = []
    lock = threading.Lock()

    def client(ci: int) -> None:
        rng = np.random.default_rng(100 + ci)
        c = httpx.Client(base_url=base, timeout=120)
        i = 1000 * ci
        try:
            while time.time() < stop_at:
                roll = rng.random()
                t_req = time.perf_counter()
                if ci == 0 or roll < 0.15:  # client 0 is a dedicated writer
                    r = c.post(f"/api/v1/kb/{kbid}/resources",
                               json=body_for(rng, i))
                    i += 1
                    kind, want = "ingest", 201
                elif roll < 0.7:
                    t1 = words[int(rng.integers(0, 1000))]
                    t2 = words[int(rng.integers(0, 1000))]
                    r = c.post(f"/api/v1/kb/{kbid}/find", json={
                        "query": f"{t1} {t2}", "vector": embed(int(rng.integers(1 << 30))),
                        "top_k": 10, "features": ["keyword", "semantic"]})
                    kind, want = "find", 200
                elif roll < 0.85:
                    r = c.get(f"/api/v1/kb/{kbid}/suggest",
                              params={"query": words[int(rng.integers(0, 1000))][:5]})
                    kind, want = "suggest", 200
                else:
                    r = c.post(f"/api/v1/kb/{kbid}/graph", json={
                        "query": {"prop": "path",
                                  "source": {"value": f"entity {int(rng.integers(0, 50))}"},
                                  "destination": {}, "relation": {}},
                        "top_k": 20})
                    kind, want = "graph", 200
                if r.status_code == 429:
                    # back-pressure (merge debt / indexing behind): honor
                    # the retry hint like a production writer would
                    with lock:
                        counts["throttled"] += 1
                    time.sleep(min(2.0, float(r.json().get("try_after", 1.0))
                                   if r.headers.get("content-type", "").startswith("application/json")
                                   else 1.0))
                    continue
                with lock:
                    if r.status_code != want:
                        errors.append(f"{kind}:{r.status_code}:{r.text[:120]}")
                    counts[kind] += 1
                    lats[kind].append(time.perf_counter() - t_req)
        except Exception as e:  # pragma: no cover
            with lock:
                errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.time()
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    total = sum(counts.values())
    def pct(kind: str) -> dict:
        xs = sorted(lats[kind])
        if not xs:
            return {}
        return {
            "p50_ms": round(xs[len(xs) // 2] * 1e3, 1),
            "p95_ms": round(xs[int(len(xs) * 0.95)] * 1e3, 1),
        }

    print(json.dumps({
        "metric": "soak_mixed_http",
        "seconds": round(wall, 1),
        "clients": n_clients,
        "requests": total,
        "rps": round(total / wall, 1),
        "mix": counts,
        "latency": {k: pct(k) for k in ("ingest", "find", "suggest", "graph")},
        "errors": len(errors),
        "error_samples": errors[:5],
        "rss_mb_start": rss0 // 1024,
        "rss_mb_end": rss1 // 1024,
        "backend": __import__("jax").default_backend(),
    }))
    assert not errors, errors[:5]


if __name__ == "__main__":
    main()
