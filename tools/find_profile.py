"""Profile the product /find pipeline host cost (VERDICT r4 task 1 prep).

Boots the standalone app in-process with the bench_suite config-5 corpus
shape (hybrid finds: 2 keyword terms + a query vector, top-10), then runs
N finds straight through SearchService.find (no HTTP) under cProfile and
prints the top cumulative entries plus ms/query. Run with nothing else on
the core.

Usage: python tools/find_profile.py [n_resources] [n_queries] [--http]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    n_res = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    dim = 128

    import asyncio
    import threading

    import httpx

    from nucliadb_tpu.standalone.app import StandaloneApp
    from nucliadb_tpu.models.api import FindRequest, SearchFeature

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
    c = httpx.Client(base_url=f"http://127.0.0.1:{app.server.port}", timeout=600)
    words = [f"w{i:04d}" for i in range(3000)]

    def embed(text):
        r = np.random.default_rng(abs(hash(text)) % (2**31))
        v = r.standard_normal(dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    kbid = c.post(
        "/api/v1/kbs",
        json={"slug": "b", "vectorsets": {"m": {"dimension": dim}}},
    ).json()["uuid"]
    rng = np.random.default_rng(3)
    for i in range(n_res):
        body = " ".join(words[j] for j in rng.integers(0, 1000, size=40))
        r = c.post(f"/api/v1/kb/{kbid}/resources", json={
            "title": f"doc {i}", "texts": {"t": {"body": body}},
            "embeddings": {"m": {"t": [
                {"start": 0, "end": len(body), "vector": embed(body)}
            ]}},
        })
        assert r.status_code == 201, r.text
    app.node.wait_for_sync()

    rr = np.random.default_rng(7)
    reqs = []
    for i in range(64):
        t1 = words[int(rr.integers(0, 1000))]
        t2 = words[int(rr.integers(0, 1000))]
        reqs.append(
            FindRequest(
                query=f"{t1} {t2}",
                vector=embed(t1 + t2),
                top_k=10,
                features=[SearchFeature.KEYWORD, SearchFeature.SEMANTIC],
            )
        )
    for r in reqs[:8]:  # warm/compile
        app.search.find(kbid, r)

    t0 = time.perf_counter()
    for i in range(n_q):
        app.search.find(kbid, reqs[i % len(reqs)])
    wall = time.perf_counter() - t0
    print(f"find: {wall / n_q * 1e3:.3f} ms/query ({n_q / wall:.1f} QPS in-process)")

    prof = cProfile.Profile()
    prof.enable()
    for i in range(n_q):
        app.search.find(kbid, reqs[i % len(reqs)])
    prof.disable()
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
