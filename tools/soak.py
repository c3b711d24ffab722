"""Mixed-workload soak against a real standalone server.

Continuous ingest + concurrent hybrid finds + asks + background merges,
with a rollover and a backup fired mid-run; asserts zero errors and
listing/counter/search consistency at the end.

Run from the repo root (do NOT overwrite PYTHONPATH — the TPU plugin lives
on the ambient path):

    python tools/soak.py            # ~15 minutes on the deployment chip

Findings this harness has caught: per-query inline arena rebuilds under
ingest (2.3 s/find -> ~100 ms after the serving-mode sync policy), the
tiny-bucket compile cascade on fresh caches (MIN_BUCKET=4096), orphaned
merge jobs after rollover, and cached shard-counter drift."""
import asyncio, threading, tempfile, time, logging, json, sys
logging.getLogger("nucliadb_tpu.search.slow").setLevel(logging.ERROR)
import numpy as np, httpx
from nucliadb_tpu.standalone.app import StandaloneApp

app = StandaloneApp(data_dir=tempfile.mkdtemp(prefix="soak_"), port=0)
app.start_background(interval=5.0)
loop = asyncio.new_event_loop(); started = threading.Event()
def run():
    asyncio.set_event_loop(loop); loop.run_until_complete(app.server.start()); started.set(); loop.run_forever()
threading.Thread(target=run, daemon=True).start(); started.wait(15)
base = f"http://127.0.0.1:{app.server.port}"
DIM = 128
def embed(text):
    r = np.random.default_rng(abs(hash(text)) % (2**31))
    v = r.standard_normal(DIM).astype(np.float32)
    return (v/np.linalg.norm(v)).tolist()

c = httpx.Client(base_url=base, timeout=480)
kbid = c.post("/api/v1/kbs", json={"slug":"soak","vectorsets":{"m":{"dimension":DIM}}}).json()["uuid"]

DURATION = int(__import__("os").environ.get("SOAK_DURATION_S", 900))
t_end = time.time() + DURATION
stats = {"ingested": 0, "finds": 0, "asks": 0, "errors": 0, "find_ms": []}
lock = threading.Lock()
stop = threading.Event()

def ingester():
    i = 0
    cl = httpx.Client(base_url=base, timeout=480)
    while not stop.is_set():
        body = f"soak document {i} topic {i%11} token{i%37} steady stream of content"
        r = cl.post(f"/api/v1/kb/{kbid}/resources", json={
            "title": f"soak{i}", "texts": {"t": {"body": body}},
            "embeddings": {"m": {"t": [{"start":0,"end":len(body),"vector":embed(body)}]}}})
        with lock:
            if r.status_code == 201: stats["ingested"] += 1
            else: stats["errors"] += 1
        i += 1
        time.sleep(0.15)

def finder():
    cl = httpx.Client(base_url=base, timeout=480)
    qn = 0
    while not stop.is_set():
        qn += 1
        q = f"soak document topic token{qn%37}"
        t0 = time.time()
        r = cl.post(f"/api/v1/kb/{kbid}/find", json={"query": q, "vector": embed(q), "top_k": 5})
        ms = (time.time()-t0)*1e3
        with lock:
            if r.status_code == 200:
                stats["finds"] += 1; stats["find_ms"].append(ms)
            else: stats["errors"] += 1
        time.sleep(0.2)

def asker():
    cl = httpx.Client(base_url=base, timeout=480)
    while not stop.is_set():
        r = cl.post(f"/api/v1/kb/{kbid}/ask", json={"query": "soak topic"},
                    headers={"x-synchronous": "true"})
        with lock:
            if r.status_code == 200: stats["asks"] += 1
            else: stats["errors"] += 1
        time.sleep(2.0)

threads = [threading.Thread(target=f) for f in (ingester, finder, finder, asker)]
[t.start() for t in threads]

did_rollover = did_backup = False
while time.time() < t_end:
    time.sleep(30)
    with lock:
        n = stats["ingested"]
    if n > 300 and not did_rollover:
        r = c.post(f"/api/v1/admin/rollover/{kbid}")
        print(f"# rollover at n={n}: {r.status_code}", file=sys.stderr, flush=True)
        did_rollover = True
    if n > 600 and not did_backup:
        r = c.post(f"/api/v1/kb/{kbid}/backup")
        print(f"# backup at n={n}: {r.status_code}", file=sys.stderr, flush=True)
        did_backup = True
    with lock:
        ms = sorted(stats["find_ms"][-100:])
        p50 = ms[len(ms)//2] if ms else 0
    print(f"# t={DURATION-(t_end-time.time()):.0f}s ingested={stats['ingested']} finds={stats['finds']} asks={stats['asks']} errors={stats['errors']} find_p50={p50:.0f}ms", file=sys.stderr, flush=True)

stop.set()
[t.join(30) for t in threads]

# final invariants: all ingested docs searchable, counters consistent
time.sleep(1)
c2 = httpx.Client(base_url=base, timeout=480)
listing = c2.get(f"/api/v1/kb/{kbid}/resources", params={"size": 10000}).json()
counters = c2.get(f"/api/v1/kb/{kbid}/counters").json()
q = c2.post(f"/api/v1/kb/{kbid}/find", json={"query": "steady stream", "top_k": 5}).json()
ms = sorted(stats["find_ms"])
print(json.dumps({
    "ingested": stats["ingested"], "finds": stats["finds"], "asks": stats["asks"],
    "errors": stats["errors"],
    "listed": len(listing.get("resources", [])),
    "counter_resources": counters.get("resources"),
    "find_p50_ms": round(ms[len(ms)//2], 1) if ms else None,
    "find_p95_ms": round(ms[int(len(ms)*0.95)], 1) if ms else None,
    "final_find_ok": bool(q.get("best_matches")),
    "rollover": did_rollover, "backup": did_backup,
}))
assert stats["errors"] == 0, f"soak saw {stats['errors']} errors"
assert len(listing.get("resources", [])) == stats["ingested"]
assert counters.get("resources") == stats["ingested"]
assert q.get("best_matches")
print("SOAK PASS")
