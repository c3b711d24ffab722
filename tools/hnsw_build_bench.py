"""HNSW build at 1M x 768 — the BASELINE.json named target (VERDICT r4
task 4a).

Transfer discipline: the ~3 GB f32 corpus never crosses the ~10 MB/s
host<->TPU relay. The SAME jax.random program (threefry is deterministic
across backends) generates the corpus twice — once on the host CPU backend
(the copy ops/hnsw.py's native linker reads) and once on the TPU (the
arena the wave kernels scan); ulp-level rounding differences between
backends are harmless to graph construction.

Usage: python tools/hnsw_build_bench.py [n] [d] [queries]
Prints one JSON line: build seconds, waves/dispatches, recall@10 of
hnsw_search vs the on-device exact oracle.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    import jax.numpy as jnp

    from nucliadb_tpu.ops import hnsw as hnsw_ops
    from nucliadb_tpu.utils.platform import configure_jax, device_fetch

    configure_jax()
    cpu = jax.devices("cpu")[0]

    def gen(key, lo, hi):
        return jax.random.normal(key, (hi - lo, d), jnp.float32)

    key = jax.random.PRNGKey(7)
    # normalized rows (cosine regime, target config 2's metric)
    chunk = 131_072
    t0 = time.time()
    host_parts = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        k = jax.random.fold_in(key, lo)
        part = jax.jit(gen, static_argnums=(1, 2), device=cpu)(k, lo, hi)
        host_parts.append(np.asarray(part))
    vectors_np = np.concatenate(host_parts)
    del host_parts
    vectors_np /= np.linalg.norm(vectors_np, axis=1, keepdims=True) + 1e-12
    host_gen_s = time.time() - t0

    t0 = time.time()

    @jax.jit
    def gen_dev():
        parts = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            k = jax.random.fold_in(key, lo)
            parts.append(jax.random.normal(k, (hi - lo, d), jnp.float32))
        v = jnp.concatenate(parts)
        return v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)

    vectors_dev = gen_dev()
    vectors_dev.block_until_ready()
    dev_gen_s = time.time() - t0

    t0 = time.time()
    adj, entry_ids = hnsw_ops.build_graph(vectors_np, vectors_dev=vectors_dev)
    build_s = time.time() - t0

    # recall@10 vs the exact on-device oracle, query = perturbed corpus rows
    rng = np.random.default_rng(3)
    q_ids = rng.integers(0, n, n_q)
    queries = vectors_np[q_ids] + 0.05 * rng.standard_normal((n_q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    qj = jnp.asarray(queries)

    @jax.jit
    def exact10(v, q):
        return jax.lax.top_k(q @ v.T, 10)

    es, ei = device_fetch(*exact10(vectors_dev, qj))

    t0 = time.time()
    node_mask = jnp.ones(n, dtype=bool)
    hs, hi = hnsw_ops.hnsw_search(
        vectors_dev, jnp.asarray(adj), jnp.asarray(entry_ids), qj,
        node_mask, jnp.float32(-3.0e38), 10,
    )
    hs, hi = device_fetch(hs, hi)
    search_s = time.time() - t0
    recall = float(np.mean([
        len(set(hi[b].tolist()) & set(ei[b].tolist())) / 10.0 for b in range(n_q)
    ]))

    print(json.dumps({
        "metric": f"hnsw_build_{n}x{d}",
        "build_s": round(build_s, 1),
        "host_gen_s": round(host_gen_s, 1),
        "dev_gen_s": round(dev_gen_s, 1),
        "recall_at_10_vs_exact": round(recall, 4),
        "search_s_batch": round(search_s, 2),
        "n": n, "d": d, "queries": n_q,
        "native_linker": hnsw_ops._native is not None,
    }))


if __name__ == "__main__":
    main()
