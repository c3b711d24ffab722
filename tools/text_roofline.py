"""Per-phase roofline profile of the batched BM25 path (VERDICT r4 task 5).

Breaks a warm batch-512 `DeviceTextEngine.search_batch` into:
  host_plan   — `_plan_terms` per query (tokenize, stopword df, fuzzy expand)
  host_pack   — slot assignment + adaptive caps + row/idf packing
  host_build  — result construction from fetched buffers (TextHit loop)
  device      — remainder: uploads + kernel + device→host fetch
and compares the device share against the HBM-bandwidth floor: the kernel's
work is B × Σ(scheduled posting rows × tier width) gathered score elements
plus the dense-slot adds (B × dense_cap × n_pad per group), all read once
and accumulated into [B, n_pad] score rows. The measured gap above that
floor is XLA's per-lane scatter/gather cost (~10.7-37 ns/element on this
platform, engine.py:993) — the quantified reason the host WAND tier wins
keyword top-k and the kernel keeps only the shapes the MXU/VPU wins.

Usage: python tools/text_roofline.py [n_docs] [batch] [reps]
Prints one JSON line (consumed into STATUS.md's roofline section).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(n_docs: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench_suite

    words = bench_suite._vocab()
    rng = np.random.default_rng(11)
    zipf = np.minimum(rng.zipf(1.3, size=(n_docs, 24)) - 1, len(words) - 8)
    hot = rng.random(n_docs) < 0.02
    from nucliadb_tpu.index.text_engine.builder import DocEntry

    entries = []
    for i in range(n_docs):
        toks = [words[j] for j in zipf[i]]
        if hot[i]:
            toks[:3] = ["quick", "brown", "fox"]
        entries.append(
            DocEntry(key=f"r{i}/t/t/0-10", text=" ".join(toks), facets=["/t/t"])
        )
    return words, entries


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import tempfile

    from nucliadb_tpu.index.text_engine import (
        DeviceTextEngine, TextQuery, build_segment, open_text_segment,
    )
    from nucliadb_tpu.types import Seq
    from nucliadb_tpu.utils.platform import configure_jax

    configure_jax()
    # this tool rooflines the DEVICE kernel; pin the route (the engine's
    # cost-model default is the host WAND tier at these corpus sizes —
    # measured separately below for the comparison line)
    os.environ["NDBTPU_TEXT_HOST_TIER"] = "0"
    words, entries = build_corpus(n_docs)
    tmp = tempfile.mkdtemp(prefix="text_roofline_")
    meta = build_segment(os.path.join(tmp, "seg"), entries, kind="paragraph")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])

    rng_q = np.random.default_rng(23)
    queries = []
    for i in range(bq):
        t1 = words[int(rng_q.integers(0, 2000))]
        t2 = words[int(rng_q.integers(0, 2000))]
        typo = "quikc" if i % 2 else "borwn"
        queries.append(TextQuery(text=f"{t1} {t2} {typo}", top_k=20, fuzzy=True))

    # warm: compile + fuzzy-expansion memo (the serving steady state)
    engine.search_batch(queries, need_matched=False)

    t0 = time.time()
    for _ in range(reps):
        out = engine.search_batch(queries, need_matched=False)
    total_ms = (time.time() - t0) / reps * 1e3
    assert len(out) == bq

    # phase: host planning
    t0 = time.time()
    for _ in range(reps):
        planned = [engine._plan_terms(q) for q in queries]
    plan_ms = (time.time() - t0) / reps * 1e3

    # phase: host packing (slots + adaptive caps + rows/idfs/params)
    t0 = time.time()
    for _ in range(reps):
        slots_list = [engine._plan_slots(terms) for terms, _ in planned]
        caps_list = [engine._caps_for(s, adaptive=True) for s in slots_list]
        caps = tuple(max(c[i] for c in caps_list) for i in range(len(caps_list[0])))
        for slots, (terms, required), q in zip(slots_list, planned, queries):
            r, w, scheduled = engine._pack_slots(slots, caps)
            engine._params_for(required, scheduled, q)
    pack_ms = (time.time() - t0) / reps * 1e3

    # phase: host result build from ALREADY-FETCHED buffers (device_fetch
    # passes numpy straight through, so this times only the python loop)
    pending = engine.dispatch_batch(queries, need_matched=False)
    bufs = [np.asarray(b) for b in pending.buffers]
    k = pending.k
    t0 = time.time()
    for _ in range(reps):
        engine._finalize_batch(queries, k, False, *bufs)
    build_ms = (time.time() - t0) / reps * 1e3

    device_ms = total_ms - plan_ms - pack_ms - build_ms

    # comparison line: the cost-model default route (host WAND tier)
    os.environ["NDBTPU_TEXT_HOST_TIER"] = "1"
    engine._host_tier_cached = engine._HOST_TIER_UNSET
    host_ms = None
    if engine.host_tier() is not None:
        engine.search_batch(queries, need_matched=False)  # warm maxtf cache
        t0 = time.time()
        for _ in range(reps):
            engine.search_batch(queries, need_matched=False)
        host_ms = (time.time() - t0) / reps * 1e3
    os.environ["NDBTPU_TEXT_HOST_TIER"] = "0"
    engine._host_tier_cached = None

    # roofline floor for the device share: every scheduled element is read
    # once and accumulated into the [B, n_pad] score rows — the bound is
    # HBM BANDWIDTH (v5e ~819 GB/s), not FLOPs. (The ~37 ns/element figure
    # engine.py:993 quotes is XLA's per-lane SCATTER cost on this platform —
    # the measured reason the kernel sits far above this floor, and the
    # cost-model motivation for the host WAND tier.)
    tier_counts = engine._tier_group_counts()
    n_t = sum(tier_counts)
    widths = [w for g in engine.groups for w in g.widths[: len(g.tiers_dev)]]
    gather_elems = bq * sum(c * w for c, w in zip(caps[:n_t], widths))
    dense_elems = bq * sum(
        caps[n_t + gi] * g.n_pad
        for gi, g in enumerate(engine.groups)
        if g.dense_dev is not None
    )
    score_rows = bq * sum(g.n_pad for g in engine.groups)
    bytes_moved = (gather_elems + dense_elems) * 4 + 2 * score_rows * 4
    floor_ms = bytes_moved / 819e9 * 1e3

    print(json.dumps({
        "metric": f"text_roofline_{n_docs}_b{bq}",
        "total_ms_per_batch": round(total_ms, 2),
        "qps": round(bq / (total_ms / 1e3), 1),
        "host_plan_ms": round(plan_ms, 2),
        "host_pack_ms": round(pack_ms, 2),
        "host_build_ms": round(build_ms, 2),
        "device_ms": round(device_ms, 2),
        "gather_elements": int(gather_elems),
        "dense_elements": int(dense_elems),
        "floor_ms": round(floor_ms, 2),
        "device_over_floor": round(device_ms / floor_ms, 2) if floor_ms else None,
        "host_share_pct": round(
            100 * (plan_ms + pack_ms + build_ms) / total_ms, 1
        ),
        "host_wand_tier_ms_per_batch": (
            round(host_ms, 2) if host_ms is not None else None
        ),
        "host_wand_tier_qps": (
            round(bq / (host_ms / 1e3), 1) if host_ms else None
        ),
    }))


if __name__ == "__main__":
    main()
