"""Pallas TPU kernel: fused int8 scan + bucketed top-k candidates.

The XLA int8 candidate path (ops/quant.py int8_scan_candidates) runs as
matmul -> [B, N] f32 scores materialized in HBM -> approx_max_k. At
1M x 768 that is ~4.6 ms/batch32 on a v5e: the scores round-trip costs
~256 MB of HBM traffic and the int8 GEMM runs well under the bandwidth
roofline. This kernel fuses the whole candidate scan into one pass:

- grid over row blocks of the code matrix; each step DMAs a [Nb, D] int8
  block into VMEM (double-buffered by the Pallas pipeline) and issues one
  MXU int8 contraction against the quantized queries -> [B, Nb] i32;
- per-vector scales fold in on the VPU (the per-QUERY scale is a positive
  per-row constant — it cannot change ranking, so it is skipped);
- candidates accumulate into a VMEM slot table [B, S]: column j lands in
  slot j mod S via a reshape + max-reduce. This is the same partial
  reduction `lax.approx_max_k` performs (two true top-k items collide in
  one slot with probability ~k/S), but it never writes scores to HBM;
- the final [B, S] table (plus slot-winner ids) is the only HBM output;
  the caller runs an exact tiny top-k over S slots and the usual exact
  f32 rerank, so end recall matches the XLA path.

Parity note: this is the TPU-native replacement for the reference's
RaBitQ/SIMD scan loops (nidx_vector/src/vector_types/rabitq.rs dot +
rerank_top); the rerank stage stays in ops/quant.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import EPSILON

NEG_INF = float(np.finfo(np.float32).min)

BLOCK_N = 8192  # rows of codes per grid step ([8192, 768] int8 = 6 MB VMEM)
SLOTS = 1024  # accumulator slots per query (collision prob ~k/S)
BLOCK_B = 128  # query rows per grid step for large batches (VMEM budget:
#              scores [128, 8192] f32 = 4 MB + codes 6 MB + accs 2 MB)


def _scan_kernel(
    q_ref,  # [Bb, D] int8 (block of queries, same for every n step)
    codes_ref,  # [Nb, D] int8 block
    scale_ref,  # [1, Nb] f32 block
    mask_ref,  # [1, Nb] i8 block (1 = eligible)
    out_s_ref,  # [Bb, S] f32
    out_i_ref,  # [Bb, S] i32
    acc_s,  # VMEM scratch [Bb, S] f32
    acc_i,  # VMEM scratch [Bb, S] i32
    *,
    block_n: int,
    slots: int,
):
    # grid = (query_blocks, n_blocks); the n dimension is innermost, so for
    # each query block the accumulator re-initialises at step 0 and flushes
    # at the last n step — the scratch persists across the sequential grid
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        acc_s[:] = jnp.full(acc_s.shape, NEG_INF, jnp.float32)
        acc_i[:] = jnp.full(acc_i.shape, -1, jnp.int32)

    b = q_ref.shape[0]
    r = block_n // slots

    raw = jax.lax.dot_general(
        q_ref[:],
        codes_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Bb, Nb] on the MXU
    # keep every intermediate >= 2D ([1, Nb] broadcasts over [Bb, Nb]);
    # rank-1 vectors crash Mosaic's layout inference
    scores = jnp.where(
        mask_ref[:] != 0, raw.astype(jnp.float32) * scale_ref[:], NEG_INF
    )

    # slot assignment: column j -> slot j % S. Merge the r sub-ranges with
    # lane-aligned slices (slots is a multiple of 128) — a reshape to
    # [Bb, r, S] would split the lane dimension and force a relayout every
    # step, and a log-depth pairwise tree holds r live [Bb, S] temporaries
    # and spills; both measured far slower than this serial chain.
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (b, slots), 1)
    for t in range(r):
        sub = scores[:, t * slots : (t + 1) * slots]  # [Bb, S]
        take = sub > acc_s[:]
        acc_s[:] = jnp.where(take, sub, acc_s[:])
        acc_i[:] = jnp.where(take, step * block_n + t * slots + slot_iota, acc_i[:])

    @pl.when(step == pl.num_programs(1) - 1)
    def _flush():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@partial(jax.jit, static_argnames=("block_n", "slots", "block_b", "interpret"))
def int8_scan_slots(
    q_codes: jax.Array,  # [B, D] int8 quantized queries
    codes: jax.Array,  # [N, D] int8 (N multiple of block_n)
    scale: jax.Array,  # [N] f32 per-vector scales
    mask: jax.Array,  # [N] bool eligibility (alive ∧ filter ∧ not pad)
    *,
    block_n: int = BLOCK_N,
    slots: int = SLOTS,
    block_b: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused scan -> ([B, S] slot scores, [B, S] slot ids). Rank-preserving
    per query up to slot collisions; feed `slots >> k` into an exact top-k.

    Large batches tile over a query-block grid dimension (BLOCK_B rows per
    step) so the [Bb, Nb] score tile stays inside the ~16 MB VMEM.
    """
    n, d = codes.shape
    b = q_codes.shape[0]
    if block_b is None:
        # largest divisor of b not exceeding BLOCK_B: the bucket ladder
        # produces 1.5*2^k batches (e.g. 192), which BLOCK_B=128 does not
        # divide — 96 does
        block_b = min(b, BLOCK_B)
        while b % block_b:
            block_b -= 1
    assert n % block_n == 0, (n, block_n)
    assert b % block_b == 0, (b, block_b)
    assert block_n % slots == 0 and block_n >= slots, (block_n, slots)
    grid = (b // block_b, n // block_n)

    scale2 = scale.reshape(1, n)
    mask2 = mask.astype(jnp.int8).reshape(1, n)

    kernel = partial(_scan_kernel, block_n=block_n, slots=slots)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda qi, ni: (qi, 0)),
            pl.BlockSpec((block_n, d), lambda qi, ni: (ni, 0)),
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni)),
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, slots), lambda qi, ni: (qi, 0)),
            pl.BlockSpec((block_b, slots), lambda qi, ni: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, slots), jnp.float32),
            jax.ShapeDtypeStruct((b, slots), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, slots), jnp.float32),
            pltpu.VMEM((block_b, slots), jnp.int32),
        ],
        interpret=interpret,
    )(q_codes, codes, scale2, mask2)
    return out_s, out_i


def eligible(n: int, d: int, multi: bool, block_n: int | None = None) -> bool:
    """Shapes the fused kernel accepts (fallback: XLA path). BLOCK_N is read
    at call time so tests can shrink the blocks."""
    block_n = block_n or BLOCK_N
    return (not multi) and n >= 2 * block_n and n % block_n == 0 and d % 128 == 0


# --------------------------------------------------------------------------
# Resident-accumulator int8 scan: codes streamed exactly ONCE for the whole
# query batch
# --------------------------------------------------------------------------
#
# The first int8 kernel above tiles queries on the OUTER grid axis, so every
# query block re-streams the full code matrix from HBM: at 1M x 768 batch
# 1024 (block_b 128) that is 8 full 0.8 GB passes — measured 14.0 ms/batch
# vs 9.6 for XLA's fused matmul + approx_max_k. This variant flips the grid
# to (n_blocks, q_blocks) with queries INNERMOST and keeps the entire
# [B, S] slot table resident in VMEM as constant-index output blocks:
#
# - the codes block index depends only on the outer n step, so the Pallas
#   pipeline DMAs each block once and reuses it across the q steps under it
#   (codes cross HBM exactly once per call);
# - the slot accumulators are the OUTPUTS with index_map (0, 0): Pallas
#   keeps a constant-index output block in VMEM for the whole grid and
#   copies it to HBM once at the end — no scratch, no per-step writeback;
# - each (ni, qi) step merges its [Bb, Nb] score tile into rows
#   [qi*Bb, (qi+1)*Bb) of the table via a dynamic sublane slice.
#
# VMEM budget at Bb=512, Nb=2048, S=512, D=768, B<=1024: outputs 4 MB
# (f32 + i32 table) + double-buffered codes 3 MB + tiles ~8 MB ~= 15 MB.
# The B axis is capped at RESIDENT_MAX_B so the table always fits.
#
# Measured (tunneled TPU, 1M x 768 batch 1024, device-chained): 9.64
# ms/batch at (Nb=2048, S=512, Bb=512) — exact PARITY with the XLA
# matmul + approx_max_k path (9.6), vs 14.0 for the q-outer kernel above.
# Parity is the floor, not a failure to tune: the MXU on this stack runs
# int8 x int8 -> i32 contractions at the same ~230 TOPS as bf16/f32 (no
# int8 double-rate), so the 1.65e12-op estimate pass is compute-bound at
# ~7.2 ms and both implementations sit ~30% above it (epilogue + stream).
# XLA stays the default; this kernel documents the floor and serves chips
# where int8 MXU throughput or HBM score traffic actually bind.

RESIDENT_BLOCK_N = 2048
RESIDENT_BLOCK_B = 512
RESIDENT_SLOTS = 512
RESIDENT_MAX_B = 1024


def _resident_kernel(
    q_ref,  # [Bb, D] int8 (block qi of queries)
    codes_ref,  # [Nb, D] int8 (block ni)
    scale_ref,  # [1, Nb] f32
    bias_ref,  # [1, Nb] f32 (0 eligible / NEG_INF masked)
    out_s_ref,  # [B, S] f32 resident slot scores
    out_i_ref,  # [B, S] i32 resident slot ids
    *,
    block_n: int,
    slots: int,
    block_b: int,
):
    ni = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when((ni == 0) & (qi == 0))
    def _init():
        out_s_ref[:] = jnp.full(out_s_ref.shape, NEG_INF, jnp.float32)
        out_i_ref[:] = jnp.full(out_i_ref.shape, -1, jnp.int32)

    raw = jax.lax.dot_general(
        q_ref[:],
        codes_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Bb, Nb] on the MXU
    # mask folds in as an additive bias so the whole epilogue is one FMA-ish
    # pass (cvt * scale + bias) instead of a separate select
    scores = raw.astype(jnp.float32) * scale_ref[:] + bias_ref[:]

    rows = pl.ds(qi * block_b, block_b)
    acc_s = out_s_ref[rows, :]
    acc_i = out_i_ref[rows, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block_b, slots), 1)
    for t in range(block_n // slots):
        sub = scores[:, t * slots : (t + 1) * slots]
        take = sub > acc_s
        acc_s = jnp.where(take, sub, acc_s)
        acc_i = jnp.where(take, ni * block_n + t * slots + slot_iota, acc_i)
    out_s_ref[rows, :] = acc_s
    out_i_ref[rows, :] = acc_i


@partial(jax.jit, static_argnames=("block_n", "slots", "block_b", "interpret"))
def int8_scan_slots_resident(
    q_codes: jax.Array,  # [B, D] int8 quantized queries (B mult of block_b)
    codes: jax.Array,  # [N, D] int8 (N mult of block_n)
    scale: jax.Array,  # [N] f32 per-vector scales
    mask: jax.Array,  # [N] bool eligibility
    *,
    block_n: int = RESIDENT_BLOCK_N,
    slots: int = RESIDENT_SLOTS,
    block_b: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-pass fused scan -> ([B, S] slot scores, [B, S] slot ids)."""
    n, d = codes.shape
    b = q_codes.shape[0]
    if block_b is None:
        block_b = min(b, RESIDENT_BLOCK_B)
    assert n % block_n == 0, (n, block_n)
    assert b % block_b == 0 and b <= RESIDENT_MAX_B, (b, block_b)
    assert block_n % slots == 0 and block_n >= slots, (block_n, slots)
    grid = (n // block_n, b // block_b)

    scale2 = scale.reshape(1, n)
    bias2 = jnp.where(mask, jnp.float32(0), NEG_INF).reshape(1, n)

    kernel = partial(
        _resident_kernel, block_n=block_n, slots=slots, block_b=block_b
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda ni, qi: (qi, 0)),
            pl.BlockSpec((block_n, d), lambda ni, qi: (ni, 0)),
            pl.BlockSpec((1, block_n), lambda ni, qi: (0, ni)),
            pl.BlockSpec((1, block_n), lambda ni, qi: (0, ni)),
        ],
        out_specs=[
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, slots), jnp.float32),
            jax.ShapeDtypeStruct((b, slots), jnp.int32),
        ],
        interpret=interpret,
    )(q_codes, codes, scale2, bias2)
    return out_s, out_i


def resident_eligible(
    n: int, d: int, b: int, multi: bool, block_n: int | None = None
) -> bool:
    block_n = block_n or RESIDENT_BLOCK_N
    return (
        (not multi)
        and n >= 2 * block_n
        and n % block_n == 0
        and d % 128 == 0
        and b <= RESIDENT_MAX_B
    )


# --------------------------------------------------------------------------
# Top-2-per-slot resident scan: the recall fix approx_max_k cannot express
# --------------------------------------------------------------------------
#
# Both `lax.approx_max_k` and the top-1 slot kernels above lose a true
# top-k item whenever ONE higher-estimate item lands in its slot (bin):
# among the top ~40 estimates feeding a 512-slot table the expected number
# of colliding pairs is ~40^2 / (2*512) ~= 1.6 — the measured 0.970 recall
# saturation (BASELINE.md recall-vs-QPS curve; r2 swept every XLA-level
# knob: recall_target, k, reduction_input_size_override, dual-direction
# amk — none helps at acceptable cost because amk's partial reduction is
# structurally top-1-per-bin). Keeping the TWO best per slot changes the
# failure mode to THREE top items sharing a slot: at S=256 the expected
# triple count among the top 40 is C(40,3)/256^2 ~= 0.15 — ~20x fewer
# losses with the SAME 2*S-wide candidate table. The merge is the classic
# two-register insertion: new best displaces old best into second place.
#
# Measured (tunneled v5e, 1M x 768 clustered corpus, 4x-k rerank budget,
# single dispatch incl. ~25 ms relay): batch 1024 — amk 35.0 ms at
# recall@10 0.9703, top-1 resident S=512 33.2 ms at 0.9938, THIS KERNEL
# (S=256) 34.6 ms at recall@10 1.0000 on the 64-query exact oracle.
# Batch 2048 (block_b 256): 49.4 ms vs the amk curve's 49.8 at the same
# budget — cost parity, perfect recall. This kernel is the DEFAULT int8
# candidate selector on TPU backends (device.py _search_int8 routes here
# when shapes and the rerank budget allow); the XLA amk path remains the
# fallback for odd shapes, k > 128, and CPU runs.

RESIDENT2_SLOTS = 256
RESIDENT2_MAX_B = 2048


def _resident2_kernel(
    q_ref,  # [Bb, D] int8 (block qi of queries)
    codes_ref,  # [Nb, D] int8 (block ni)
    scale_ref,  # [1, Nb] f32
    bias_ref,  # [1, Nb] f32 (0 eligible / NEG_INF masked)
    out_s1_ref,  # [B, S] f32 resident best-per-slot scores
    out_i1_ref,  # [B, S] i32
    out_s2_ref,  # [B, S] f32 resident second-best-per-slot scores
    out_i2_ref,  # [B, S] i32
    *,
    block_n: int,
    slots: int,
    block_b: int,
):
    ni = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when((ni == 0) & (qi == 0))
    def _init():
        out_s1_ref[:] = jnp.full(out_s1_ref.shape, NEG_INF, jnp.float32)
        out_i1_ref[:] = jnp.full(out_i1_ref.shape, -1, jnp.int32)
        out_s2_ref[:] = jnp.full(out_s2_ref.shape, NEG_INF, jnp.float32)
        out_i2_ref[:] = jnp.full(out_i2_ref.shape, -1, jnp.int32)

    raw = jax.lax.dot_general(
        q_ref[:],
        codes_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Bb, Nb] on the MXU
    scores = raw.astype(jnp.float32) * scale_ref[:] + bias_ref[:]

    rows = pl.ds(qi * block_b, block_b)
    s1 = out_s1_ref[rows, :]
    i1 = out_i1_ref[rows, :]
    s2 = out_s2_ref[rows, :]
    i2 = out_i2_ref[rows, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block_b, slots), 1)
    for t in range(block_n // slots):
        sub = scores[:, t * slots : (t + 1) * slots]
        idx = ni * block_n + t * slots + slot_iota
        take1 = sub > s1
        take2 = sub > s2  # only meaningful when not take1 (s1 >= s2)
        s2 = jnp.where(take1, s1, jnp.where(take2, sub, s2))
        i2 = jnp.where(take1, i1, jnp.where(take2, idx, i2))
        s1 = jnp.where(take1, sub, s1)
        i1 = jnp.where(take1, idx, i1)
    out_s1_ref[rows, :] = s1
    out_i1_ref[rows, :] = i1
    out_s2_ref[rows, :] = s2
    out_i2_ref[rows, :] = i2


@partial(jax.jit, static_argnames=("block_n", "slots", "block_b", "interpret"))
def int8_scan_slots_resident2(
    q_codes: jax.Array,  # [B, D] int8 quantized queries (B mult of block_b)
    codes: jax.Array,  # [N, D] int8 (N mult of block_n)
    scale: jax.Array,  # [N] f32 per-vector scales
    mask: jax.Array,  # [N] bool eligibility
    *,
    block_n: int = RESIDENT_BLOCK_N,
    slots: int = RESIDENT2_SLOTS,
    block_b: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-pass fused scan keeping the TOP-2 per slot.

    Returns ([B, 2*S] slot scores, [B, 2*S] slot ids): the best-per-slot
    table concatenated with the second-best-per-slot table. Feed into an
    exact small top-k; a true top-k item is lost only when >= 3 items with
    higher estimates share its slot.
    """
    n, d = codes.shape
    b = q_codes.shape[0]
    if block_b is None:
        block_b = resident2_block_b(b)
    assert n % block_n == 0, (n, block_n)
    assert b % block_b == 0 and b <= RESIDENT2_MAX_B, (b, block_b)
    assert block_n % slots == 0 and block_n >= slots, (block_n, slots)
    grid = (n // block_n, b // block_b)

    scale2 = scale.reshape(1, n)
    bias2 = jnp.where(mask, jnp.float32(0), NEG_INF).reshape(1, n)

    kernel = partial(
        _resident2_kernel, block_n=block_n, slots=slots, block_b=block_b
    )
    table = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda ni, qi: (qi, 0)),
            pl.BlockSpec((block_n, d), lambda ni, qi: (ni, 0)),
            pl.BlockSpec((1, block_n), lambda ni, qi: (0, ni)),
            pl.BlockSpec((1, block_n), lambda ni, qi: (0, ni)),
        ],
        out_specs=[
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
            pl.BlockSpec((b, slots), lambda ni, qi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, slots), jnp.float32),
            jax.ShapeDtypeStruct((b, slots), jnp.int32),
            jax.ShapeDtypeStruct((b, slots), jnp.float32),
            jax.ShapeDtypeStruct((b, slots), jnp.int32),
        ],
        interpret=interpret,
    )(q_codes, codes, scale2, bias2)
    s1, i1, s2, i2 = table
    return jnp.concatenate([s1, s2], axis=-1), jnp.concatenate([i1, i2], axis=-1)


def resident2_block_b(b: int) -> int:
    """Query rows per grid step: the four resident [B, S] tables plus the
    [Bb, Nb] score tile must fit VMEM. At B > 1024 the tables alone take
    8 MB, so the score tile shrinks to Bb=256 (measured at cost parity)."""
    cap = 256 if b > 1024 else RESIDENT_BLOCK_B
    block_b = min(b, cap)
    while b % block_b:
        block_b -= 1
    return block_b


def resident2_eligible(
    n: int, d: int, b: int, multi: bool, block_n: int | None = None
) -> bool:
    block_n = block_n or RESIDENT_BLOCK_N
    return (
        (not multi)
        and n >= 2 * block_n
        and n % block_n == 0
        and d % 128 == 0
        and b <= RESIDENT2_MAX_B
    )


# --------------------------------------------------------------------------
# Fused binary (sign-code) scan: AND + popcount bit-plane dots -> slot top-k
# --------------------------------------------------------------------------
#
# The XLA binary path (ops/quant.py binary_estimate_scores ->
# approx_candidates) materializes [B, N] estimate and bound matrices in HBM:
# at 1M vectors and batch 256 that is ~2 GB of score traffic per call. This
# kernel evaluates the bit-plane popcount dot, the RaBitQ-style optimistic
# bound (estimate + EPSILON * sigma) and the slot accumulation per code
# block entirely in VMEM — only the [B, S] slot table reaches HBM.
#
# Measured (tunneled v5e, 1M x 768): batch 32 XLA 29.4 vs fused 31.6 ms/call;
# batch 256 XLA 47.4 vs fused 66.3 (the VMEM budget forces block 1024 and
# grid overhead dominates). The popcount loop is VPU-bound and XLA's codegen
# for it is already tight, so — like the int8 kernel — this stays opt-in
# ("pallas" flag, batch <= 64) for chips/shapes where HBM score traffic,
# not the VPU, is the binding constraint.
# Parity: nidx_vector/src/vector_types/rabitq.rs QueryVector::dot (AND +
# popcount per plane) and similarity + error bound.

BINARY_BLOCK_N = 8192  # lanes per grid step ([W, 8192] u32 at D=768 = 768 KB)


def binary_block_for(n: int, b: int, slots: int | None = None) -> int:
    """Largest block that divides n and keeps the kernel's [B, Nb] i32
    temporaries inside scoped VMEM (~16 MB): cap B*Nb at 32*8192 elements
    (measured: B=256 x Nb=8192 demands 36 MB and fails to compile)."""
    slots = slots or SLOTS
    block = BINARY_BLOCK_N
    budget = 32 * 8192
    while block > slots and (b * block > budget or n % block != 0):
        block //= 2
    return block


def _binary_scan_kernel(
    planes_ref,  # [B, P*W] uint32 query bit-planes (same block every step)
    qp_ref,  # [B, 4] f32: qmin, qstep, qsum, qnorm
    codes_ref,  # [W, Nb] uint32 block (transposed codes)
    scale_ref,  # [1, Nb] f32
    popcnt_ref,  # [1, Nb] f32
    resid_ref,  # [1, Nb] f32
    mask_ref,  # [1, Nb] i8
    out_s_ref,  # [B, S] f32
    out_i_ref,  # [B, S] i32
    acc_s,  # VMEM scratch [B, S] f32
    acc_i,  # VMEM scratch [B, S] i32
    *,
    block_n: int,
    slots: int,
    n_planes: int,
    n_words: int,
    dim: float,
    epsilon: float,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_s[:] = jnp.full(acc_s.shape, NEG_INF, jnp.float32)
        acc_i[:] = jnp.full(acc_i.shape, -1, jnp.int32)

    b = planes_ref.shape[0]

    # bit-plane dot: sum_p 2^p * popcount(code & plane_p). Static (p, w)
    # loops; each step is a [1, Nb] x [B, 1] broadcast AND on the VPU.
    bd = jnp.zeros((b, block_n), jnp.int32)
    for p in range(n_planes):
        for w in range(n_words):
            plane_pw = planes_ref[:, p * n_words + w : p * n_words + w + 1]  # [B, 1]
            anded = jnp.bitwise_and(codes_ref[w : w + 1, :], plane_pw)  # [B, Nb]
            bd = bd + (jax.lax.population_count(anded).astype(jnp.int32) << p)

    qmin = qp_ref[:, 0:1]  # [B, 1]
    qstep = qp_ref[:, 1:2]
    qsum = qp_ref[:, 2:3]
    qnorm = qp_ref[:, 3:4]
    # estimate + 1.9-sigma optimistic bound (ops/quant.py
    # binary_estimate_scores semantics, folded into the block pass)
    dot_b_q = qmin * popcnt_ref[:] + qstep * bd.astype(jnp.float32)
    est = scale_ref[:] * (2.0 * dot_b_q - qsum)
    var_resid = (resid_ref[:] * qnorm) ** 2 / dim
    var_quant = (2.0 * scale_ref[:]) ** 2 * dim * (qstep**2) / 12.0
    optimistic = est + epsilon * jnp.sqrt(var_resid + var_quant)
    scores = jnp.where(mask_ref[:] != 0, optimistic, NEG_INF)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (b, slots), 1)
    for t in range(block_n // slots):
        sub = scores[:, t * slots : (t + 1) * slots]
        take = sub > acc_s[:]
        acc_s[:] = jnp.where(take, sub, acc_s[:])
        acc_i[:] = jnp.where(take, step * block_n + t * slots + slot_iota, acc_i[:])

    @pl.when(step == pl.num_programs(0) - 1)
    def _flush():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@partial(jax.jit, static_argnames=("dim", "block_n", "slots", "interpret"))
def binary_scan_slots(
    planes: jax.Array,  # [B, P, W] uint32 query bit-planes
    qmin: jax.Array,  # [B] f32
    qstep: jax.Array,  # [B] f32
    qsum: jax.Array,  # [B] f32
    qnorm: jax.Array,  # [B] f32
    codes_t: jax.Array,  # [W, N] uint32 (transposed sign codes)
    scale: jax.Array,  # [N] f32
    popcnt: jax.Array,  # [N] f32
    resid: jax.Array,  # [N] f32
    mask: jax.Array,  # [N] bool
    *,
    dim: int,
    block_n: int = BINARY_BLOCK_N,
    slots: int = SLOTS,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused binary scan -> ([B, S] optimistic slot scores, [B, S] ids)."""
    w_words, n = codes_t.shape
    b, n_planes, _ = planes.shape
    assert n % block_n == 0, (n, block_n)
    assert block_n % slots == 0 and block_n >= slots, (block_n, slots)
    grid = n // block_n

    planes2 = planes.reshape(b, n_planes * w_words)
    qparams = jnp.stack(
        [
            qmin.astype(jnp.float32),
            qstep.astype(jnp.float32),
            qsum.astype(jnp.float32),
            qnorm.astype(jnp.float32),
        ],
        axis=1,
    )  # [B, 4]

    kernel = partial(
        _binary_scan_kernel,
        block_n=block_n,
        slots=slots,
        n_planes=n_planes,
        n_words=w_words,
        dim=float(dim),
        epsilon=float(EPSILON),
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((b, n_planes * w_words), lambda i: (0, 0)),
            pl.BlockSpec((b, 4), lambda i: (0, 0)),
            pl.BlockSpec((w_words, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((b, slots), lambda i: (0, 0)),
            pl.BlockSpec((b, slots), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, slots), jnp.float32),
            jax.ShapeDtypeStruct((b, slots), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, slots), jnp.float32),
            pltpu.VMEM((b, slots), jnp.int32),
        ],
        interpret=interpret,
    )(
        planes2,
        qparams,
        codes_t,
        scale.reshape(1, n),
        popcnt.reshape(1, n),
        resid.reshape(1, n),
        mask.astype(jnp.int8).reshape(1, n),
    )
    return out_s, out_i


def binary_eligible(n: int, d: int, multi: bool, block_n: int | None = None) -> bool:
    block_n = block_n or BINARY_BLOCK_N
    return (not multi) and n >= 2 * block_n and n % block_n == 0 and d % 128 == 0
