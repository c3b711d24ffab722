"""Quantized vector scans: 1-bit sign codes (popcount dot) and int8 MXU codes.

TPU-native redesign of the reference's RaBitQ path
(nidx_vector/src/vector_types/rabitq.rs:26-244). The reference stores a 1-bit
binary code per vector and evaluates query dots with SIMD AND+popcount over
4 query bit-planes, then reranks the top candidates with exact f32 scores.
We keep that *shape* — 32x compression with bounded-error estimates — but
re-derive the estimator and map it onto TPU primitives:

- packed codes are stored **transposed** as ``uint32 [D/32, N]`` so the huge
  N dimension is the VPU lane dimension (storing them [N, D/32] wastes >90%
  of the lanes for typical dims); the dot against a 4-bit-quantized query is
  a static unrolled loop over (plane, word) of scalar-broadcast
  AND + ``lax.population_count`` over [N]-wide vectors,
- the error bound comes from the rank-1 sign decomposition
  ``v = s * sign(v) + r`` with ``s = mean(|v|)`` (the L2-optimal scale), so
  ``dot(v, q) = s * dot(sign(v), q) + dot(r, q)`` and
  ``|dot(r, q)| <~ eps * ||r|| * ||q|| / sqrt(D)`` for incoherent r (the same
  statistical argument as RaBitQ's bound; eps matches the reference's
  EPSILON = 1.9, rabitq.rs:30-36),
- rerank candidates are selected by optimistic score (estimate + bound, like
  ``rerank_top``) with the reference's budget (100 x top_k capped at 2000),
  using the TPU-native ``lax.approx_max_k`` instead of a full sort.

We additionally provide int8 symmetric quantization whose scan is a pure
int8 MXU matmul: 4x compression, ~0.99 recall *before* rerank, and the
systolic array does the work instead of the VPU. It is the default codec;
binary codes are for memory-tight large segments. The reference has no int8
analogue — it exists because the hardware rewards it.

Everything here is designed to live inside ONE jitted program per query
batch (scan -> candidates -> exact rerank): the deployment platform tunnels
to the TPU, so each un-fused dispatch costs ~1ms of round-trip latency.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .topk import NEG_INF

EPSILON = 1.9  # error-bound multiplier (parity: rabitq.rs:30)
BINARY_RERANK_FACTOR = 100  # candidates = factor * top_k (parity: rabitq.rs:33)
INT8_RERANK_FACTOR = 4  # int8 estimates are ~1% accurate; small budget suffices
RERANKING_LIMIT = 2000  # hard cap (parity: rabitq.rs:36)
QUERY_BITS = 4  # query quantization bits (parity: rabitq.rs bit planes)


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack a [..., D] {0,1} array into [..., D/32] uint32 (little-endian bits)."""
    *lead, d = bits.shape
    assert d % 32 == 0, f"dim {d} must be a multiple of 32 for binary codes"
    w = d // 32
    b = bits.astype(jnp.uint32).reshape(*lead, w, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (b << shifts).sum(axis=-1, dtype=jnp.uint32)


def approx_candidates(
    scores: jax.Array,
    c: int,
    *,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Select ~top-c candidate ids with the TPU-native approximate top-k.

    ``lax.approx_max_k`` uses the TPU's partial-reduction TopK lowering
    (recall target 0.95 of the true top-c); since these are *rerank
    candidates* feeding an exact rescoring pass, approximate selection does
    not change final quality in any measurable way.
    """
    s = scores.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    c_eff = min(c, s.shape[-1])
    top_s, top_i = jax.lax.approx_max_k(s, c_eff, recall_target=0.95)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i


# --------------------------------------------------------------------------
# Binary (1-bit sign) codes
# --------------------------------------------------------------------------


@dataclass
class BinaryCodes:
    """Per-segment binary codes + per-vector decomposition scalars.

    codes_t: [D/32, N] uint32 — packed sign bits, TRANSPOSED (N on lanes).
    scale:   [N] f32 — s = mean(|v|), the L2-optimal rank-1 sign scale.
    resid:   [N] f32 — ||v - s*sign(v)||.
    popcnt:  [N] f32 — number of 1-bits (positive dims) per code.
    dim:     D.
    """

    codes_t: jax.Array
    scale: jax.Array
    resid: jax.Array
    popcnt: jax.Array
    dim: int

    @property
    def n_vectors(self) -> int:
        return self.codes_t.shape[1]

    @staticmethod
    @partial(jax.jit, static_argnames=())
    def encode(vectors: jax.Array) -> "BinaryCodes":
        v = vectors.astype(jnp.float32)
        n, d = v.shape
        bits = (v > 0).astype(jnp.uint32)
        codes = pack_bits(bits)  # [N, W]
        s = jnp.mean(jnp.abs(v), axis=-1)
        sq = jnp.sum(v * v, axis=-1)
        resid = jnp.sqrt(jnp.maximum(sq - s * s * d, 0.0))
        popcnt = bits.sum(axis=-1).astype(jnp.float32)
        return BinaryCodes(
            codes_t=codes.T, scale=s, resid=resid, popcnt=popcnt, dim=d
        )

    def tree_flatten(self):
        return (self.codes_t, self.scale, self.resid, self.popcnt), (self.dim,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes_t, scale, resid, popcnt = children
        return cls(codes_t=codes_t, scale=scale, resid=resid, popcnt=popcnt, dim=aux[0])


jax.tree_util.register_pytree_node(
    BinaryCodes, BinaryCodes.tree_flatten, BinaryCodes.tree_unflatten
)


def quantize_query_planes(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Quantize queries to QUERY_BITS bit-planes.

    Returns (planes [B, P, D/32] uint32, qmin [B], qstep [B], qsum [B]).
    q_d ~= qmin + qstep * Q_d with Q_d in [0, 2^P - 1].
    """
    q = q.astype(jnp.float32)
    levels = (1 << QUERY_BITS) - 1
    qmin = q.min(axis=-1)
    qmax = q.max(axis=-1)
    qstep = jnp.maximum((qmax - qmin) / levels, 1e-12)
    ql = jnp.clip(
        jnp.round((q - qmin[:, None]) / qstep[:, None]).astype(jnp.int32), 0, levels
    ).astype(jnp.uint32)
    planes = []
    for p in range(QUERY_BITS):
        planes.append(pack_bits((ql >> p) & 1))
    planes_arr = jnp.stack(planes, axis=1)  # [B, P, W]
    qsum = q.sum(axis=-1)
    return planes_arr, qmin, qstep, qsum


def _bit_dot_batch(codes_t: jax.Array, planes: jax.Array) -> jax.Array:
    """sum_p 2^p * popcount(codes & plane_p) for a batch of queries.

    codes_t: [W, N] uint32 (transposed); planes: [B, P, W] uint32 -> [B, N] f32.
    The (p, w) loops are static (W = D/32 <= ~48, P = 4); each step is a
    [B, 1] x [1, N] broadcast AND + popcount — fully lane-parallel on the VPU
    and fused by XLA into a single loop nest over N.
    """
    b = planes.shape[0]
    n = codes_t.shape[1]
    p_planes = planes.shape[1]
    w_words = planes.shape[2]
    acc = jnp.zeros((b, n), dtype=jnp.int32)
    for p in range(p_planes):
        for w in range(w_words):
            pw = planes[:, p, w][:, None]  # [B, 1]
            anded = jnp.bitwise_and(codes_t[w][None, :], pw)
            acc = acc + (jax.lax.population_count(anded).astype(jnp.int32) << p)
    return acc.astype(jnp.float32)


def binary_estimate_scores(
    bc: BinaryCodes,
    queries: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Estimate dot(v, q) for all (query, vector) pairs from binary codes.

    Returns (estimates [B, N], bounds [B, N]) where the true dot lies within
    estimate +- bound with ~94% probability (a 1.9-sigma bound, matching the
    reference's EPSILON discipline).
    """
    queries = queries.astype(jnp.float32)
    planes, qmin, qstep, qsum = quantize_query_planes(queries)
    qnorm = jnp.linalg.norm(queries, axis=-1)

    bd = _bit_dot_batch(bc.codes_t, planes)  # [B, N]
    dot_b_q = qmin[:, None] * bc.popcnt[None, :] + qstep[:, None] * bd
    est = bc.scale[None, :] * (2.0 * dot_b_q - qsum[:, None])

    # Two independent error sources, combined in quadrature:
    # (1) the sign-decomposition residual r: dot(r, q) has std ~ ||r||*||q||/sqrt(D)
    #     for incoherent r (RaBitQ's statistical argument),
    # (2) the 4-bit query quantization: per-dim error var qstep^2/12, so
    #     dot(2*s*bits, err) has std ~ 2*s*sqrt(D)*qstep/sqrt(12).
    dim = float(bc.dim)  # python float: never create eager device scalars in traced code
    var_resid = (bc.resid[None, :] * qnorm[:, None]) ** 2 / dim
    var_quant = (2.0 * bc.scale[None, :]) ** 2 * dim * (qstep[:, None] ** 2) / 12.0
    bound = EPSILON * jnp.sqrt(var_resid + var_quant)
    return est, bound


def binary_rerank_budget(k: int) -> int:
    return min(BINARY_RERANK_FACTOR * k, RERANKING_LIMIT)


@partial(jax.jit, static_argnames=("k",))
def binary_scan_candidates(
    bc: BinaryCodes,
    queries: jax.Array,
    k: int,
    *,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Select rerank candidates by optimistic score (estimate + bound).

    Returns ([B, C] candidate estimates, [B, C] candidate ids), C = rerank
    budget for k. Exact rerank happens in ``distance.exact_rerank``.
    """
    est, bound = binary_estimate_scores(bc, queries)
    return approx_candidates(est + bound, binary_rerank_budget(k), mask=mask)


# --------------------------------------------------------------------------
# Int8 symmetric codes
# --------------------------------------------------------------------------


@dataclass
class Int8Codes:
    """Symmetric int8 quantization; scan = int8 x int8 MXU matmul.

    codes: [N, D] int8; scale: [N] f32 (per-vector).
    """

    codes: jax.Array
    scale: jax.Array

    @property
    def n_vectors(self) -> int:
        return self.codes.shape[0]

    @property
    def dim(self) -> int:
        return self.codes.shape[1]

    @staticmethod
    @jax.jit
    def encode(vectors: jax.Array) -> "Int8Codes":
        v = vectors.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(v), axis=-1), 1e-12) / 127.0
        codes = jnp.clip(jnp.round(v / s[:, None]), -127, 127).astype(jnp.int8)
        return Int8Codes(codes=codes, scale=s)

    def tree_flatten(self):
        return (self.codes, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(Int8Codes, Int8Codes.tree_flatten, Int8Codes.tree_unflatten)


def int8_estimate_scores(ic: Int8Codes, queries: jax.Array) -> jax.Array:
    """[B, N] approximate dots via an int8 MXU contraction."""
    q = queries.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-12) / 127.0
    qc = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)
    raw = jax.lax.dot_general(
        qc,
        ic.codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return raw * qs[:, None] * ic.scale[None, :]


def int8_rerank_budget(k: int) -> int:
    return min(INT8_RERANK_FACTOR * k, RERANKING_LIMIT)


@partial(jax.jit, static_argnames=("k",))
def int8_scan_candidates(
    ic: Int8Codes,
    queries: jax.Array,
    k: int,
    *,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    est = int8_estimate_scores(ic, queries)
    return approx_candidates(est, int8_rerank_budget(k), mask=mask)
