"""Kernel pre-compilation (boot-time warmup).

The first query against a fresh compilation cache pays the XLA compiles of
the search programs (2-25 s through a remote compile service). Shapes are
bucketed to a small ladder, so compiling the smallest bucket of each hot
kernel at boot removes the first-request cliff for small KBs and overlaps
the big-bucket compiles with early traffic. All arrays are tiny and passed
as arguments (never closures — constants ship to the compile service).
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger(__name__)


def warmup_kernels(dims: tuple[int, ...] = (), batch: int = 1) -> float:
    """Compile the exact-scan and BM25 programs at the smallest bucket
    sizes. Returns seconds spent. Extra vector dims can be passed for the
    KB's configured vectorsets."""
    t0 = time.monotonic()
    import jax.numpy as jnp
    import numpy as np

    from ..index.vector.device import _search_exact, bucket
    from ..index.text_engine.engine import TIER_QUERY_CAP, DENSE_QUERY_CAP, _bm25_search
    from ..utils.platform import configure_jax

    configure_jax()

    # vector exact scan at the minimum arena bucket
    for dim in dict.fromkeys((128,) + tuple(dims)):
        n_pad = bucket(1)
        vecs = jnp.zeros((n_pad, dim), jnp.float32)
        q = jnp.zeros((batch, dim), jnp.float32)
        mask = jnp.zeros((n_pad,), bool)
        _search_exact(vecs, q, mask, jnp.float32(-3.0e38), 10, "dot")

    # BM25 at the shapes a fresh small KB actually builds: tier 0 at its
    # minimum row bucket, higher tiers empty -> [1,1] placeholders
    from ..index.text_engine.engine import TIER_WIDTHS, _bucket

    n_pad = _bucket(1)
    w0 = TIER_WIDTHS[0]
    tiers = (
        (
            jnp.full((max(1, 4096 // w0), w0), -1, jnp.int32),
            jnp.zeros((max(1, 4096 // w0), w0), jnp.float32),
            jnp.ones((max(1, 4096 // w0), w0), jnp.float32),
        ),
    ) + tuple(
        (
            jnp.full((1, 1), -1, jnp.int32),
            jnp.zeros((1, 1), jnp.float32),
            jnp.ones((1, 1), jnp.float32),
        )
        for _ in TIER_WIDTHS[1:]
    )
    dense = jnp.zeros((1, n_pad), jnp.uint8)
    dlen = jnp.ones((n_pad,), jnp.float32)
    mask = jnp.zeros((n_pad,), bool)
    caps = TIER_QUERY_CAP + (DENSE_QUERY_CAP, 0)
    rows = jnp.full((sum(caps),), -1, jnp.int32)
    idfs = jnp.zeros((sum(caps),), jnp.float32)
    params = jnp.asarray(np.array([1.0, 1.0, -3.0e38], np.float32))
    # warm both count variants: OR queries run the counts-free fast path
    _bm25_search(tiers, dense, None, dlen, mask, rows, idfs, params, 10, caps, 0, False)
    _bm25_search(tiers, dense, None, dlen, mask, rows, idfs, params, 10, caps, 0, True)

    dt = time.monotonic() - t0
    logger.info("kernel warmup done in %.1fs", dt)
    return dt
