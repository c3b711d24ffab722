"""JAX platform configuration for the index compute path.

Centralizes runtime knobs that matter on the deployment platform:

- persistent compilation cache: fused search kernels can take tens of
  seconds to compile (measured up to ~60s through the remote-compile
  service); the on-disk cache makes every process after the first start
  warm. Off by default only if the user sets NUCLIADB_TPU_NO_COMPILE_CACHE.
- cached device scalars (NEG_INF floor) so the hot search path does not
  create a fresh device scalar per request (each eager transfer costs a
  tunnel round trip).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_configured = False
_lock = __import__("threading").Lock()


def configure_jax(*, init_backend: bool = False) -> None:
    """Idempotent platform setup. ``init_backend=True`` additionally forces
    backend initialization NOW, on this thread, under the lock. Servers
    call this once at boot so a missing/misconfigured device platform
    fails LOUDLY at startup instead of turning every search request into a
    500 (jax caches backend-init failures for the process lifetime; the
    soak test hit this when its environment dropped the PJRT plugin from
    PYTHONPATH), and so the first device touch is single-threaded rather
    than racing across request threads."""
    global _configured
    with _lock:
        if not _configured:
            _configured = True
            # reliable platform override: the deployment image's
            # sitecustomize preloads jax pointed at the TPU, so the
            # JAX_PLATFORMS env var set by a parent process is ignored;
            # jax.config.update works until the backend initializes
            # (spawned worker/test processes use this)
            platform = os.environ.get("NDBTPU_JAX_PLATFORM")
            if platform:
                try:
                    jax.config.update("jax_platforms", platform)
                except Exception:
                    pass
            if not os.environ.get("NUCLIADB_TPU_NO_COMPILE_CACHE"):
                cache_dir = os.environ.get(
                    "NUCLIADB_TPU_COMPILE_CACHE",
                    os.path.expanduser("~/.cache/nucliadb_tpu_jax"),
                )
                try:
                    if jax.config.jax_compilation_cache_dir is None:
                        jax.config.update("jax_compilation_cache_dir", cache_dir)
                        jax.config.update(
                            "jax_persistent_cache_min_compile_time_secs", 1.0
                        )
                except Exception:
                    pass  # cache is an optimization; never fail startup over it
        if init_backend:
            jax.devices()  # deterministic, single-threaded backend init


_scalar_cache: dict[float, jax.Array] = {}


def device_scalar_f32(value: float) -> jax.Array:
    """A cached device f32 scalar (avoids per-request transfers)."""
    out = _scalar_cache.get(value)
    if out is None:
        out = jnp.float32(value)
        _scalar_cache[value] = out
    return out


_async_copy_rejected = False


def device_fetch(*arrays):
    """Download several device arrays with ONE blocking wait.

    ``np.asarray(x)`` per array blocks serially — through the TPU relay
    every blocked fetch is its own ~25 ms round trip, so a kernel that
    returns three buffers pays three round trips. Issuing
    ``copy_to_host_async`` on EVERY buffer first lets the relay overlap
    the transfers; the wall cost becomes ~one round trip for the whole
    set. Non-device values (numpy arrays, scalars) pass through.
    """
    import numpy as _np

    global _async_copy_rejected
    for a in arrays:
        ch = getattr(a, "copy_to_host_async", None)
        if ch is not None:
            try:
                ch()
            except Exception as exc:
                # fully-replicated/committed arrays can reject the async
                # copy; every call then degrades to serial fetches, so make
                # the first rejection observable instead of silently slow
                if not _async_copy_rejected:
                    _async_copy_rejected = True
                    import logging

                    logging.getLogger(__name__).debug(
                        "copy_to_host_async rejected (%s: %s); "
                        "falling back to serial device fetches",
                        type(exc).__name__, exc,
                    )
    return tuple(_np.asarray(a) for a in arrays)
