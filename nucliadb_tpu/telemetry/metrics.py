"""Prometheus metrics + the Observer timing decorator.

Parity: nucliadb_telemetry/src/nucliadb_telemetry/metrics.py (Observer,
Counter, Gauge, Histogram wrappers) and the nidx per-component metric
families (nidx/src/metrics.rs — indexing counters/time per index kind,
merge counters, sync delay).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from functools import wraps
from typing import Optional

import prometheus_client
from prometheus_client import CollectorRegistry, generate_latest

REGISTRY = CollectorRegistry()


def Counter(name: str, documentation: str = "", labelnames: tuple = ()):
    return prometheus_client.Counter(
        name, documentation or name, labelnames=labelnames, registry=REGISTRY
    )


def Gauge(name: str, documentation: str = "", labelnames: tuple = ()):
    return prometheus_client.Gauge(
        name, documentation or name, labelnames=labelnames, registry=REGISTRY
    )


def Histogram(name: str, documentation: str = "", labelnames: tuple = (), buckets=None):
    kwargs = {"registry": REGISTRY, "labelnames": labelnames}
    if buckets is not None:
        kwargs["buckets"] = buckets
    return prometheus_client.Histogram(name, documentation or name, **kwargs)


class Observer:
    """Timed+counted operation metric (decorator or context manager).

    Usage parity with nucliadb_telemetry.metrics.Observer:

        obs = Observer("indexer", labels={"kind": ""})
        with obs({"kind": "vector"}): ...
        @obs.wrap({"kind": "text"})
        def fn(): ...
    """

    def __init__(self, name: str, labels: Optional[dict[str, str]] = None):
        labelnames = tuple(labels) if labels else ()
        self.histogram = Histogram(f"{name}_duration_seconds", labelnames=labelnames)
        self.counter = Counter(
            f"{name}_total", labelnames=labelnames + ("status",)
        )

    @contextmanager
    def __call__(self, labels: Optional[dict[str, str]] = None):
        labels = labels or {}
        start = time.monotonic()
        status = "ok"
        try:
            yield
        except Exception:
            status = "error"
            raise
        finally:
            elapsed = time.monotonic() - start
            if labels:
                self.histogram.labels(**labels).observe(elapsed)
                self.counter.labels(**labels, status=status).inc()
            else:
                self.histogram.observe(elapsed)
                self.counter.labels(status=status).inc()

    def wrap(self, labels: Optional[dict[str, str]] = None):
        def decorator(fn):
            @wraps(fn)
            def inner(*args, **kwargs):
                with self(labels):
                    return fn(*args, **kwargs)

            return inner

        return decorator


def render_prometheus() -> bytes:
    return generate_latest(REGISTRY)


# core metric families (parity: nidx/src/metrics.rs)
indexing_observer = Observer("ndbtpu_indexing", labels={"kind": ""})
merge_observer = Observer("ndbtpu_merge", labels={"kind": ""})
search_observer = Observer("ndbtpu_search", labels={"endpoint": ""})
sync_delay_gauge = Gauge("ndbtpu_sync_delay_seconds")
