"""Tracing: OpenTelemetry spans over the ingest and search paths.

Parity: nucliadb_telemetry's OTel wrappers and nidx's #[instrument] spans +
NATS/gRPC context propagation (nidx/src/telemetry.rs:30-140). The tracer is
a no-op unless an exporter is configured (OTLP endpoint via
NDBTPU_TELEMETRY__OTLP or console via NDBTPU_TELEMETRY__CONSOLE_TRACES);
context propagates through bus messages via a ``traceparent`` header field
helper (the NATS-headers analogue).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional

try:
    from opentelemetry import trace
    from opentelemetry.sdk.resources import Resource
    from opentelemetry.sdk.trace import TracerProvider
    from opentelemetry.sdk.trace.export import (
        BatchSpanProcessor,
        ConsoleSpanExporter,
    )

    _OTEL = True
except ImportError:  # pragma: no cover - otel is in the image
    _OTEL = False

_tracer = None


def setup_tracing(service_name: str = "nucliadb_tpu") -> None:
    global _tracer
    if not _OTEL:
        return
    provider = TracerProvider(
        resource=Resource.create({"service.name": service_name})
    )
    if os.environ.get("NDBTPU_TELEMETRY__CONSOLE_TRACES"):
        provider.add_span_processor(BatchSpanProcessor(ConsoleSpanExporter()))
    endpoint = os.environ.get("NDBTPU_TELEMETRY__OTLP")
    if endpoint:
        try:
            from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
                OTLPSpanExporter,
            )

            provider.add_span_processor(
                BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint))
            )
        except ImportError:
            pass
    trace.set_tracer_provider(provider)
    _tracer = trace.get_tracer(service_name)


@contextmanager
def span(name: str, **attributes):
    """Span context manager; no-op when tracing is not set up."""
    if _tracer is None:
        yield None
        return
    with _tracer.start_as_current_span(name) as s:
        for key, value in attributes.items():
            s.set_attribute(key, value)
        yield s


def inject_context(headers: dict) -> dict:
    """Serialize current trace context into message headers
    (the NATS-header propagation analogue)."""
    if not _OTEL or _tracer is None:
        return headers
    from opentelemetry.propagate import inject

    inject(headers)
    return headers


def extract_context(headers: dict):
    if not _OTEL:
        return None
    from opentelemetry.propagate import extract

    return extract(headers)
