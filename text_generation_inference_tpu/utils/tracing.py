"""OpenTelemetry instrumentation (API-level).

Counterpart of the reference's tracing layer (reference:
router/src/tracing.rs:29-44 W3C context extraction from gRPC metadata,
router/src/grpc_server.rs #[instrument] spans with recorded timing fields).
Only the OTel *API* is required at runtime — spans are no-ops unless the
deployment configures an SDK + OTLP exporter (the reference likewise gates
export behind --otlp-endpoint).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

try:
    from opentelemetry import trace
    from opentelemetry.propagate import extract

    _tracer = trace.get_tracer("text-generation-inference-tpu")
    _AVAILABLE = True
except Exception:  # pragma: no cover - otel API absent
    _tracer = None
    _AVAILABLE = False


def context_from_grpc_metadata(invocation_metadata) -> Optional[object]:
    """Extract a W3C trace context (traceparent/tracestate) from gRPC
    metadata (reference: tracing.rs ExtractTelemetryContext)."""
    if not _AVAILABLE:
        return None
    carrier = {md.key: md.value for md in (invocation_metadata or [])}
    try:
        return extract(carrier)
    except Exception:
        return None


@contextlib.contextmanager
def span(name: str, context=None, **attributes) -> Iterator[object]:
    """Start a span (no-op without a configured SDK)."""
    if not _AVAILABLE:
        yield None
        return
    with _tracer.start_as_current_span(name, context=context) as s:
        for k, v in attributes.items():
            try:
                s.set_attribute(k, v)
            except Exception:
                pass
        yield s


def record(s, **attributes) -> None:
    """Record timing/size fields on an open span (mirrors the recorded
    fields of the reference's request spans, grpc_server.rs:98-113)."""
    if s is None:
        return
    for k, v in attributes.items():
        try:
            s.set_attribute(k, v)
        except Exception:
            pass
