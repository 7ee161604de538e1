"""OTLP trace export + active health probe.

Reference: router/src/main.rs:215-264 (OTLP exporter gated on
--otlp-endpoint), router/src/tracing.rs:29-44 (W3C context extraction),
router/src/health.rs:53-82 (dummy-prefill health fallback).
"""

import asyncio
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from text_generation_inference_tpu.utils import tracing


class _Collector:
    """Local OTLP/HTTP collector stub capturing POSTed trace payloads."""

    def __init__(self):
        self.payloads = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                outer.payloads.append(
                    (self.path, json.loads(self.rfile.read(n))))
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_port
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.thread.join(timeout=2)

    @property
    def spans(self):
        out = []
        for _path, p in self.payloads:
            for rs in p.get("resourceSpans", []):
                for ss in rs.get("scopeSpans", []):
                    out.extend(ss.get("spans", []))
        return out


@pytest.fixture
def collector():
    c = _Collector()
    yield c
    tracing.shutdown()
    c.stop()


class TestTraceparent:
    def test_parse_valid(self):
        ctx = tracing.parse_traceparent(
            "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01")
        assert ctx is not None
        assert ctx.trace_id == 0x0AF7651916CD43DD8448EB211C80319C
        assert ctx.span_id == 0xB7AD6B7169203331
        assert ctx.sampled

    def test_parse_invalid(self):
        assert tracing.parse_traceparent("garbage") is None
        assert tracing.parse_traceparent(
            "00-" + "0" * 32 + "-" + "1" * 16 + "-01") is None  # zero trace

    def test_grpc_metadata_extraction(self):
        class MD:
            def __init__(self, k, v):
                self.key, self.value = k, v

        ctx = tracing.context_from_grpc_metadata([
            MD("other", "x"),
            MD("traceparent",
               "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01")])
        assert ctx is not None and ctx.span_id == 0xB7AD6B7169203331


class TestOtlpExport:
    def test_noop_without_configure(self):
        tracing.shutdown()
        with tracing.span("x", a=1) as s:
            assert s is None
        assert not tracing.enabled()

    def test_span_exported_with_parent_link(self, collector):
        assert tracing.configure(f"http://127.0.0.1:{collector.port}")
        parent = tracing.parse_traceparent(
            "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01")
        with tracing.span("fmaas.Generate", context=parent,
                          batch_size=3) as s:
            tracing.record(s, total_time_s=0.5, generated_tokens=7)
        tracing.flush()
        spans = collector.spans
        assert len(spans) == 1
        sp = spans[0]
        assert sp["name"] == "fmaas.Generate"
        assert sp["traceId"] == "0af7651916cd43dd8448eb211c80319c"
        assert sp["parentSpanId"] == "b7ad6b7169203331"
        attrs = {a["key"]: a["value"] for a in sp["attributes"]}
        assert attrs["batch_size"] == {"intValue": "3"}
        assert attrs["total_time_s"] == {"doubleValue": 0.5}
        assert int(sp["endTimeUnixNano"]) >= int(sp["startTimeUnixNano"])

    def test_nested_spans_share_trace(self, collector):
        tracing.configure(f"http://127.0.0.1:{collector.port}")
        with tracing.span("outer") as outer:
            with tracing.span("inner"):
                pass
        tracing.flush()
        spans = {s["name"]: s for s in collector.spans}
        assert spans["inner"]["traceId"] == spans["outer"]["traceId"]
        assert spans["inner"]["parentSpanId"] == spans["outer"]["spanId"]

    def test_collector_down_is_nonfatal(self):
        tracing.configure("http://127.0.0.1:9")   # nothing listens there
        with tracing.span("x"):
            pass
        tracing.flush()   # must not raise
        tracing.shutdown()


class TestActiveHealthProbe:
    def _mk(self, engine=None):
        from tests.test_scheduler import FakeEngine, FakeTokenizer, make_batcher

        return make_batcher(engine=engine)

    def test_fresh_loop_reports_healthy_without_probe(self):
        from text_generation_inference_tpu.server.http_server import (
            _health_status)

        async def go():
            b, eng = self._mk()
            b.start()
            await asyncio.sleep(0.05)
            assert await _health_status(b)
            await b.stop()
        asyncio.run(go())

    def test_stale_loop_probes_and_recovers(self):
        from text_generation_inference_tpu.server.http_server import (
            _health_status)

        async def go():
            b, eng = self._mk()
            b.start()
            await asyncio.sleep(0.05)
            # simulate staleness: pretend the last tick was long ago
            b.last_tick -= 100.0
            b.healthy = False
            # loop is actually alive -> the dummy generation completes
            assert await _health_status(b)
            await b.stop()
        asyncio.run(go())

    def test_wedged_loop_unhealthy(self, monkeypatch):
        from text_generation_inference_tpu.server import http_server
        from text_generation_inference_tpu.server.http_server import (
            _health_status)

        monkeypatch.setattr(http_server, "PROBE_TIMEOUT_S", 0.3)

        async def go():
            b, eng = self._mk()
            # never started: no loop runs, the probe request is never served
            b.last_tick -= 100.0
            assert not await _health_status(b)
        asyncio.run(go())
