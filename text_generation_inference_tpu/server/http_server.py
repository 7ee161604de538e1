"""Minimal HTTP endpoint for /health and /metrics.

Counterpart of the reference's axum HTTP server (reference:
router/src/server.rs:446-487, router/src/health.rs). Health reports 200
while the batching loop is live; stdlib-only implementation.
"""

from __future__ import annotations

import asyncio
import logging

from ..utils import metrics

logger = logging.getLogger(__name__)


async def _handle(batcher, reader: asyncio.StreamReader,
                  writer: asyncio.StreamWriter) -> None:
    try:
        request_line = await reader.readline()
        # drain headers
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b"\n", b""):
                break
        parts = request_line.decode("latin1").split()
        path = parts[1] if len(parts) >= 2 else "/"
        if path == "/metrics":
            body = metrics.render().encode()
            status, ctype = "200 OK", "text/plain; version=0.0.4"
        elif path in ("/health", "/"):
            if batcher is None or batcher.healthy:
                body, status = b"ok", "200 OK"
            else:
                body, status = b"unhealthy", "503 Service Unavailable"
            ctype = "text/plain"
        else:
            body, status, ctype = b"not found", "404 Not Found", "text/plain"
        writer.write(
            f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n".encode()
            + body)
        await writer.drain()
    except Exception:
        logger.debug("http handler error", exc_info=True)
    finally:
        writer.close()


async def serve_http(batcher, port: int) -> asyncio.AbstractServer:
    server = await asyncio.start_server(
        lambda r, w: _handle(batcher, r, w), host="0.0.0.0", port=port)
    logger.info("HTTP server listening on :%d (/health, /metrics)", port)
    return server
