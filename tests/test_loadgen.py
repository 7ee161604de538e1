"""CI smoke for the TTFT/QPS load harness (scripts/loadgen.py): low-QPS
open-loop run against the in-process server; asserts the harness measures
TTFT on streaming requests and completes everything error-free.

The real measurement (TPU, serving-scale QPS points) is run via
`python scripts/loadgen.py HOST:PORT --qps ...` against `cli.py serve`;
results are recorded in README.md's latency table.
"""

import asyncio

from tests.test_server import ServerHandle  # reuses the live-server fixture


def test_loadgen_smoke():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    try:
        import loadgen
    finally:
        sys.path.pop(0)

    h = ServerHandle()
    h.start()
    res = asyncio.run(loadgen.run_load(
        f"127.0.0.1:{h.grpc_port}", qps=3.0, duration_s=3.0,
        max_new=4, stream_fraction=0.5, prompt_words=4, seed=1))

    assert res.sent >= 3
    assert res.errors == 0
    assert res.completed == res.sent
    assert res.output_tokens >= res.completed  # >= 1 token each
    # at least one streaming request measured a TTFT, and percentiles exist
    assert res.ttft_samples, "no streaming TTFT samples collected"
    assert res.ttft_p50_ms > 0
    assert res.latency_p99_ms >= res.latency_p50_ms > 0
    d = res.to_json()
    assert d["metric"] == "p50_ttft_ms_at_qps" and d["value"] == d["ttft_p50_ms"]
