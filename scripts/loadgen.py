#!/usr/bin/env python
"""Open-loop load generator against the live gRPC surface: p50/p99 TTFT at
fixed QPS — the request-level half of the BASELINE metric ("output
tokens/sec/chip ... + p50 TTFT at fixed QPS").

Requests arrive by a Poisson process at the target QPS regardless of
completion times (open loop — queueing delay shows up in the numbers
instead of throttling the offered load). A configurable fraction use
GenerateStream; TTFT is measured on those as send -> first response
carrying a generated token, which includes validation + queue + prefill
time, mirroring what the reference's tgi_request_queue_duration +
prefill-side tgi_batch_inference_duration histograms cover (reference
README metrics table; router/src/grpc_server.rs:442-514 logs the same
per-request breakdown).

Usage:
  python scripts/loadgen.py HOST:PORT --qps 2 --duration 30 \
      --max-new 32 --stream-fraction 0.5 --prompt-words 48

Emits one JSON line per run on stdout; human-readable summary on stderr.
Importable: run_load() is used by tests/test_loadgen.py as a CI smoke.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import math
import random
import sys
import time
from dataclasses import dataclass, field

import grpc
import grpc.aio

sys.path.insert(0, ".")
from text_generation_inference_tpu.pb import generation_pb2 as pb  # noqa: E402

WORDS = ("the quick brown fox jumps over a lazy dog while seven wizards "
         "brew strong potions under pale moon light near old stone walls").split()


def _percentile(xs: list[float], q: float) -> float:
    if not xs:
        return float("nan")
    xs = sorted(xs)
    idx = min(len(xs) - 1, max(0, math.ceil(q / 100.0 * len(xs)) - 1))
    return xs[idx]


@dataclass
class LoadResult:
    qps_target: float
    qps_achieved: float = 0.0
    sent: int = 0
    completed: int = 0
    errors: int = 0
    output_tokens: int = 0
    output_tok_per_s: float = 0.0
    ttft_p50_ms: float = float("nan")
    ttft_p99_ms: float = float("nan")
    latency_p50_ms: float = float("nan")
    latency_p99_ms: float = float("nan")
    time_per_token_ms: float = float("nan")
    ttft_samples: list = field(default_factory=list, repr=False)

    breakdown: dict = field(default_factory=dict, repr=False)

    def to_json(self) -> dict:
        d = {k: (round(v, 2) if isinstance(v, float) else v)
             for k, v in self.__dict__.items()
             if k not in ("ttft_samples", "breakdown")}
        if self.breakdown:
            d["breakdown_ms"] = {k: round(v, 2)
                                 for k, v in self.breakdown.items()}
        d["metric"] = "p50_ttft_ms_at_qps"
        d["value"] = d["ttft_p50_ms"]
        return d


# ---------------------------------------------------------------------------
# TTFT decomposition via /metrics deltas
# ---------------------------------------------------------------------------

_BREAKDOWN_SERIES = {
    # metric name -> breakdown key (mean ms per event over the run window)
    "tgi_request_validation_duration": "validation",
    "tgi_request_queue_duration": "queue",
    "tgi_batch_inference_duration_prefill": "prefill_dispatch",
    "tgi_batch_inference_forward_duration_prefill": "prefill_forward",
    "tgi_batch_inference_duration_next_token": "decode_chunk",
    "tgi_batch_inference_forward_duration_next_token": "decode_chunk_forward",
    "tgi_batch_inference_tokproc_duration_next_token": "tokproc",
}


def _scrape_metrics(metrics_url: str) -> dict:
    """Histogram (sum, count) pairs for the breakdown series."""
    import urllib.request

    out = {}
    try:
        text = urllib.request.urlopen(metrics_url, timeout=5).read().decode()
    except Exception:
        return out
    sums: dict[str, float] = {}
    counts: dict[str, float] = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        try:
            name_labels, value = line.rsplit(" ", 1)
        except ValueError:
            continue
        name, _, labels = name_labels.partition("{")
        labels = labels.rstrip("}")
        method = ""
        if 'method="' in labels:
            method = "_" + labels.split('method="')[1].split('"')[0]
        key = name.replace("_sum", "").replace("_count", "") + method
        if name.endswith("_sum"):
            sums[key] = float(value)
        elif name.endswith("_count"):
            counts[key] = float(value)
    for key in set(sums) | set(counts):
        out[key] = (sums.get(key, 0.0), counts.get(key, 0.0))
    return out


def metrics_breakdown(before: dict, after: dict) -> dict:
    """Mean ms per event for each breakdown series over the run window.

    Explains WHERE the p50 TTFT goes (the reference logs the same split
    per request: validation/queue/inference, grpc_server.rs:442-514):
      validation + queue + prefill_dispatch + ~stream-chunk wait ≈ TTFT.
    decode_chunk is the full chunk latency a mid-decode arrival queues
    behind; decode_chunk_forward is its pure device time."""
    out = {}
    for series, key in _BREAKDOWN_SERIES.items():
        s0, c0 = before.get(series, (0.0, 0.0))
        s1, c1 = after.get(series, (0.0, 0.0))
        if c1 > c0:
            out[key] = (s1 - s0) / (c1 - c0) * 1e3
    return out


async def _one_request(channel, prompt: str, max_new: int, stream: bool,
                       timeout: float, res: LoadResult, lock: asyncio.Lock):
    params = pb.Parameters(
        method=pb.GREEDY,
        stopping=pb.StoppingCriteria(max_new_tokens=max_new))
    t0 = time.perf_counter()
    ttft = None
    tokens = 0
    try:
        if stream:
            call = channel.unary_stream(
                "/fmaas.GenerationService/GenerateStream",
                request_serializer=pb.SingleGenerationRequest.SerializeToString,
                response_deserializer=pb.GenerationResponse.FromString,
            )(pb.SingleGenerationRequest(
                model_id="m", request=pb.GenerationRequest(text=prompt),
                params=params), timeout=timeout)
            async for msg in call:
                if msg.generated_token_count > 0 or msg.text:
                    if ttft is None:
                        ttft = time.perf_counter() - t0
                    tokens = max(tokens, msg.generated_token_count)
        else:
            resp = await channel.unary_unary(
                "/fmaas.GenerationService/Generate",
                request_serializer=pb.BatchedGenerationRequest.SerializeToString,
                response_deserializer=pb.BatchedGenerationResponse.FromString,
            )(pb.BatchedGenerationRequest(
                model_id="m",
                requests=[pb.GenerationRequest(text=prompt)],
                params=params), timeout=timeout)
            tokens = resp.responses[0].generated_token_count
    except Exception:
        async with lock:
            res.errors += 1
        return
    dur = time.perf_counter() - t0
    async with lock:
        res.completed += 1
        res.output_tokens += tokens
        res.__dict__.setdefault("_latencies", []).append(dur * 1e3)
        if ttft is not None:
            res.ttft_samples.append(ttft * 1e3)
        if tokens > 1:
            res.__dict__.setdefault("_tpt", []).append(
                dur * 1e3 / tokens)


async def run_load(target: str, qps: float, duration_s: float,
                   max_new: int = 32, stream_fraction: float = 0.5,
                   prompt_words: int = 24, seed: int = 0,
                   timeout: float = 120.0,
                   metrics_url: str | None = None) -> LoadResult:
    """Open-loop Poisson arrivals at `qps` for `duration_s`; waits for all
    in-flight requests, returns aggregated LoadResult. With `metrics_url`
    (the server's /metrics endpoint) the result carries a per-component
    TTFT breakdown from histogram deltas."""
    rng = random.Random(seed)
    res = LoadResult(qps_target=qps)
    lock = asyncio.Lock()
    m_before = _scrape_metrics(metrics_url) if metrics_url else {}
    async with grpc.aio.insecure_channel(target) as channel:
        tasks = []
        t_start = time.perf_counter()
        next_at = 0.0
        while next_at < duration_s:
            delay = next_at - (time.perf_counter() - t_start)
            if delay > 0:
                await asyncio.sleep(delay)
            nwords = max(1, prompt_words)
            prompt = " ".join(rng.choice(WORDS) for _ in range(nwords))
            stream = rng.random() < stream_fraction
            tasks.append(asyncio.ensure_future(_one_request(
                channel, prompt, max_new, stream, timeout, res, lock)))
            res.sent += 1
            next_at += rng.expovariate(qps)
        await asyncio.gather(*tasks)
        elapsed = time.perf_counter() - t_start
    res.qps_achieved = res.sent / elapsed if elapsed > 0 else 0.0
    lat = res.__dict__.pop("_latencies", [])
    tpt = res.__dict__.pop("_tpt", [])
    res.latency_p50_ms = _percentile(lat, 50)
    res.latency_p99_ms = _percentile(lat, 99)
    res.ttft_p50_ms = _percentile(res.ttft_samples, 50)
    res.ttft_p99_ms = _percentile(res.ttft_samples, 99)
    res.time_per_token_ms = (sum(tpt) / len(tpt)) if tpt else float("nan")
    res.output_tok_per_s = res.output_tokens / elapsed if elapsed > 0 else 0.0
    if metrics_url:
        res.breakdown = metrics_breakdown(m_before,
                                          _scrape_metrics(metrics_url))
    return res


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("target", nargs="?", default="127.0.0.1:8033")
    ap.add_argument("--qps", type=float, action="append", default=None,
                    help="QPS point(s); repeat for a sweep (default 1,2,4)")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--stream-fraction", type=float, default=0.5)
    ap.add_argument("--prompt-words", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--metrics-url", default=None,
                    help="server /metrics endpoint (e.g. "
                    "http://127.0.0.1:3000/metrics) for the TTFT breakdown")
    args = ap.parse_args()
    qps_points = args.qps or [1.0, 2.0, 4.0]
    for qps in qps_points:
        print(f"loadgen: target={args.target} qps={qps} "
              f"duration={args.duration}s", file=sys.stderr, flush=True)
        res = asyncio.run(run_load(
            args.target, qps, args.duration, max_new=args.max_new,
            stream_fraction=args.stream_fraction,
            prompt_words=args.prompt_words, seed=args.seed,
            metrics_url=args.metrics_url))
        print(json.dumps(res.to_json()), flush=True)
        print(f"loadgen: qps={qps} -> p50 TTFT {res.ttft_p50_ms:.0f}ms "
              f"p99 {res.ttft_p99_ms:.0f}ms, p50 latency "
              f"{res.latency_p50_ms:.0f}ms, {res.output_tok_per_s:.0f} tok/s, "
              f"{res.errors} errors", file=sys.stderr, flush=True)
        if res.breakdown:
            print(f"loadgen: breakdown(ms/event) " +
                  " ".join(f"{k}={v:.1f}"
                           for k, v in sorted(res.breakdown.items())),
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
