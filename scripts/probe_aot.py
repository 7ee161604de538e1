"""A/B: decode-chunk dispatch via AOT Compiled executable vs jit fastpath.

The engines AOT-compile decode programs (lower().compile()) so bucket
crossings never trace/compile in the hot loop; this probe checks whether
calling the stored Compiled object costs more per dispatch than the jit
C++ fastpath (same program, same buffers, XLA cache warm).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_aot.py
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine import engine as eng
from text_generation_inference_tpu.engine.engine import (
    InferenceEngine, RequestParams)
from text_generation_inference_tpu.models import core
from text_generation_inference_tpu.models.core import DecoderSpec

spec = DecoderSpec(
    vocab_size=32000, hidden_size=2048, num_layers=22,
    num_heads=32, num_kv_heads=4, head_dim=64,
    intermediate_size=5632, pos="rope", norm="rmsnorm",
    activation="silu_glu", norm_eps=1e-5)

S, T, CHUNK, CALLS = 48, 1024, 64, 4


def build_engine():
    params = core.init_params(spec, jax.random.key(0), dtype=jnp.bfloat16)
    cfg = ServingConfig(max_sequence_length=T, max_new_tokens=T // 2,
                        max_batch_slots=S, decode_chunk=CHUNK,
                        prefill_buckets=[64, T])
    cfg.validate()
    e = InferenceEngine(spec, params, cfg, eos_token_id=2)
    rng = np.random.default_rng(0)
    for _ in range(S):
        s = e.acquire_slot()
        e.prefill([s], [rng.integers(0, 32000, size=64).tolist()],
                  [RequestParams(max_new_tokens=T - 65)])
    return e


def time_calls(e, label):
    # pin the bucket so both phases run the identical program
    e._warmup_rows = 256
    e.decode_steps(want_details=False)         # compile/prime + settle
    t0 = time.perf_counter()
    for _ in range(CALLS):
        e.decode_steps(want_details=False)
    dt = (time.perf_counter() - t0) / CALLS
    print(f"{label}: {dt/CHUNK*1e3:.3f} ms/step (chunk {dt*1e3:.1f} ms)",
          file=sys.stderr)
    return dt


def main():
    print(f"device: {jax.devices()[0].platform}", file=sys.stderr)
    e = build_engine()
    time_calls(e, "aot-compiled")

    # same engine class but with the AOT step disabled: store the bare jit
    raw_cache = {}

    def raw_get(self, want_details, cache_rows):
        key = (want_details, cache_rows)
        if key not in raw_cache:
            raw_cache[key] = jax.jit(
                partial(eng._decode_ring_multi, self.spec, self.eos_token_id,
                        self.decode_chunk, want_details=want_details,
                        cache_rows=cache_rows),
                donate_argnums=(1, 2))
        return raw_cache[key]

    e2 = build_engine()
    e2._get_decode_fn = raw_get.__get__(e2)
    time_calls(e2, "jit-fastpath")


if __name__ == "__main__":
    main()
