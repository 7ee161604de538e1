"""Multi-host dry run: the REAL serving stack across 2 processes.

Two phases, both on virtual CPU devices (4 per process, 8 global):

  A. compiled-step smoke (the original dry run): one jitted sharded
     prefill+decode step over a (data=2, model=4) global mesh —
     validates multi-controller init and global-mesh compilation.

  B. live multi-host serving (the reference's lockstep shard broadcast,
     reference: router/client/src/sharded_client.rs:34-52): rank 0 runs
     the REAL Batcher + engine and publishes step descriptors
     (parallel/multihost.py); rank 1 replays them in a follower loop.
     The mesh is (data=1, model=8) so the TP all-reduces inside every
     prefill/decode step cross the process (DCN) boundary — the
     followers' devices must arrive at every collective for rank 0 to
     make progress. Outputs are compared BYTE-IDENTICAL against a
     single-process run of the same Batcher over the same mesh shape
     (8 local devices), isolating the multihost replay path from TP
     numerics (covered by tests/test_sharding.py).

Run everything:       python scripts/dryrun_multihost.py
Internal modes:       ... stepA <pid> <port>
                      ... ref <out.json>
                      ... serve <pid> <port> <step_port> <out.json>
"""

from __future__ import annotations

import asyncio
import json
import os
import subprocess
import sys
import time

NPROC = 2
LOCAL_DEVICES = 4

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "_fixture_models", "tiny_llama_served")


def _init_cpu(local_devices: int = LOCAL_DEVICES) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# phase A: compiled sharded step (original dry run)
# ---------------------------------------------------------------------------


def step_a_rank(pid: int, port: int) -> None:
    _init_cpu()
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NPROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from text_generation_inference_tpu.engine.engine import (
        EngineState, _decode_step, _prefill_step)
    from text_generation_inference_tpu.models import core
    from text_generation_inference_tpu.models.core import DecoderSpec, KVCache
    from text_generation_inference_tpu.parallel import sharding as shd

    assert jax.device_count() == NPROC * LOCAL_DEVICES, jax.device_count()
    mesh = shd.make_mesh(model_parallel=LOCAL_DEVICES, data_parallel=NPROC)

    spec = DecoderSpec(
        vocab_size=128 * LOCAL_DEVICES, hidden_size=8 * 64,
        num_layers=2, num_heads=8, num_kv_heads=LOCAL_DEVICES, head_dim=64,
        intermediate_size=128 * LOCAL_DEVICES, pos="rope", norm="rmsnorm",
        activation="silu_glu")
    num_slots, max_seq = 2 * NPROC, 32
    eos_id = 2

    shapes = jax.eval_shape(
        lambda: core.init_params(spec, jax.random.key(1), dtype=jnp.float32))
    pspecs = shd.param_specs(spec, shapes, mesh)
    cache_sp = shd.cache_spec(spec, mesh)

    def constrain(tree, specs):
        return jax.tree_util.tree_map(
            lambda a, s: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, s)),
            tree, specs, is_leaf=lambda x: not isinstance(x, dict))

    @jax.jit
    def full_step():
        params = constrain(
            core.init_params(spec, jax.random.key(1), dtype=jnp.float32),
            pspecs)
        cache = KVCache.create(spec, num_slots, max_seq, jnp.float32)
        cache = KVCache(
            k=jax.lax.with_sharding_constraint(
                cache.k, NamedSharding(mesh, cache_sp)),
            v=jax.lax.with_sharding_constraint(
                cache.v, NamedSharding(mesh, cache_sp)))
        state = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P())),
            EngineState.create(num_slots, max_seq))
        ids = jnp.zeros((1, 16), jnp.int32).at[0, :5].set(
            jnp.array([3, 1, 4, 1, 5], jnp.int32))
        cache, state, packed_p, _ = _prefill_step(
            spec, eos_id, False, params, cache, state, ids,
            jnp.array([5], jnp.int32), jnp.array([0], jnp.int32),
            jnp.zeros((1,), jnp.int32))
        cache, state, packed_d = _decode_step(spec, eos_id, params, cache,
                                              state)
        return packed_p, packed_d

    packed_p, _ = full_step()
    from jax.experimental import multihost_utils

    first = np.asarray(
        multihost_utils.process_allgather(packed_p, tiled=True)
    )[..., 0].astype(np.int32)
    assert ((first >= 0) & (first < spec.vocab_size)).all(), first
    print(f"stepA rank {pid}: ok (devices={jax.device_count()}, "
          f"mesh={dict(mesh.shape)})", flush=True)
    jax.distributed.shutdown()


# ---------------------------------------------------------------------------
# phase B: real Batcher + engine, rank-0 publisher + follower replay
# ---------------------------------------------------------------------------


def _build_serving_engine():
    """Identical on every rank: fixture model, (1, 8) global mesh (model
    axis spans both processes, so TP collectives ride the DCN link)."""
    import jax
    import jax.numpy as jnp

    from text_generation_inference_tpu.config import ServingConfig
    from text_generation_inference_tpu.engine.engine import InferenceEngine
    from text_generation_inference_tpu.models import families
    from text_generation_inference_tpu.parallel.sharding import make_mesh
    from text_generation_inference_tpu.utils.tokenization import (
        ServingTokenizer)

    config = ServingConfig(
        model_name=FIXTURE, max_sequence_length=64, max_new_tokens=32,
        max_batch_slots=4, max_prefill_batch=2, decode_chunk=4,
        stream_decode_chunk=2, prefill_buckets=[16, 32],
        max_waiting_tokens=4)
    config.validate()
    spec, params = families.load_model(FIXTURE, dtype=jnp.float32)
    mesh = make_mesh(model_parallel=jax.device_count(), data_parallel=1)
    engine = InferenceEngine(spec, params, config, eos_token_id=2, mesh=mesh)
    tokenizer = ServingTokenizer.load(FIXTURE)
    return engine, tokenizer, config


def _workload():
    """Deterministic request mix: greedy, seeded sampling, stop sequence,
    streaming; staggered submission forces add-on prefills mid-decode."""
    from text_generation_inference_tpu.engine.engine import RequestParams
    from text_generation_inference_tpu.scheduler.request import (
        GenRequest, ResponseOptions, StoppingCriteria)

    def req(text, max_new=8, streaming=False, stop=(), temperature=0.0,
            seed=0, details=False):
        return lambda tok: GenRequest(
            input_text=text, input_ids=tok.encode(text),
            params=RequestParams(
                max_new_tokens=max_new, temperature=temperature, seed=seed),
            stopping=StoppingCriteria(
                max_new_tokens=max_new, stop_sequences=list(stop)),
            options=ResponseOptions(
                generated_tokens=details, token_logprobs=details,
                token_ranks=details),
            streaming=streaming)

    return [
        (0.0, req("hello world this is", max_new=8)),
        (0.0, req("the quick brown", max_new=10, details=True)),
        (0.15, req("testing one two", max_new=6, temperature=0.8, seed=42)),
        (0.15, req("streaming text", max_new=8, streaming=True)),
        (0.3, req("fox jumps over", max_new=8, stop=("the",))),
    ]


async def _drive(batcher, tokenizer):
    results = []
    pending = []
    t0 = time.monotonic()
    for delay, make in _workload():
        await asyncio.sleep(max(0.0, t0 + delay - time.monotonic()))
        r = make(tokenizer)
        batcher.submit(r)
        pending.append(r)
    out = []
    for r in pending:
        stream_chunks = None
        if r.streaming:
            stream_chunks = []
            while True:
                item = await asyncio.wait_for(r.stream_queue.get(), 60)
                if item[0] == "token":
                    stream_chunks.append(item[2])
                elif item[0] == "final":
                    stream_chunks.append(item[2])
                    break
        await asyncio.wait_for(asyncio.shield(r.result_future), 60)
        rec = {
            "ids": [t.token_id for t in r.generated],
            "text": r.final_text(),
            "stop_reason": int(r.stop_reason),
            "logprobs": ([round(t.logprob, 5) for t in r.generated]
                         if r.options.token_logprobs else []),
        }
        if stream_chunks is not None:
            rec["stream_text"] = "".join(stream_chunks)
        out.append(rec)
    results.extend(out)
    return results


async def _serve_and_collect(engine, tokenizer, config):
    from text_generation_inference_tpu.scheduler.batcher import Batcher

    batcher = Batcher(engine, tokenizer, config)
    batcher.start()
    try:
        return await _drive(batcher, tokenizer)
    finally:
        await batcher.stop()


def ref_main(out_path: str) -> None:
    """Single-process reference: same Batcher, same mesh shape, 8 local
    devices."""
    _init_cpu(NPROC * LOCAL_DEVICES)

    engine, tokenizer, config = _build_serving_engine()
    results = asyncio.run(_serve_and_collect(engine, tokenizer, config))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"ref: {len(results)} results -> {out_path}", flush=True)


def serve_rank(pid: int, port: int, step_port: int, out_path: str) -> None:
    _init_cpu()
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NPROC, process_id=pid)
    assert jax.device_count() == NPROC * LOCAL_DEVICES

    from text_generation_inference_tpu.parallel import multihost

    engine, tokenizer, config = _build_serving_engine()
    if pid == 0:
        pub = multihost.StepPublisher(NPROC - 1, port=step_port)
        wrapped = multihost.ReplicatedEngine(engine, pub)
        results = asyncio.run(_serve_and_collect(wrapped, tokenizer, config))
        wrapped.shutdown()
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"serve rank 0: {len(results)} results -> {out_path}",
              flush=True)
    else:
        sub = multihost.StepSubscriber(host="localhost", port=step_port)
        multihost.follower_loop(engine, sub)
        print("serve rank 1: follower loop done", flush=True)
    jax.distributed.shutdown()


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> None:
    if not os.path.exists(os.path.join(FIXTURE, "config.json")):
        raise SystemExit(
            f"fixture model missing: {FIXTURE}\n"
            "create it once with: python -m pytest tests/test_server.py -q "
            "-k greedy")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}

    # phase A
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "stepA",
             str(pid), str(port)], env=env)
        for pid in range(NPROC)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"phase A (compiled step) failed: exit {codes}")
    print("phase A ok: compiled sharded step across 2 processes")

    # phase B: reference run
    ref_path = "/tmp/dryrun_multihost_ref.json"
    out_path = "/tmp/dryrun_multihost_out.json"
    rc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "ref", ref_path],
        env=env).wait(timeout=600)
    if rc:
        raise SystemExit(f"phase B reference run failed: exit {rc}")

    # phase B: 2-process serving run
    port, step_port = _free_port(), _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "serve",
             str(pid), str(port), str(step_port), out_path], env=env)
        for pid in range(NPROC)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"phase B serving run failed: exit {codes}")

    with open(ref_path) as f:
        ref = json.load(f)
    with open(out_path) as f:
        out = json.load(f)
    # token ids / text / stop reasons / stream chunks: byte-identical.
    # logprobs: the cross-process all-reduce sums in a different order than
    # the single-process one (last-ulp float drift), so they compare at the
    # reference's own golden tolerance (rel 5e-4, reference:
    # integration_tests/approx.py:11-17).
    def strip(rows):
        return [{k: v for k, v in r.items() if k != "logprobs"}
                for r in rows]

    mismatch = strip(ref) != strip(out)
    for a, b in zip(ref, out):
        for x, y in zip(a["logprobs"], b["logprobs"]):
            if abs(x - y) > 5e-4 * max(abs(x), abs(y)):
                mismatch = True
    if mismatch or len(ref) != len(out):
        print("REFERENCE:", json.dumps(ref, indent=1))
        print("MULTIHOST:", json.dumps(out, indent=1))
        raise SystemExit(
            "phase B MISMATCH: multihost serving output differs from the "
            "single-process run")
    print(f"phase B ok: {len(out)} requests — token ids/text/stop reasons "
          "byte-identical across single-process and 2-process multihost "
          "serving (logprobs within the reference's 5e-4 golden tolerance)")
    print("multihost dryrun ok")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "stepA":
        step_a_rank(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "ref":
        ref_main(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "serve":
        serve_rank(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   sys.argv[5])
    else:
        main()
