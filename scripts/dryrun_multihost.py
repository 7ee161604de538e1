"""Two-process jax.distributed dry run (the multi-host / DCN path).

Counterpart of the reference's 2-shard gloo CPU test (reference:
integration_tests/test_server.py:396-420): each process owns 4 virtual CPU
devices; the global 8-device mesh is (data=2 over "DCN", model=4 over
"ICI"), and one jitted program runs a sharded prefill + decode step with
the real TP/DP shardings. Validates multi-controller init, global-mesh
compilation, and cross-process collectives without real pod hardware.

Run directly (spawns both processes):      python scripts/dryrun_multihost.py
Run as one rank (internal):                python scripts/dryrun_multihost.py <pid> <port>
"""

from __future__ import annotations

import os
import subprocess
import sys

NPROC = 2
LOCAL_DEVICES = 4


def run_rank(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NPROC, process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from text_generation_inference_tpu.engine.engine import (
        EngineState, _decode_step, _prefill_step)
    from text_generation_inference_tpu.models import core
    from text_generation_inference_tpu.models.core import DecoderSpec, KVCache
    from text_generation_inference_tpu.parallel import sharding as shd

    assert jax.device_count() == NPROC * LOCAL_DEVICES, jax.device_count()
    assert jax.process_count() == NPROC
    # data axis spans the two processes (the DCN boundary), model axis is
    # within-process (the ICI analogue)
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

    packed_p, packed_d = full_step()
    # every process reads the fully-replicated outputs
    import numpy as np
    from jax.experimental import multihost_utils

    first = np.asarray(
        multihost_utils.process_allgather(packed_p, tiled=True)
    )[..., 0].astype(np.int32)
    assert ((first >= 0) & (first < spec.vocab_size)).all(), first
    print(f"rank {pid}: ok (devices={jax.device_count()}, "
          f"mesh={dict(mesh.shape)})", flush=True)
    jax.distributed.shutdown()


def main() -> None:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid), str(port)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for pid in range(NPROC)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"multihost dryrun failed: exit codes {codes}")
    print("multihost dryrun ok")


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_rank(int(sys.argv[1]), int(sys.argv[2]))
    else:
        main()
