"""Serving entrypoint: load model → build engine → start batcher + servers.

The reference splits this across a Rust launcher, a Rust router, and N
python shard processes (reference: launcher/src/main.rs:98-420,
router/src/server.rs:266-313). With a single-controller JAX engine the whole
boot is one process: no shard readiness handshake, no UDS fan-out, no
cross-process env contract.
"""

from __future__ import annotations

import asyncio
import logging
import os
import signal

import jax
import jax.numpy as jnp

from ..config import ServingConfig
from ..engine.engine import InferenceEngine
from ..models import families
from ..scheduler.batcher import Batcher
from ..utils.tokenization import ServingTokenizer
from .grpc_server import GenerationServicer, serve_grpc
from .http_server import serve_http

logger = logging.getLogger(__name__)

DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float32": jnp.float32,
}


def maybe_init_distributed() -> None:
    """Multi-host pod-slice initialization (SURVEY §2.6: first-class goal).

    On a TPU pod slice each host runs this same process;
    `jax.distributed.initialize` wires them into one logical device mesh
    (coordinator from env). Single-host runs skip this. The reference is
    single-host only (MASTER_ADDR=localhost assumed,
    launcher/src/main.rs:73-76).
    """
    import os

    if os.getenv("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        logger.info("jax.distributed initialized: process %s/%s",
                    os.environ.get("JAX_PROCESS_ID", "0"),
                    os.environ.get("JAX_NUM_PROCESSES", "1"))


def build_engine(config: ServingConfig):
    """Returns (engine, tokenizer, model_kind); dispatches decoder-only vs
    encoder-decoder (the reference's get_model dispatch,
    models/__init__.py:48-136)."""
    dtype = DTYPES[config.dtype_str]
    logger.info("loading model %s (dtype=%s)", config.model_name, config.dtype_str)
    hf_config = families.load_hf_config(config.model_name)
    tokenizer = ServingTokenizer.load(config.model_name)
    eos = tokenizer.eos_token_id
    if eos is None:
        eos = hf_config.get("eos_token_id")
    if eos is None:
        raise ValueError("cannot determine eos_token_id for model")

    if hf_config.get("model_type") in ("t5", "mt5", "umt5"):
        from ..engine.seq2seq import Seq2SeqEngine
        from ..models import t5 as t5_mod
        from ..utils.weights import Weights

        spec = t5_mod.spec_from_hf_config(hf_config)
        params = t5_mod.load_params(Weights(config.model_name), spec, dtype)
        engine = Seq2SeqEngine(spec, params, config, eos_token_id=eos)
        return engine, tokenizer, "encoder_decoder"

    spec, params = families.load_model(
        config.model_name, dtype=dtype, quantize=config.quantize)
    # tensor parallelism: shard over all local (or TENSOR_PARALLEL) devices
    mesh = None
    n_dev = len(jax.devices())
    tp = int(os.getenv("TENSOR_PARALLEL", str(n_dev)))
    if tp > 1:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(model_parallel=tp)
        logger.info("tensor parallel over %d devices", tp)
    # engine selection mirrors the reference's PAGED_ATTENTION / speculator
    # dispatch (reference: models/__init__.py:48-136, SPECULATOR_* envs).
    # Unlike the reference, paged is the DEFAULT: with dense-gather ring
    # decode it benches within ~5% of the slot engine (9414 vs 9959 tok/s
    # on TinyLlama/v5e) while admitting by exact page need instead of a
    # full max_seq KV reservation per slot. PAGED_ATTENTION=0 opts out.
    paged = os.getenv("PAGED_ATTENTION", "1").lower() in ("1", "true")
    spec_path = os.getenv("SPECULATOR_PATH")
    if spec_path or os.getenv("SPECULATOR", "").lower() in ("1", "true"):
        n_predict = int(os.getenv("SPECULATOR_N_PREDICT", "3"))
        # SPECULATOR_PATH loads a trained fms_extras-format MLPSpeculator —
        # the weights the reference consumes (reference:
        # paged_causal_lm.py:295-306). Bare SPECULATOR=1 without a path
        # builds a random-init speculator, which by the engine's exactness
        # invariant can only slow serving — warn loudly.
        sspec = sparams = None
        if spec_path:
            from ..models.speculator import load_speculator

            sspec, sparams = load_speculator(spec_path, dtype=dtype)
            if sspec.model_dim != spec.hidden_size \
                    or sspec.vocab_size != spec.vocab_size:
                raise ValueError(
                    f"speculator at {spec_path} does not match the model: "
                    f"model_dim {sspec.model_dim} vs hidden "
                    f"{spec.hidden_size}, vocab {sspec.vocab_size} vs "
                    f"{spec.vocab_size}")
            n_predict = sspec.n_predict
            logger.info("loaded speculator from %s (n_predict=%d, "
                        "inner_dim=%d)", spec_path, n_predict,
                        sspec.inner_dim)
        else:
            logger.warning(
                "SPECULATOR=1 without SPECULATOR_PATH builds a RANDOM-INIT "
                "speculator: output stays exact but acceptance will be "
                "~zero, making serving strictly slower. Point "
                "SPECULATOR_PATH at a trained MLPSpeculator checkpoint.")
        if paged:
            # the reference's configuration: speculation on the paged path,
            # gated by SPECULATOR_MAX_BATCH_SIZE / pool pressure
            from ..engine.speculative import PagedSpeculativeEngine

            engine = PagedSpeculativeEngine(
                spec, params, config, eos_token_id=eos, mesh=mesh,
                speculator_spec=sspec, speculator_params=sparams,
                n_predict=n_predict)
        else:
            if mesh is not None:
                raise ValueError(
                    "SPECULATOR with PAGED_ATTENTION=0 (slot engine) does "
                    "not support TENSOR_PARALLEL>1; use the paged "
                    "speculative engine or TENSOR_PARALLEL=1")
            from ..engine.speculative import SpeculativeEngine

            engine = SpeculativeEngine(
                spec, params, config, eos_token_id=eos,
                speculator_spec=sspec, speculator_params=sparams,
                n_predict=n_predict)
    elif paged:
        from ..engine.paged_engine import PagedInferenceEngine

        engine = PagedInferenceEngine(spec, params, config, eos_token_id=eos,
                                      mesh=mesh)
    else:
        engine = InferenceEngine(spec, params, config, eos_token_id=eos,
                                 mesh=mesh)
    return engine, tokenizer, "decoder"


async def async_serve(config: ServingConfig) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.getenv("JAX_COMPILATION_CACHE_DIR",
                                    "/root/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        logger.debug("compilation cache unavailable", exc_info=True)
    maybe_init_distributed()
    from ..utils import tracing

    tracing.configure(config.otlp_endpoint, config.otlp_service_name)
    engine, tokenizer, model_kind = build_engine(config)
    prompt_cache = None
    if config.prefix_store_path:
        from ..utils.prompt_cache import PrefixCache

        embed_dim = getattr(engine.spec, "hidden_size", None) or engine.spec.d_model
        prompt_cache = PrefixCache(
            config.prefix_store_path,
            embed_dim=embed_dim,
            max_size_mb=config.prompt_cache_size_mb,
            max_prefix_length=config.max_prompt_prefix_length,
        )
    import os as _os

    if _os.getenv("WARMUP", "1").lower() not in ("0", "false") \
            and hasattr(engine, "warmup"):
        logger.info("warming up compiled shapes (set WARMUP=0 to skip)")
        # multi-host: warmup is a deterministic jitted-call sequence, so
        # every rank runs it independently and the collectives line up
        engine.warmup()

    # Multi-host serving (SURVEY §2.6 first-class goal; the reference's
    # ShardedClient lockstep broadcast, sharded_client.rs:34-52): rank 0
    # serves and publishes every engine op; other ranks replay them so all
    # processes execute identical jitted calls. See parallel/multihost.py.
    if jax.process_count() > 1:
        from ..parallel import multihost

        if jax.process_index() == 0:
            pub = multihost.StepPublisher(jax.process_count() - 1)
            engine = multihost.ReplicatedEngine(engine, pub)
            logger.info("multihost: rank 0 serving with %d follower(s)",
                        jax.process_count() - 1)
        else:
            sub = multihost.StepSubscriber()
            logger.info("multihost: rank %d entering follower step loop",
                        jax.process_index())
            await asyncio.get_running_loop().run_in_executor(
                None, multihost.follower_loop, engine, sub)
            return

    if _os.getenv("INTERNAL_API", "").lower() in ("1", "true"):
        # serve the reference's internal router↔shard surface INSTEAD of
        # fmaas: this process then acts as a drop-in shard for the
        # reference's Rust router (see server/internal_server.py)
        from .internal_server import (InternalTextGenerationService,
                                      serve_internal_grpc)

        servicer = InternalTextGenerationService(
            engine, tokenizer, config, prompt_cache=prompt_cache,
            model_kind=model_kind)
        grpc_server = await serve_internal_grpc(servicer, config)
        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                loop.add_signal_handler(sig, stop.set)
            except (NotImplementedError, RuntimeError):
                pass
        logger.info("serving generate.v1 internal API for model=%s",
                    config.model_name)
        await stop.wait()
        await grpc_server.stop(grace=5.0)
        if hasattr(engine, "shutdown"):
            engine.shutdown()
        return

    batcher = Batcher(engine, tokenizer, config, prompt_cache=prompt_cache)
    batcher.start()

    servicer = GenerationServicer(config, tokenizer, batcher, model_kind=model_kind)
    grpc_server = await serve_grpc(servicer, config)
    http_server = await serve_http(batcher, config.http_port)

    stop = asyncio.Event()
    loop = asyncio.get_running_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            loop.add_signal_handler(sig, stop.set)
        except (NotImplementedError, RuntimeError):
            # RuntimeError when serving off the main thread (embedded use)
            pass
    logger.info("serving model=%s on gRPC :%d HTTP :%d (slots=%d, max_seq=%d)",
                config.model_name, config.grpc_port, config.http_port,
                config.max_batch_slots, config.max_sequence_length)
    await stop.wait()
    logger.info("shutting down")
    await grpc_server.stop(grace=5.0)
    http_server.close()
    await batcher.stop()
    if hasattr(engine, "shutdown"):
        engine.shutdown()   # multihost: release followers (OP_STOP)


def serve(config: ServingConfig) -> None:
    logging.basicConfig(
        level=getattr(logging, config.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    try:
        asyncio.run(async_serve(config))
    except Exception as e:
        from ..utils.termination import write_termination_log

        write_termination_log(f"serving failed: {type(e).__name__}: {e}")
        raise
