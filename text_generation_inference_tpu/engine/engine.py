"""Single-controller inference engine over a fixed slot batch.

This is the TPU-native replacement for the reference's whole L4-L6 stack —
the per-GPU shard processes, their gRPC servicer, the Batch state machines
and the batch cache (reference: server/text_generation_server/server.py,
models/causal_lm.py, models/flash_causal_lm.py, cache.py). One process owns
all local TPU chips; state lives in device arrays indexed by slot:

  * `prefill(slot, ids, params)` — pads the prompt to a length bucket, runs
    the compiled prefill for that bucket (writing KV into the slot), samples
    the first token, and installs the request's sampling parameters;
  * `decode()` — one compiled step over every slot; returns per-slot token
    ids + details to the host;
  * `free(slot)` — host bookkeeping only (the reference's PruneBatch /
    concatenate work vanishes: there is nothing to reshape).

Compiled functions are cached per static shape: decode compiles exactly
once, prefill once per (bucket, details-variant). This replaces the
reference's PT2-compile shape-grid warmup (reference: utils/warmup.py).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServingConfig
from ..models import core
from ..ops import linear as linops
from ..models.core import DecoderSpec, KVCache
from . import sampling
from .sampling import SlotSamplingParams

logger = logging.getLogger(__name__)


class EngineDeviceError(RuntimeError):
    """A device step failed after its donated buffers may have been
    consumed: cache/state contents are undefined and the engine must be
    `reset()` before further use. The scheduler uses this to scope failure
    handling — host-side errors keep device state intact and fail only the
    affected requests (reference: batcher.rs:725-737 scopes failures to the
    affected batch segment)."""


class EngineState(NamedTuple):
    """Per-slot device state (all leading dims = num_slots)."""

    history: jax.Array      # [S, T] i32: prompt + generated token ids
    history_len: jax.Array  # [S] i32: valid ids in history
    hist_start: jax.Array   # [S] i32: first real token (after soft prompt)
    input_len: jax.Array    # [S] i32: prompt length (incl. prefix positions)
    gen_count: jax.Array    # [S] i32: generated tokens so far
    active: jax.Array       # [S] bool
    params: SlotSamplingParams

    @classmethod
    def create(cls, num_slots: int, max_seq: int) -> "EngineState":
        return cls(
            history=jnp.zeros((num_slots, max_seq), jnp.int32),
            history_len=jnp.ones((num_slots,), jnp.int32),
            hist_start=jnp.zeros((num_slots,), jnp.int32),
            input_len=jnp.ones((num_slots,), jnp.int32),
            gen_count=jnp.zeros((num_slots,), jnp.int32),
            active=jnp.zeros((num_slots,), jnp.bool_),
            params=SlotSamplingParams.empty(num_slots),
        )


@dataclasses.dataclass
class RequestParams:
    """Per-request decoding parameters, validated upstream."""

    temperature: float = 0.0        # 0 => greedy
    top_k: int = 0
    top_p: float = 1.0
    typical_p: float = 1.0
    seed: int = 0
    repetition_penalty: float = 1.0
    lp_start: int = 0
    lp_decay: float = 0.0
    min_new_tokens: int = 0
    max_new_tokens: int = 20


class StepResult(NamedTuple):
    """Host-side view of one engine step for a set of rows."""

    next_ids: np.ndarray       # [N]
    logprob: np.ndarray        # [N]
    rank: np.ndarray           # [N]
    top_ids: np.ndarray        # [N, TOP_N_CAP]
    top_logprobs: np.ndarray   # [N, TOP_N_CAP]
    top_scores: np.ndarray     # [N, TOP_N_CAP]


class PrefillResult(NamedTuple):
    first_token: StepResult                    # rows == the prefilled seqs
    prompt_details: Optional[list[dict]]       # per seq, when requested


# ---------------------------------------------------------------------------
# pure step functions (jitted)
# ---------------------------------------------------------------------------


def _decode_step(spec: DecoderSpec, eos_id: int, params: dict,
                 cache: KVCache, state: EngineState,
                 write_mode: str = "post", want_details: bool = True):
    s, t_max = state.history.shape
    params = linops.prepare_params(params, rows=s)
    rows = jnp.arange(s)
    pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
    ids = state.history[rows, pos]
    logits, cache = core.decode(
        spec, params, ids, pos, cache, context_len=pos + 1,
        write_mode=write_mode)
    next_ids, details = sampling.next_tokens(
        logits, state.params, state.gen_count, state.history,
        state.history_len, eos_id, history_start=state.hist_start,
        want_details=want_details)
    active = state.active
    write_pos = jnp.clip(state.history_len, 0, t_max - 1)
    new_hist = state.history.at[rows, write_pos].set(
        jnp.where(active, next_ids, state.history[rows, write_pos]))
    state = state._replace(
        history=new_hist,
        history_len=state.history_len + active.astype(jnp.int32),
        gen_count=state.gen_count + active.astype(jnp.int32),
    )
    return cache, state, sampling.pack_step_outputs(next_ids, details)


def _decode_multi(spec: DecoderSpec, eos_id: int, num_steps: int,
                  params: dict, cache: KVCache, state: EngineState,
                  write_mode: str = "post", want_details: bool = True):
    """`num_steps` decode iterations in one compiled dispatch; packed
    outputs stacked [num_steps, S, 3+3*CAP]. Amortizes the per-dispatch and
    per-fetch host/tunnel overhead — with the host-side stopping logic
    applied per token afterwards, behavior is identical except that slots
    whose request stops mid-chunk compute (discarded) extra tokens."""
    params = linops.prepare_params(params, rows=state.history.shape[0])

    def body(carry, _):
        cache, state = carry
        cache, state, packed = _decode_step(spec, eos_id, params, cache, state,
                                            write_mode=write_mode,
                                            want_details=want_details)
        return (cache, state), packed

    (cache, state), packed_seq = jax.lax.scan(
        body, (cache, state), None, length=num_steps)
    return cache, state, packed_seq


def _decode_ring_multi(spec: DecoderSpec, eos_id: int, num_steps: int,
                       params: dict, cache: KVCache, state: EngineState,
                       want_details: bool = True,
                       cache_rows: Optional[int] = None):
    """`num_steps` decode iterations with a per-chunk KV ring buffer and a
    single cache scatter at chunk end (see core.decode_ring_step). The
    fastest decode path: the cache slabs are read-only inside the scan, so
    XLA neither carries nor copies them per step.

    `cache_rows` (static) slices the READ side of the cache to its first
    `cache_rows` positions — one copy per chunk, amortized over the scan —
    so attention stops streaming dead KV rows each step. Correct whenever
    every active slot's context at chunk entry fits in `cache_rows` (the
    engine picks the smallest configured bucket that covers the live
    maximum; in-chunk tokens live in the ring buffer, not the cache). The
    chunk-end scatter still targets the full cache."""
    s, t_max = state.history.shape
    params = linops.prepare_params(params, rows=s)
    rows = jnp.arange(s)
    chunk_start = jnp.clip(state.history_len - 1, 0, t_max - 1)   # [S]
    if cache_rows is not None and cache_rows < t_max:
        read_cache = KVCache(
            k=jax.lax.slice_in_dim(cache.k, 0, cache_rows, axis=3),
            v=jax.lax.slice_in_dim(cache.v, 0, cache_rows, axis=3),
            k_scale=(None if cache.k_scale is None else
                     jax.lax.slice_in_dim(cache.k_scale, 0, cache_rows,
                                          axis=3)),
            v_scale=(None if cache.v_scale is None else
                     jax.lax.slice_in_dim(cache.v_scale, 0, cache_rows,
                                          axis=3)))
    else:
        read_cache = cache
    # in-chunk ring buffers stay full precision even over an int8 cache
    # (they are tiny; quantization happens once at the chunk-end flush)
    buf_dtype = (params["embed_tokens"].dtype
                 if cache.quantized else cache.k.dtype)
    kbuf = jnp.zeros((spec.num_layers, s, spec.num_kv_heads, num_steps,
                      spec.head_dim), buf_dtype)
    vbuf = jnp.zeros_like(kbuf)
    cache_dtype = buf_dtype

    def body(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        logits, k_all, v_all = core.decode_ring_step(
            spec, params, ids, pos, read_cache, kbuf, vbuf, i, chunk_start)
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k_all[:, :, :, None, :].astype(cache_dtype), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v_all[:, :, :, None, :].astype(cache_dtype), (0, 0, 0, i, 0))
        next_ids, details = sampling.next_tokens(
            logits, state.params, state.gen_count, state.history,
            state.history_len, eos_id, history_start=state.hist_start,
            want_details=want_details)
        active = state.active
        write_pos = jnp.clip(state.history_len, 0, t_max - 1)
        new_hist = state.history.at[rows, write_pos].set(
            jnp.where(active, next_ids, state.history[rows, write_pos]))
        state = state._replace(
            history=new_hist,
            history_len=state.history_len + active.astype(jnp.int32),
            gen_count=state.gen_count + active.astype(jnp.int32),
        )
        return (kbuf, vbuf, state), sampling.pack_step_outputs(next_ids, details)

    (kbuf, vbuf, state), packed_seq = jax.lax.scan(
        body, (kbuf, vbuf, state), jnp.arange(num_steps, dtype=jnp.int32))
    cache = core.ring_flush(cache, kbuf, vbuf, chunk_start)
    return cache, state, packed_seq


def _prefill_step(spec: DecoderSpec, eos_id: int, want_prompt_details: bool,
                  params: dict, cache: KVCache, state: EngineState,
                  ids: jax.Array,        # [N, B] right-padded bucket
                  lengths: jax.Array,    # [N] total lengths (prefix + prompt)
                  slots: jax.Array,      # [N]
                  prefix_len: jax.Array,                      # [N] i32
                  prefix_embeds: Optional[jax.Array] = None): # [N, B, D]
    # NOTE: no prepare_params here. Row-major int4 storage uses the packed
    # kernel directly (amortized over the compute-bound bucket). Lane-major
    # storage converts PER LAYER inside the scan: the layer scan slices the
    # stacked qlane leaves, so linops.matmul's in-trace populate_q4 touches
    # one layer's weights at a time (~100 MB transient on 7B vs a 3.4 GB
    # whole-tree q4 copy, which OOMs 16 GB HBM at the prefill peak). Each
    # weight still converts exactly once per prefill dispatch.
    n, b = ids.shape
    t_max = state.history.shape[1]
    logits_all, cache = core.prefill(
        spec, params, ids, lengths, slots, cache,
        prefix_embeds=prefix_embeds,
        prefix_len=prefix_len if prefix_embeds is not None else None)
    rows = jnp.arange(n)
    last_logits = logits_all[rows, lengths - 1]          # [N, V]

    req_params = state.params.gather(slots)
    next_ids, details = sampling.next_tokens(
        last_logits, req_params,
        gen_count=jnp.zeros((n,), jnp.int32),
        token_history=ids, history_len=lengths,
        eos_token_id=eos_id, history_start=prefix_len)

    # install prompt + first token into the slot state
    hist = state.history
    hist = hist.at[slots[:, None], jnp.arange(b)[None, :]].set(ids, mode="drop")
    first_pos = jnp.clip(lengths, 0, t_max - 1)
    hist = hist.at[slots, first_pos].set(next_ids, mode="drop")
    state = state._replace(
        history=hist,
        history_len=state.history_len.at[slots].set(lengths + 1),
        hist_start=state.hist_start.at[slots].set(prefix_len),
        input_len=state.input_len.at[slots].set(lengths),
        gen_count=state.gen_count.at[slots].set(1),
        active=state.active.at[slots].set(True),
    )
    if want_prompt_details:
        pdet = jax.vmap(
            lambda lg, pid: sampling.prompt_token_details(lg[: b - 1], pid)
        )(logits_all, ids)
    else:
        pdet = None
    return cache, state, sampling.pack_step_outputs(next_ids, details), pdet


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class InferenceEngine:
    """Owns model params, KV cache and slot state; exposes host-level ops."""

    # decode_steps_begin/decode_steps_end may be pipelined two-deep by the
    # caller (dispatch chunk N+1 before fetching chunk N's outputs)
    supports_decode_pipeline = True
    # decode_steps/decode_steps_begin accept a per-call `chunk` override
    # (stream-aware chunking)
    supports_chunk_override = True

    def __init__(
        self,
        spec: DecoderSpec,
        params: dict,
        config: ServingConfig,
        eos_token_id: int,
        mesh=None,
    ):
        self.spec = spec
        self.mesh = mesh
        model_parallel = 1 if mesh is None else mesh.shape.get("model", 1)
        if model_parallel > 1:
            # a fused column-sharded qkv would split across projection
            # boundaries (see models/fuse.py) — keep projections separate
            config.fuse_matmuls = False
        if config.fuse_matmuls:
            from ..models.fuse import fuse_params

            params = fuse_params(spec, params)
        params = linops.prepare_storage(params)   # int4 -> lane-major once
        self.model_params = params
        self.config = config
        self.eos_token_id = eos_token_id

        if config.kv_cache_dtype == "int8":
            if config.decode_write_mode != "ring" or config.decode_chunk < 2:
                raise ValueError(
                    "kv_cache_dtype=int8 requires the ring decode path "
                    "(decode_write_mode=ring, decode_chunk > 1)")
            cache_dtype = jnp.int8
        else:
            cache_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        from .memory import plan_memory

        self.memory_plan = plan_memory(
            spec, config, params,
            cache_dtype_itemsize=jnp.dtype(cache_dtype).itemsize)
        self.num_slots = config.max_batch_slots   # possibly shrunk by the plan
        self.max_seq = config.max_sequence_length
        self.cache = KVCache.create(spec, self.num_slots, self.max_seq, cache_dtype)
        self.state = EngineState.create(self.num_slots, self.max_seq)
        if mesh is not None:
            from ..parallel import sharding as shd

            specs = shd.param_specs(spec, self.model_params, mesh)
            self.model_params = shd.shard_params(self.model_params, specs, mesh)
            self.cache = shd.shard_cache(self.cache, spec, mesh)
            self.state = shd.replicate(self.state, mesh)
        self.free_slots: list[int] = list(range(self.num_slots))
        # slots freed by the scheduler thread while a pipelined dispatch may
        # be in flight; the device-side active-mask update is applied at the
        # start of the NEXT engine call (same thread as the dispatch), so
        # host code never touches possibly-donated buffers. The list itself
        # is shared between the event-loop thread (free) and the executor
        # thread (drain) — guarded by _free_lock.
        self._free_lock = threading.Lock()
        self._pending_frees: list[int] = []

        self.decode_chunk = max(1, config.decode_chunk)
        self._write_mode = config.decode_write_mode
        # host mirror of each slot's history_len (0 = slot free), kept so
        # the ring decode can pick a context bucket without a device fetch.
        # Mutated only on the engine-call thread (prefill / decode_steps /
        # _apply_pending_frees), so no locking beyond _free_lock is needed.
        self._slot_ctx = np.zeros(self.num_slots, np.int32)
        self._warmup_rows: Optional[int] = None
        # decode programs are compiled per (want_details, cache_rows): the
        # no-details path skips log_softmax/top-k/rank entirely (the
        # reference likewise computes logprobs/top-n only when requested);
        # cache_rows variants read only a context-bucket prefix of the cache
        self._decode_fns: dict[tuple[bool, Optional[int]], Any] = {}
        self._prefill_fns: dict[tuple[int, int, bool], Any] = {}
        self.last_forward_ns: int = 0

    # -- capacity ----------------------------------------------------------

    def reset(self) -> None:
        """Reinitialize all device-side batch state after an
        EngineDeviceError: a raised jit call leaves its donated buffers
        (cache/state) undefined. Model params are never donated and
        survive. All slots become free; callers must have failed/evicted
        their in-flight requests first."""
        cache_dtype = self.cache.k.dtype   # aval metadata survives deletion
        self.cache = KVCache.create(self.spec, self.num_slots, self.max_seq,
                                    cache_dtype)
        self.state = EngineState.create(self.num_slots, self.max_seq)
        if self.mesh is not None:
            from ..parallel import sharding as shd

            self.cache = shd.shard_cache(self.cache, self.spec, self.mesh)
            self.state = shd.replicate(self.state, self.mesh)
        self.free_slots = list(range(self.num_slots))
        with self._free_lock:
            self._pending_frees.clear()
        self._slot_ctx[:] = 0
        logger.warning("engine device state reset (all slots cleared)")

    @property
    def num_active(self) -> int:
        return self.num_slots - len(self.free_slots)

    def acquire_slot(self) -> Optional[int]:
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot: int) -> None:
        """Release a slot (host bookkeeping only; the device mask update is
        deferred to the next engine call — see _pending_frees)."""
        with self._free_lock:
            self._pending_frees.append(slot)
        self.free_slots.append(slot)

    def _apply_pending_frees(self) -> None:
        with self._free_lock:
            pending, self._pending_frees = self._pending_frees, []
        if pending:
            self._slot_ctx[np.asarray(pending)] = 0
            slots = jnp.asarray(pending, jnp.int32)
            self.state = self.state._replace(
                active=self.state.active.at[slots].set(False))

    # -- steps -------------------------------------------------------------

    def _get_prefill_fn(self, n: int, bucket: int, want_details: bool,
                        has_prefix: bool = False):
        key = (n, bucket, want_details, has_prefix)
        fn = self._prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(
                partial(_prefill_step, self.spec, self.eos_token_id, want_details),
                donate_argnums=(1, 2),
            )
            self._prefill_fns[key] = fn
        return fn

    def set_request_params(self, slot: int, rp: RequestParams) -> None:
        self.state = self.state._replace(
            params=self.state.params.write_slot(
                slot,
                temperature=rp.temperature,
                top_k=rp.top_k,
                top_p=rp.top_p,
                typical_p=rp.typical_p,
                repetition_penalty=rp.repetition_penalty,
                lp_start=rp.lp_start,
                lp_decay=rp.lp_decay,
                min_new_tokens=rp.min_new_tokens,
                seed=rp.seed,
            )
        )

    def prefill(
        self,
        slots: list[int],
        token_ids: list[list[int]],
        request_params: list[RequestParams],
        want_prompt_details: bool = False,
        prefix_embeds: Optional[list[Optional[np.ndarray]]] = None,
    ) -> PrefillResult:
        """Prefill one or more prompts into their slots; returns first tokens.

        `prefix_embeds[i]`, when given, is a [P_i, hidden] float array of
        soft-prompt embeddings prepended to request i's tokens
        (reference: causal_lm.py:175-191 prompt-prefix injection).
        """
        n = len(slots)
        assert n == len(token_ids) == len(request_params)
        self._apply_pending_frees()
        for slot, rp in zip(slots, request_params):
            self.set_request_params(slot, rp)
        pe_list = [getattr(pe, "decoder", pe)
                   for pe in (prefix_embeds or [None] * n)]
        prefix_lens = [0 if pe is None else int(pe.shape[0]) for pe in pe_list]
        total_lens = [p + len(t) for p, t in zip(prefix_lens, token_ids)]
        bucket = self.config.bucket_for(max(total_lens))
        ids = np.zeros((n, bucket), np.int32)
        lengths = np.asarray(total_lens, np.int32)
        for i, toks in enumerate(token_ids):
            ids[i, prefix_lens[i]: prefix_lens[i] + len(toks)] = toks
        has_prefix = any(prefix_lens)
        embeds_arg = None
        if has_prefix:
            dim = self.spec.hidden_size
            embeds = np.zeros((n, bucket, dim), np.float32)
            for i, pe in enumerate(pe_list):
                if pe is not None:
                    embeds[i, : pe.shape[0]] = pe
            embeds_arg = jnp.asarray(embeds)

        fn = self._get_prefill_fn(n, bucket, want_prompt_details, has_prefix)
        t0 = time.monotonic_ns()
        args = [self.model_params, self.cache, self.state,
                jnp.asarray(ids), jnp.asarray(lengths),
                jnp.asarray(slots, jnp.int32),
                jnp.asarray(prefix_lens, jnp.int32)]
        if has_prefix:
            args.append(embeds_arg)
        try:
            self.cache, self.state, packed, pdet = fn(*args)
            step = StepResult(*sampling.unpack_step_outputs(packed))
        except Exception as e:
            raise EngineDeviceError(f"prefill step failed: {e}") from e
        self._slot_ctx[np.asarray(slots)] = lengths + 1   # history incl. first token
        self.last_forward_ns = time.monotonic_ns() - t0

        prompt_details = None
        if want_prompt_details:
            prompt_details = []
            for i in range(n):
                s, e = prefix_lens[i], total_lens[i]
                lp = np.asarray(pdet.logprob)[i, s:e].copy()
                rk = np.asarray(pdet.rank)[i, s:e].copy()
                # the first *prompt* token never reports a prediction, even
                # behind a soft prompt (reference: tokens.py:441-449)
                lp[0] = np.nan
                rk[0] = 0
                prompt_details.append({
                    "logprob": lp,
                    "rank": rk,
                    "top_ids": np.asarray(pdet.top_ids)[i, s:e],
                    "top_logprobs": np.asarray(pdet.top_logprobs)[i, s:e],
                    "top_scores": np.asarray(pdet.top_scores)[i, s:e],
                })
        return PrefillResult(first_token=step, prompt_details=prompt_details)

    def _warmup_batch_grid(self) -> tuple[int, ...]:
        """The power-of-two prefill batch sizes the scheduler can emit
        (batcher._pick_prefill_batch rounds down to a power of two and caps
        at max_prefill_batch), so warmup covers every (n, bucket) program
        the serving loop will request (reference probes exactly these
        boundary shapes: utils/warmup.py:68-152)."""
        cap = min(self.num_slots, self.config.max_prefill_batch)
        grid, n = [], 1
        while n <= cap:
            grid.append(n)
            n *= 2
        return tuple(grid)

    def warmup(self, batch_sizes: Optional[tuple[int, ...]] = None,
               include_details: bool = False) -> None:
        """Pre-compile the decode step and the prefill buckets.

        Counterpart of the reference's PT2-compile shape-grid warmup
        (reference: server/.../utils/warmup.py:68-152): without it the first
        request on each shape pays the full XLA compile. Runs real dummy
        prefills through slot 0 and then resets all slot state.
        """
        if batch_sizes is None:
            batch_sizes = self._warmup_batch_grid()
        t0 = time.monotonic()
        n_compiles = 0
        for bucket in self.config.prefill_buckets:
            if bucket > self.max_seq:
                continue
            for n in batch_sizes:
                if n > self.num_slots:
                    continue
                slots = list(range(n))
                ids = [[1] * min(bucket, self.max_seq - 2)] * n
                for variant in ((False, True) if include_details else (False,)):
                    self.prefill(slots, ids, [RequestParams()] * n,
                                 want_prompt_details=variant)
                    n_compiles += 1
        n_compiles += self.precompile_decode()
        # execute one chunk per bucket: the first execution of a freshly
        # compiled program pays a one-time executable load that should not
        # land on the first real request
        try:
            for rows in self._ctx_bucket_grid():
                self._warmup_rows = rows
                for want_details in (False, True):
                    for chunk in self._chunk_grid():
                        self.decode_steps(want_details=want_details,
                                          chunk=chunk)
        finally:
            self._warmup_rows = None
        # reset slot state polluted by the dummy prefills
        self.state = EngineState.create(self.num_slots, self.max_seq)
        self.free_slots = list(range(self.num_slots))
        self._slot_ctx[:] = 0
        logger.info("warmup compiled %d programs in %.1fs",
                    n_compiles, time.monotonic() - t0)

    def decode(self) -> StepResult:
        """One decode step across all slots (inactive slots masked)."""
        return self.decode_steps()[0]

    def _ctx_bucket_grid(self) -> list[int]:
        """Distinct cache_rows values decode may compile (ring mode only)."""
        if self._write_mode != "ring" or self.decode_chunk == 1:
            return [self.max_seq]
        return sorted({min(b, self.max_seq)
                       for b in (self.config.decode_ctx_buckets
                                 or [self.max_seq])})

    def _pick_cache_rows(self) -> int:
        """Smallest configured context bucket covering every live slot's
        history (host mirror — no device fetch). Slots freed while a
        pipelined chunk is in flight may briefly read past the bucket on
        device; their outputs are discarded, so that is harmless."""
        if self._warmup_rows is not None:
            return self._warmup_rows
        if self._write_mode != "ring" or self.decode_chunk == 1:
            return self.max_seq
        need = int(self._slot_ctx.max(initial=0))
        for b in self._ctx_bucket_grid():
            if b >= need:
                return b
        return self.max_seq

    def _get_decode_fn(self, want_details: bool, cache_rows: int,
                       chunk: Optional[int] = None):
        chunk = self.decode_chunk if chunk is None else chunk
        key = (want_details, cache_rows, chunk)
        fn = self._decode_fns.get(key)
        if fn is None:
            write_mode = self._write_mode
            if chunk == 1:
                # ring is a chunk scheme; single-step decode uses post writes
                fn = jax.jit(
                    partial(_decode_step, self.spec, self.eos_token_id,
                            write_mode=("post" if write_mode == "ring"
                                        else write_mode),
                            want_details=want_details),
                    donate_argnums=(1, 2))
            elif write_mode == "ring":
                fn = jax.jit(
                    partial(_decode_ring_multi, self.spec, self.eos_token_id,
                            chunk, want_details=want_details,
                            cache_rows=cache_rows),
                    donate_argnums=(1, 2))
            else:
                fn = jax.jit(
                    partial(_decode_multi, self.spec, self.eos_token_id,
                            chunk, write_mode=write_mode,
                            want_details=want_details),
                    donate_argnums=(1, 2))
            # AOT-compile and cache the executable: a bare jit fn re-traces
            # on its first real call, which would land the multi-second
            # trace (and, on a cold XLA cache, the multi-minute compile)
            # inside the serving/bench hot loop when a context bucket is
            # first crossed. lower() does not execute or consume donated
            # buffers, so this is state-safe at any time.
            fn = fn.lower(self.model_params, self.cache, self.state).compile()
            self._decode_fns[key] = fn
        return fn

    def _chunk_grid(self) -> tuple[int, ...]:
        """Distinct decode chunk lengths the serving loop may request: the
        throughput chunk plus, when configured and different, the small
        streaming chunk (stream_decode_chunk caps per-token latency for
        streaming clients; see Batcher._decode_begin)."""
        chunks = {self.decode_chunk}
        sc = getattr(self.config, "stream_decode_chunk", 0)
        if sc and 1 <= sc < self.decode_chunk:
            chunks.add(sc)
        return tuple(sorted(chunks))

    def precompile_decode(self, details=(False, True)) -> int:
        """AOT-compile every decode program (context bucket x details x
        chunk variant) without running a step or touching engine state.
        Returns the number of programs materialized. Counterpart of the
        reference's decode-shape warmup (reference:
        server/.../utils/warmup.py:68-152), but ahead-of-time."""
        n = 0
        for rows in self._ctx_bucket_grid():
            for want_details in details:
                for chunk in self._chunk_grid():
                    self._get_decode_fn(want_details, rows, chunk)
                    n += 1
        return n

    def decode_steps_begin(self, want_details: bool = True,
                           chunk: Optional[int] = None):
        """Dispatch one decode chunk WITHOUT fetching its outputs.

        JAX dispatch is asynchronous: the jitted call enqueues the chunk and
        returns device futures immediately. Callers that dispatch chunk N+1
        before fetching chunk N's outputs keep the device busy across the
        host fetch round-trip — through a remote-TPU link that round-trip is
        ~30 ms (≈0.5 ms/step at chunk 64), and even on local PCIe it removes
        the dispatch gap between chunks. Returns an opaque handle for
        decode_steps_end. At most engine-state safety: self.cache/self.state
        are reassigned to the (as-yet-unmaterialized) outputs here, so any
        subsequent engine call correctly chains on this chunk.

        `chunk` overrides the number of steps for THIS dispatch (a distinct
        compiled program per length — warmup covers the grid via
        _chunk_grid); the batcher passes the small streaming chunk when a
        streaming client is active, so inter-token latency tracks the small
        chunk instead of the throughput chunk (the reference streams
        per-token: router/src/batcher.rs:972-991)."""
        chunk = self.decode_chunk if chunk is None else max(1, chunk)
        self.last_n_emitted = None   # every step row is valid for every slot
        self._apply_pending_frees()
        cache_rows = self._pick_cache_rows()
        t0 = time.monotonic_ns()
        try:
            self.cache, self.state, packed = self._get_decode_fn(
                want_details, cache_rows, chunk)(
                self.model_params, self.cache, self.state)
        except Exception as e:
            raise EngineDeviceError(f"decode dispatch failed: {e}") from e
        np.minimum(np.where(self._slot_ctx > 0,
                            self._slot_ctx + chunk, 0),
                   self.max_seq, out=self._slot_ctx)
        return (packed, chunk, t0)

    def decode_steps_end(self, handle) -> list[StepResult]:
        """Fetch the outputs of a chunk dispatched by decode_steps_begin.
        Device-side failures of the chunk surface here (dispatch never
        blocks), so this is where EngineDeviceError is raised."""
        packed, chunk, t0 = handle
        try:
            packed = jax.device_get(packed)
        except Exception as e:
            raise EngineDeviceError(f"decode step failed: {e}") from e
        if chunk == 1:
            results = [StepResult(*sampling.unpack_step_outputs(packed))]
        else:
            results = [StepResult(*sampling.unpack_step_outputs(packed[i]))
                       for i in range(chunk)]
        self.last_forward_ns = time.monotonic_ns() - t0
        return results

    def decode_steps(self, want_details: bool = True,
                     chunk: Optional[int] = None) -> list[StepResult]:
        """`decode_chunk` decode steps in one dispatch + one host fetch."""
        return self.decode_steps_end(
            self.decode_steps_begin(want_details, chunk=chunk))
