"""Paged-KV inference engine: page-pool capacity instead of slot-length
reservation.

Counterpart of the reference's PagedCausalLM (reference:
server/.../models/paged_causal_lm.py): the KV pool is sized from the HBM
budget (reference derives total_num_gpu_blocks from the fitted memory model,
paged_causal_lm.py:308-336 — here it is closed-form), requests reserve
exactly ceil((input + max_new) / page_size) pages at admission, and the
scheduler's admission question becomes "are there enough free pages", the
token-weight cost model of the reference's router (batch_types.rs FlashBatch)
realized as page accounting.

Host-facing interface matches InferenceEngine, plus `has_capacity()` which
the batcher consults before admitting.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServingConfig
from ..models import core, paged_core
from ..ops import linear as linops
from ..models.core import DecoderSpec
from . import sampling
from .engine import (EngineDeviceError, EngineState, PrefillResult,
                     RequestParams, StepResult)
from .memory import device_hbm_bytes, tree_bytes
from .paged_cache import PageAllocator, PagedKVCache

logger = logging.getLogger(__name__)


def _paged_decode_step(spec: DecoderSpec, eos_id: int, page_size: int,
                       params: dict, cache: PagedKVCache, state: EngineState,
                       want_details: bool = True, mesh=None):
    s, t_max = state.history.shape
    params = linops.prepare_params(params, rows=s)
    rows = jnp.arange(s)
    pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
    ids = state.history[rows, pos]
    logits, cache = paged_core.decode_paged(
        spec, params, ids, pos, cache, pos + 1, page_size,
        active=state.active, mesh=mesh)
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


def _paged_decode_multi(spec, eos_id, page_size, num_steps,
                        params, cache, state, want_details=True, mesh=None):
    params = linops.prepare_params(
        params, rows=state.history.shape[0])   # once, outside the scan

    def body(carry, _):
        cache, state = carry
        cache, state, packed = _paged_decode_step(
            spec, eos_id, page_size, params, cache, state,
            want_details=want_details, mesh=mesh)
        return (cache, state), packed

    (cache, state), packed_seq = jax.lax.scan(
        body, (cache, state), None, length=num_steps)
    return cache, state, packed_seq


def _paged_ring_multi(spec: DecoderSpec, eos_id: int, page_size: int,
                      num_steps: int, params: dict,
                      cache: PagedKVCache, state: EngineState,
                      want_details: bool = True, mesh=None,
                      live_pages: int = None, gather_ctx_max: int = 0):
    """Ring-buffer chunk decode over the paged pool: the pool is read-only
    inside the scan; ONE block-table scatter per chunk replaces the
    per-step full-pool copy.

    Two attention implementations, picked statically per live-page bucket:
    dense-gather (bucket <= gather_ctx_max tokens) collects the live pages
    into a dense [L,S,K,R,D] view once per chunk and runs the slot
    engine's XLA ring step — no per-(layer, step) kernel launches, which
    dominate at serving shapes; bigger buckets use the Pallas paged kernel
    + flash-decoding merge (decode_paged_ring_step), which streams pages
    without materializing the dense copy."""
    s, t_max = state.history.shape
    params = linops.prepare_params(params, rows=s)
    rows = jnp.arange(s)
    chunk_start = jnp.clip(state.history_len - 1, 0, t_max - 1)
    active0 = state.active     # constant within a chunk (frees apply between)
    # in-chunk ring buffers stay full precision over an int8 pool (they are
    # tiny; quantization happens once at the chunk-end flush — same scheme
    # as the slot engine's _decode_ring_multi)
    buf_dtype = (params["embed_tokens"].dtype
                 if cache.quantized else cache.k.dtype)
    kbuf = jnp.zeros((spec.num_layers, s, spec.num_kv_heads, num_steps,
                      spec.head_dim), buf_dtype)
    vbuf = jnp.zeros_like(kbuf)
    dense = (live_pages is not None
             and live_pages * page_size <= gather_ctx_max)
    dense_cache = (paged_core.gather_dense_view(cache, live_pages, page_size)
                   if dense else None)

    def body(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        if dense:
            logits, k_all, v_all = core.decode_ring_step(
                spec, params, ids, pos, dense_cache, kbuf, vbuf,
                i, chunk_start)
        else:
            logits, k_all, v_all = paged_core.decode_paged_ring_step(
                spec, params, ids, pos, cache, kbuf, vbuf, i, chunk_start,
                page_size=page_size, mesh=mesh, live_pages=live_pages)
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k_all[:, :, :, None, :].astype(buf_dtype), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v_all[:, :, :, None, :].astype(buf_dtype), (0, 0, 0, i, 0))
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
        return (kbuf, vbuf, state), sampling.pack_step_outputs(next_ids,
                                                               details)

    (kbuf, vbuf, state), packed_seq = jax.lax.scan(
        body, (kbuf, vbuf, state), jnp.arange(num_steps, dtype=jnp.int32))
    cache = paged_core.paged_ring_flush(
        cache, kbuf, vbuf, chunk_start, active0, t_max, page_size)
    return cache, state, packed_seq


def _paged_prefill_step(spec: DecoderSpec, eos_id: int, page_size: int,
                        want_prompt_details: bool,
                        params: dict, cache: PagedKVCache, state: EngineState,
                        ids: jax.Array, lengths: jax.Array, slots: jax.Array,
                        prefix_len: jax.Array,
                        prefix_embeds: Optional[jax.Array] = None):
    # no prepare_params in prefill: lane-major int4 converts per layer
    # inside the scan instead (see engine._prefill_step note)
    n, b = ids.shape
    t_max = state.history.shape[1]
    logits_all, cache = paged_core.prefill_paged(
        spec, params, ids, lengths, slots, cache, page_size,
        prefix_embeds=prefix_embeds,
        prefix_len=prefix_len if prefix_embeds is not None else None)
    rows = jnp.arange(n)
    last_logits = logits_all[rows, lengths - 1]

    req_params = state.params.gather(slots)
    next_ids, details = sampling.next_tokens(
        last_logits, req_params, jnp.zeros((n,), jnp.int32),
        ids, lengths, eos_id, history_start=prefix_len)

    hist = state.history
    hist = hist.at[slots[:, None], jnp.arange(b)[None, :]].set(ids, mode="drop")
    hist = hist.at[slots, jnp.clip(lengths, 0, t_max - 1)].set(next_ids,
                                                               mode="drop")
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


class PagedInferenceEngine:
    """Slot batch + paged KV pool; admission is page accounting."""

    # see InferenceEngine.supports_decode_pipeline
    supports_decode_pipeline = True
    # see InferenceEngine.supports_chunk_override
    supports_chunk_override = True

    def __init__(self, spec: DecoderSpec, params: dict, config: ServingConfig,
                 eos_token_id: int, num_pages: Optional[int] = None,
                 mesh=None):
        if config.kv_cache_dtype == "int8":
            # int8 KV rides the ring-chunk scheme (quantize once at the
            # chunk flush); the per-step write paths have no scale plumbing
            if config.decode_write_mode != "ring" or config.decode_chunk < 2:
                raise ValueError(
                    "kv_cache_dtype=int8 requires the ring decode path "
                    "(decode_write_mode=ring, decode_chunk > 1)")
            if config.stream_decode_chunk == 1:
                raise ValueError(
                    "kv_cache_dtype=int8 requires stream_decode_chunk != 1 "
                    "(the single-step decode program has no int8 write "
                    "path); use 0 or >= 2")
        if spec.sliding_window is not None \
                and config.max_sequence_length > spec.sliding_window:
            # paged attention has no window mask yet; within the window the
            # full-attention math is identical, so short max_seq is exact
            raise ValueError(
                f"sliding-window attention (window={spec.sliding_window}) "
                f"with max_sequence_length={config.max_sequence_length} > "
                "window is only supported on the slot engine "
                "(PAGED_ATTENTION=0)")
        self.spec = spec
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            config.fuse_matmuls = False
        if config.fuse_matmuls:
            from ..models.fuse import fuse_params

            params = fuse_params(spec, params)
        params = linops.prepare_storage(params)   # int4 -> lane-major once
        self.model_params = params
        self.config = config
        self.eos_token_id = eos_token_id
        self.num_slots = config.max_batch_slots
        self.max_seq = config.max_sequence_length
        self.page_size = config.kv_page_size

        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        cache_dtype = jnp.int8 if config.kv_cache_dtype == "int8" else dtype
        if num_pages is None:
            num_pages = self._pool_size_from_hbm(cache_dtype)
        max_pages_per_slot = -(-self.max_seq // self.page_size)
        self.allocator = PageAllocator(num_pages, self.page_size,
                                       max_pages_per_slot)
        self.cache = PagedKVCache.create(
            spec, num_pages, self.page_size, self.num_slots,
            max_pages_per_slot, cache_dtype)
        self.state = EngineState.create(self.num_slots, self.max_seq)
        if mesh is not None:
            from ..parallel import sharding as shd

            specs = shd.param_specs(spec, self.model_params, mesh)
            self.model_params = shd.shard_params(self.model_params, specs, mesh)
            self.cache = shd.shard_paged_cache(self.cache, spec, mesh)
            self.state = shd.replicate(self.state, mesh)
        self.free_slots: list[int] = list(range(self.num_slots))
        # free() runs on the event-loop thread while decode dispatch runs on
        # the executor thread (pipelined decode) — guard the pending list
        self._free_lock = threading.Lock()
        self._pending_frees: list[int] = []
        # host mirror of the block table (avoids a device fetch per prefill);
        # unmapped entries carry the OOB sentinel so overrun writes drop
        # (see PagedKVCache.create)
        self._bt_host = np.full((self.num_slots, max_pages_per_slot),
                                num_pages, np.int32)
        # host mirror of history_len (0 = free) for the live-page bucket
        # pick; mutated only on the engine-call thread (see InferenceEngine)
        self._slot_ctx = np.zeros(self.num_slots, np.int32)
        self._warmup_pages = None

        logger.info("paged KV pool: %d pages x %d tokens (%.2f GiB)",
                    num_pages, self.page_size,
                    2 * tree_bytes({"k": self.cache.k}) / 1024 ** 3)

        self.decode_chunk = max(1, config.decode_chunk)
        self._write_mode = config.decode_write_mode
        self._decode_fns: dict[bool, Any] = {}
        self._prefill_fns: dict[Any, Any] = {}
        self.last_forward_ns = 0
        self.last_n_emitted = None

    def _page_bucket_grid(self) -> list:
        """Distinct live-page values decode may compile: powers of two up
        to the per-slot table width (ring mode only)."""
        mp = self.allocator.max_pages_per_slot
        if self._write_mode != "ring" or self.decode_chunk == 1:
            return [mp]
        grid, b = [], 1
        while b < mp:
            grid.append(b)
            b *= 2
        grid.append(mp)
        return grid

    def _pick_live_pages(self) -> int:
        """Smallest page bucket covering every live slot's pre-chunk
        context (host mirror; freed-slot staleness is read-only safe —
        the kernel clamps to the sliced table and outputs are discarded)."""
        if self._warmup_pages is not None:
            return self._warmup_pages
        mp = self.allocator.max_pages_per_slot
        if self._write_mode != "ring" or self.decode_chunk == 1:
            return mp
        need = -(-int(self._slot_ctx.max(initial=0)) // self.page_size)
        for b in self._page_bucket_grid():
            if b >= need:
                return b
        return mp

    def _chunk_grid(self) -> tuple:
        """See InferenceEngine._chunk_grid: throughput chunk + optional
        small streaming chunk."""
        chunks = {self.decode_chunk}
        sc = getattr(self.config, "stream_decode_chunk", 0)
        if sc and 1 <= sc < self.decode_chunk:
            chunks.add(sc)
        return tuple(sorted(chunks))

    def precompile_decode(self, details=(False, True)) -> int:
        """AOT-compile every decode program (live-page bucket x details x
        chunk variant) without running a step or touching engine state (see
        InferenceEngine.precompile_decode)."""
        n = 0
        for pages in self._page_bucket_grid():
            for want_details in details:
                for chunk in self._chunk_grid():
                    self._get_decode_fn(want_details, pages, chunk)
                    n += 1
        return n

    def _get_decode_fn(self, want_details: bool, live_pages: int,
                       chunk=None):
        chunk = self.decode_chunk if chunk is None else chunk
        key = (want_details, live_pages, chunk)
        fn = self._decode_fns.get(key)
        if fn is None:
            if chunk == 1:
                fn = jax.jit(
                    partial(_paged_decode_step, self.spec, self.eos_token_id,
                            self.page_size, want_details=want_details,
                            mesh=self.mesh),
                    donate_argnums=(1, 2))
            elif self._write_mode == "ring":
                fn = jax.jit(
                    partial(_paged_ring_multi, self.spec, self.eos_token_id,
                            self.page_size, chunk,
                            want_details=want_details, mesh=self.mesh,
                            live_pages=live_pages,
                            gather_ctx_max=self.config.paged_gather_ctx_max),
                    donate_argnums=(1, 2))
            else:
                fn = jax.jit(
                    partial(_paged_decode_multi, self.spec, self.eos_token_id,
                            self.page_size, chunk,
                            want_details=want_details, mesh=self.mesh),
                    donate_argnums=(1, 2))
            # AOT-compile now (state-safe: lower() neither executes nor
            # consumes donated buffers) so crossing into a new live-page
            # bucket never traces/compiles inside the serving hot loop
            fn = fn.lower(self.model_params, self.cache, self.state).compile()
            self._decode_fns[key] = fn
        return fn

    def reset(self) -> None:
        """Rebuild pool/state after an EngineDeviceError (see
        InferenceEngine.reset): donated buffers are undefined; all pages
        and slots become free."""
        dtype = self.cache.k.dtype
        self.cache = PagedKVCache.create(
            self.spec, self.allocator.num_pages, self.page_size,
            self.num_slots, self.allocator.max_pages_per_slot, dtype)
        self.allocator = PageAllocator(self.allocator.num_pages,
                                       self.page_size,
                                       self.allocator.max_pages_per_slot)
        self.state = EngineState.create(self.num_slots, self.max_seq)
        if self.mesh is not None:
            from ..parallel import sharding as shd

            self.cache = shd.shard_paged_cache(self.cache, self.spec,
                                               self.mesh)
            self.state = shd.replicate(self.state, self.mesh)
        self.free_slots = list(range(self.num_slots))
        with self._free_lock:
            self._pending_frees.clear()
        self._bt_host[:] = self.allocator.num_pages
        self._slot_ctx[:] = 0
        logger.warning("paged engine device state reset (all slots cleared)")

    def _warmup_batch_grid(self) -> tuple[int, ...]:
        """See InferenceEngine._warmup_batch_grid."""
        cap = min(self.num_slots, self.config.max_prefill_batch)
        grid, n = [], 1
        while n <= cap:
            grid.append(n)
            n *= 2
        return tuple(grid)

    def warmup(self, batch_sizes: Optional[tuple[int, ...]] = None,
               include_details: bool = False) -> None:
        """Pre-compile prefill buckets + both decode variants (counterpart
        of InferenceEngine.warmup — without it the first requests pay the
        multi-minute XLA compiles)."""
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
                prompt_len = min(bucket, self.max_seq - 2)
                # reserving n full buckets can exceed the pool even though
                # the (n, bucket) program is reachable at serve time (short
                # prompts pad to the bucket but reserve fewer pages) — warm
                # with the shortest prompts that still hit the bucket
                pages_full = n * self.allocator.pages_needed(prompt_len + 2)
                if pages_full > self.allocator.num_free:
                    smaller = [b for b in self.config.prefill_buckets
                               if b < bucket]
                    prompt_len = (smaller[-1] + 1) if smaller else 1
                    if n * self.allocator.pages_needed(prompt_len + 2) \
                            > self.allocator.num_free:
                        logger.info("warmup: skipping (n=%d, bucket=%d) — "
                                    "exceeds pool", n, bucket)
                        continue
                ids = [[1] * prompt_len] * n
                rps = [RequestParams(max_new_tokens=1)] * n
                for variant in ((False, True) if include_details else (False,)):
                    self.prefill(slots, ids, rps, want_prompt_details=variant)
                    n_compiles += 1
                for slot in slots:
                    self.free(slot)
        n_compiles += self.precompile_decode()
        # execute one chunk per bucket: the first execution of a freshly
        # compiled program pays a one-time executable load that should not
        # land on the first real request
        try:
            for pages in self._page_bucket_grid():
                self._warmup_pages = pages
                for want_details in (False, True):
                    for chunk in self._chunk_grid():
                        # every chunk variant incl. the streaming chunk —
                        # a first streaming request must not pay the
                        # executable load (measured: a ~10-20s stall that
                        # queues every open-loop arrival behind it)
                        self.decode_steps(want_details=want_details,
                                          chunk=chunk)
        finally:
            self._warmup_pages = None
        self.reset()
        logger.info("paged warmup compiled %d programs in %.1fs",
                    n_compiles, time.monotonic() - t0)

    def _pool_size_from_hbm(self, dtype) -> int:
        hbm = device_hbm_bytes()
        # int8 pools carry f32 scale rows: +4 bytes per (layer, kv-head,
        # token) on top of head_dim int8 values
        scale_b = 4 if jnp.dtype(dtype) == jnp.int8 else 0
        bytes_per_page = (self.spec.num_layers * 2 * self.page_size
                          * self.spec.num_kv_heads
                          * (self.spec.head_dim * jnp.dtype(dtype).itemsize
                             + scale_b))
        params_b = tree_bytes(self.model_params)
        bucket = self.config.prefill_buckets[-1]
        act = bucket * (self.spec.hidden_size * 6
                        + self.spec.intermediate_size * 3) * 4
        act += bucket * self.spec.vocab_size * 4
        # dense-gather ring decode materializes a per-chunk KV view of up
        # to paged_gather_ctx_max tokens per slot (k + v) — reserve it
        gather_rows = min(self.config.paged_gather_ctx_max, self.max_seq)
        gather_b = (self.spec.num_layers * 2 * self.num_slots * gather_rows
                    * self.spec.num_kv_heads
                    * (self.spec.head_dim * jnp.dtype(dtype).itemsize
                       + scale_b))
        usable = int(hbm * (1 - self.config.batch_safety_margin)) \
            - params_b - act - gather_b
        pages = max(usable // bytes_per_page,
                    self.num_slots * 2)
        # at least enough for one max-length sequence...
        pages = max(pages, -(-self.max_seq // self.page_size))
        # ...and never more than every slot's worst case can consume — a
        # bigger pool is pure HBM waste the allocator can never hand out
        worst_case = self.num_slots * (-(-self.max_seq // self.page_size))
        pages = min(pages, worst_case)
        env = os.getenv("PAGED_POOL_PAGES")
        if env:
            pages = int(env)
        return int(pages)

    # -- capacity -----------------------------------------------------------

    @property
    def num_active(self) -> int:
        return self.num_slots - len(self.free_slots)

    def has_capacity(self, total_tokens: int) -> bool:
        return bool(self.free_slots) and self.allocator.can_allocate(total_tokens)

    def acquire_slot(self) -> Optional[int]:
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot: int) -> None:
        with self._free_lock:
            self._pending_frees.append(slot)
        self.free_slots.append(slot)
        self.allocator.free(slot)
        # stale page ids in the freed row must never be written through again
        self._bt_host[slot] = self.allocator.num_pages

    def _apply_pending_frees(self) -> None:
        with self._free_lock:
            pending, self._pending_frees = self._pending_frees, []
        if pending:
            self._slot_ctx[np.asarray(pending)] = 0
            slots = jnp.asarray(pending, jnp.int32)
            self.state = self.state._replace(
                active=self.state.active.at[slots].set(False))

    # -- steps --------------------------------------------------------------

    def set_request_params(self, slot: int, rp: RequestParams) -> None:
        self.state = self.state._replace(
            params=self.state.params.write_slot(
                slot, temperature=rp.temperature, top_k=rp.top_k,
                top_p=rp.top_p, typical_p=rp.typical_p,
                repetition_penalty=rp.repetition_penalty,
                lp_start=rp.lp_start, lp_decay=rp.lp_decay,
                min_new_tokens=rp.min_new_tokens, seed=rp.seed))

    def prefill(self, slots, token_ids, request_params,
                want_prompt_details: bool = False,
                prefix_embeds=None) -> PrefillResult:
        n = len(slots)
        self._apply_pending_frees()
        pe_list = prefix_embeds or [None] * n
        pe_list = [getattr(p, "decoder", p) for p in pe_list]
        prefix_lens = [0 if p is None else int(p.shape[0]) for p in pe_list]
        total_lens = [pl + len(t) for pl, t in zip(prefix_lens, token_ids)]
        # allocate pages for the whole potential sequence of each request
        for slot, total, rp in zip(slots, total_lens, request_params):
            pages = self.allocator.allocate(
                slot, total + rp.max_new_tokens + 1)
            row = np.full((self.allocator.max_pages_per_slot,),
                          self.allocator.num_pages, np.int32)
            row[: len(pages)] = pages
            self._bt_host[slot] = row
            self.set_request_params(slot, rp)
        self.cache = self.cache._replace(block_table=jnp.asarray(self._bt_host))

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

        key = (n, bucket, want_prompt_details, has_prefix)
        fn = self._prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(partial(_paged_prefill_step, self.spec,
                                 self.eos_token_id, self.page_size,
                                 want_prompt_details),
                         donate_argnums=(1, 2))
            self._prefill_fns[key] = fn
        t0 = time.monotonic_ns()
        args = [self.model_params, self.cache, self.state,
                jnp.asarray(ids), jnp.asarray(lengths),
                jnp.asarray(slots, jnp.int32),
                jnp.asarray(prefix_lens, jnp.int32)]
        if has_prefix:
            args.append(embeds_arg)
        try:
            self.cache, self.state, packed, pdet = fn(*args)
            packed = jax.device_get(packed)
        except Exception as e:
            raise EngineDeviceError(f"paged prefill failed: {e}") from e
        self._slot_ctx[np.asarray(slots)] = lengths + 1
        step = StepResult(*sampling.unpack_step_outputs(packed))
        self.last_forward_ns = time.monotonic_ns() - t0

        prompt_details = None
        if want_prompt_details:
            prompt_details = []
            for i in range(n):
                s0, e0 = prefix_lens[i], total_lens[i]
                lp = np.asarray(pdet.logprob)[i, s0:e0].copy()
                rk = np.asarray(pdet.rank)[i, s0:e0].copy()
                # the first prompt token never reports a prediction
                # (reference: tokens.py:441-449)
                lp[0] = np.nan
                rk[0] = 0
                prompt_details.append({
                    "logprob": lp,
                    "rank": rk,
                    "top_ids": np.asarray(pdet.top_ids)[i, s0:e0],
                    "top_logprobs": np.asarray(pdet.top_logprobs)[i, s0:e0],
                    "top_scores": np.asarray(pdet.top_scores)[i, s0:e0],
                })
        return PrefillResult(first_token=step, prompt_details=prompt_details)

    def decode(self) -> StepResult:
        return self.decode_steps()[0]

    def decode_steps_begin(self, want_details: bool = True, chunk=None):
        """Dispatch one decode chunk without fetching (see
        InferenceEngine.decode_steps_begin — same two-phase pipelining
        contract; callers overlap chunk N+1's compute with chunk N's host
        fetch). `chunk` overrides this dispatch's step count (stream-aware
        chunking; see InferenceEngine.decode_steps_begin)."""
        chunk = self.decode_chunk if chunk is None else max(1, chunk)
        self.last_n_emitted = None
        self._apply_pending_frees()
        live_pages = self._pick_live_pages()
        t0 = time.monotonic_ns()
        try:
            self.cache, self.state, packed = self._get_decode_fn(
                want_details, live_pages, chunk)(
                self.model_params, self.cache, self.state)
        except Exception as e:
            raise EngineDeviceError(f"paged decode dispatch failed: {e}") from e
        np.minimum(np.where(self._slot_ctx > 0,
                            self._slot_ctx + chunk, 0),
                   self.max_seq, out=self._slot_ctx)
        return (packed, chunk, t0)

    def decode_steps_end(self, handle) -> list[StepResult]:
        packed, chunk, t0 = handle
        try:
            packed = jax.device_get(packed)
        except Exception as e:
            raise EngineDeviceError(f"paged decode failed: {e}") from e
        if chunk == 1:
            results = [StepResult(*sampling.unpack_step_outputs(packed))]
        else:
            results = [StepResult(*sampling.unpack_step_outputs(packed[i]))
                       for i in range(chunk)]
        self.last_forward_ns = time.monotonic_ns() - t0
        return results

    def decode_steps(self, want_details: bool = True,
                     chunk=None) -> list[StepResult]:
        return self.decode_steps_end(
            self.decode_steps_begin(want_details, chunk=chunk))
