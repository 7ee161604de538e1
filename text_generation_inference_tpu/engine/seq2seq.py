"""Slot-based engine for encoder-decoder models (T5/mt0).

Same host-facing interface as `InferenceEngine` (prefill/decode/free), so
the scheduler is agnostic to model kind — mirroring how the reference's
Seq2SeqLM implements the same `Model`/`Batch` contract as CausalLM
(reference: server/.../models/seq2seq_lm.py).

Differences from the decoder-only engine:
  * prefill = encode the prompt + run the decoder over its start token,
    caching encoder cross-KV per slot;
  * the sampling "token history" for repetition penalty contains decoder
    tokens only (matching the reference, where seq2seq input_ids are decoder
    ids, seq2seq_lm.py:635-739);
  * per-prompt-token details are not supported (the external API documents
    input-token detail for decoder-only models, proto/generation.proto:141).
"""

from __future__ import annotations

import threading
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServingConfig
from ..models import t5
from ..models.t5 import T5DecodeState, T5Spec
from . import sampling
from .engine import (EngineDeviceError, EngineState, PrefillResult,
                     RequestParams, StepResult)


def _s2s_prefill_step(spec: T5Spec, eos_id: int, dec_width: int,
                      params: dict,
                      dstate: T5DecodeState, state: EngineState,
                      enc_ids: jax.Array, enc_lengths: jax.Array,
                      slots: jax.Array,
                      dec_lengths: jax.Array,                       # [N]
                      enc_prefix_embeds=None, enc_prefix_len=None,
                      dec_prefix_embeds=None, dec_prefix_len=None):
    """Encode + decoder prompt (start token [+ tuned decoder prefix]).

    `dec_width` = 1 + max decoder-prefix length (static); rows with shorter
    prefixes pad with placeholder zeros beyond their dec_lengths.
    """
    n = enc_ids.shape[0]
    t_max = state.history.shape[1]
    enc_states = t5.encode(spec, params, enc_ids, enc_lengths,
                           prefix_embeds=enc_prefix_embeds,
                           prefix_len=enc_prefix_len)
    dec_ids = jnp.zeros((n, dec_width), jnp.int32).at[:, 0].set(
        spec.decoder_start_token_id)
    logits, dstate = t5.decoder_prefill(
        spec, params, dec_ids, dec_lengths,
        enc_states, enc_lengths, slots, dstate,
        dec_prefix_embeds=dec_prefix_embeds,
        dec_prefix_len=dec_prefix_len,
        dec_prefix_start=jnp.ones((n,), jnp.int32)
        if dec_prefix_embeds is not None else None)
    rows = jnp.arange(n)
    last_logits = logits[rows, dec_lengths - 1]

    req_params = state.params.gather(slots)
    next_ids, details = sampling.next_tokens(
        last_logits, req_params,
        gen_count=jnp.zeros((n,), jnp.int32),
        token_history=dec_ids, history_len=dec_lengths,
        eos_token_id=eos_id,
        # penalty window starts after the decoder start token + tuned
        # prefix placeholders — same convention as decode steps below, and
        # matching the reference's pad-exclusion (T5's start token IS pad;
        # reference: utils/logits_process.py:93-140)
        history_start=dec_lengths)

    hist = state.history
    hist = hist.at[slots[:, None], jnp.arange(dec_width)[None, :]].set(
        dec_ids, mode="drop")
    hist = hist.at[slots, jnp.clip(dec_lengths, 0, t_max - 1)].set(
        next_ids, mode="drop")
    state = state._replace(
        history=hist,
        history_len=state.history_len.at[slots].set(dec_lengths + 1),
        hist_start=state.hist_start.at[slots].set(dec_lengths),
        input_len=state.input_len.at[slots].set(enc_lengths),
        gen_count=state.gen_count.at[slots].set(1),
        active=state.active.at[slots].set(True),
    )
    return dstate, state, sampling.pack_step_outputs(next_ids, details)


def _s2s_decode_step(spec: T5Spec, eos_id: int, params: dict,
                     dstate: T5DecodeState, state: EngineState,
                     want_details: bool = True):
    s, t_max = state.history.shape
    rows = jnp.arange(s)
    pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
    ids = state.history[rows, pos]
    logits, dstate = t5.decoder_step(spec, params, ids, pos, dstate)
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
    return dstate, state, sampling.pack_step_outputs(next_ids, details)


def _s2s_decode_multi(spec: T5Spec, eos_id: int, num_steps: int,
                      params: dict, dstate: T5DecodeState, state: EngineState,
                      want_details: bool = True):
    """`num_steps` decoder iterations in one compiled dispatch — the same
    host-sync amortization as the decoder-only engine's _decode_multi
    (tokens arrive in bursts of `decode_chunk`; host-side stopping applies
    per token afterwards)."""

    def body(carry, _):
        dstate, state = carry
        dstate, state, packed = _s2s_decode_step(spec, eos_id, params,
                                                 dstate, state,
                                                 want_details=want_details)
        return (dstate, state), packed

    (dstate, state), packed_seq = jax.lax.scan(
        body, (dstate, state), None, length=num_steps)
    return dstate, state, packed_seq


def _s2s_ring_multi(spec: T5Spec, eos_id: int, num_steps: int,
                    params: dict, dstate: T5DecodeState, state: EngineState,
                    want_details: bool = True,
                    cache_rows: Optional[int] = None):
    """Ring-buffer chunk decode for the seq2seq engine: decoder self-KV
    slabs are read-only inside the scan (in-chunk tokens live in ring
    buffers, one scatter per chunk — t5.decoder_ring_step /
    ring_flush_self_kv), eliminating the per-step full-slab copy exactly
    like the decoder-only ring path.

    `cache_rows` (static) slices the READ side of the decoder self-KV to
    its first `cache_rows` positions — one copy per chunk, amortized over
    the scan — so self-attention stops streaming dead KV rows each step
    (the seq2seq counterpart of the slot engine's context buckets; this
    was the one remaining fixed-size cache read). Correct whenever every
    active slot's decoder context at chunk entry fits in `cache_rows`;
    the chunk-end scatter still targets the full state."""
    s, t_max = state.history.shape
    rows = jnp.arange(s)
    chunk_start = jnp.clip(state.history_len - 1, 0, t_max - 1)
    if cache_rows is not None and cache_rows < dstate.self_k.shape[3]:
        read_state = dstate._replace(
            self_k=jax.lax.slice_in_dim(dstate.self_k, 0, cache_rows, axis=3),
            self_v=jax.lax.slice_in_dim(dstate.self_v, 0, cache_rows, axis=3))
    else:
        read_state = dstate
    dtype = dstate.self_k.dtype
    L = spec.num_decoder_layers
    kbuf = jnp.zeros((L, s, spec.num_heads, num_steps, spec.d_kv), dtype)
    vbuf = jnp.zeros_like(kbuf)

    def body(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        logits, k_all, v_all = t5.decoder_ring_step(
            spec, params, ids, pos, read_state, kbuf, vbuf, i, chunk_start)
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k_all[:, :, :, None, :].astype(dtype), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v_all[:, :, :, None, :].astype(dtype), (0, 0, 0, i, 0))
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
    dstate = t5.ring_flush_self_kv(dstate, kbuf, vbuf, chunk_start)
    return dstate, state, packed_seq


class Seq2SeqEngine:
    """Same surface as InferenceEngine, backed by an encoder-decoder model."""

    # see InferenceEngine.supports_decode_pipeline
    supports_decode_pipeline = True

    def __init__(self, spec: T5Spec, params: dict, config: ServingConfig,
                 eos_token_id: int):
        if config.kv_cache_dtype == "int8":
            raise ValueError(
                "kv_cache_dtype=int8 is not supported on the seq2seq engine")
        self.spec = spec
        self.model_params = params
        self.config = config
        self.eos_token_id = eos_token_id
        self.num_slots = config.max_batch_slots
        self.max_enc = config.max_sequence_length
        # decoder budget: start token + tuned decoder prefix + generated
        # tokens. A prefix longer than the slack would otherwise silently
        # clip history/self-KV writes at the tail of the generation.
        dec_prefix_budget = (config.max_prompt_prefix_length
                             if config.prefix_store_path else 0)
        self.max_dec = min(1 + dec_prefix_budget + config.max_new_tokens,
                           config.max_sequence_length)

        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        self.dstate = T5DecodeState.create(
            spec, self.num_slots, self.max_dec, self.max_enc, dtype)
        self.state = EngineState.create(self.num_slots, self.max_dec)
        self.free_slots: list[int] = list(range(self.num_slots))
        self._free_lock = threading.Lock()
        self._pending_frees: list[int] = []
        # host mirror of decoder history_len (0 = free): picks the decode
        # context bucket without a device fetch (see _pick_cache_rows)
        self._slot_ctx = np.zeros(self.num_slots, np.int32)
        self._warmup_rows: Optional[int] = None

        self.decode_chunk = max(1, config.decode_chunk)
        # decode programs per want_details: the no-details variant skips
        # log_softmax/top-k/rank for every slot every step — the same
        # saving the slot engine's no-details program provides (round-2
        # review: seq2seq always paid the details cost)
        self._decode_fns: dict[bool, Any] = {}
        self._prefill_fns: dict[Any, Any] = {}
        self.last_forward_ns = 0
        self.last_n_emitted = None

    def reset(self) -> None:
        """Rebuild device state after an EngineDeviceError (see
        InferenceEngine.reset)."""
        dtype = self.dstate.self_k.dtype
        self.dstate = T5DecodeState.create(
            self.spec, self.num_slots, self.max_dec, self.max_enc, dtype)
        self.state = EngineState.create(self.num_slots, self.max_dec)
        self.free_slots = list(range(self.num_slots))
        with self._free_lock:
            self._pending_frees.clear()
        self._slot_ctx[:] = 0

    def warmup(self, batch_sizes: tuple[int, ...] = (1,), **_) -> None:
        """Pre-compile the prefill buckets + the decode chunk (counterpart
        of InferenceEngine.warmup; without it the first requests pay the
        full XLA compiles)."""
        t0 = time.monotonic()
        n_compiles = 0
        for bucket in self.config.prefill_buckets:
            if bucket > self.max_enc:
                continue
            for n in batch_sizes:
                if n > self.num_slots:
                    continue
                slots = list(range(n))
                ids = [[1] * min(bucket, self.max_enc - 1)] * n
                self.prefill(slots, ids, [RequestParams()] * n)
                n_compiles += 1
        n_compiles += self.precompile_decode()
        # execute one chunk per (bucket, details) program: the first
        # execution of a fresh executable pays a one-time load that should
        # not land on the first real request
        try:
            for rows in self._ctx_bucket_grid():
                self._warmup_rows = rows
                for want_details in (False, True):
                    self.decode_steps(want_details=want_details)
        finally:
            self._warmup_rows = None
        self.reset()
        import logging

        logging.getLogger(__name__).info(
            "seq2seq warmup compiled %d programs in %.1fs",
            n_compiles, time.monotonic() - t0)

    @property
    def num_active(self) -> int:
        return self.num_slots - len(self.free_slots)

    def acquire_slot(self) -> Optional[int]:
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot: int) -> None:
        with self._free_lock:
            self._pending_frees.append(slot)
        self.free_slots.append(slot)

    def _apply_pending_frees(self) -> None:
        with self._free_lock:
            pending, self._pending_frees = self._pending_frees, []
        if pending:
            slots = jnp.asarray(pending, jnp.int32)
            self.state = self.state._replace(
                active=self.state.active.at[slots].set(False))
            self._slot_ctx[np.asarray(pending)] = 0

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
        for slot, rp in zip(slots, request_params):
            self.set_request_params(slot, rp)
        entries = prefix_embeds or [None] * n
        enc_pre = [getattr(e, "encoder", None) for e in entries]
        dec_pre = [getattr(e, "decoder", None) for e in entries]
        enc_plens = [0 if p is None else int(p.shape[0]) for p in enc_pre]
        dec_plens = [0 if p is None else int(p.shape[0]) for p in dec_pre]

        enc_total = [pl + len(t) for pl, t in zip(enc_plens, token_ids)]
        bucket = self.config.bucket_for(max(enc_total))
        ids = np.zeros((n, bucket), np.int32)
        for i, toks in enumerate(token_ids):
            ids[i, enc_plens[i]: enc_plens[i] + len(toks)] = toks
        enc_lengths = np.asarray(enc_total, np.int32)
        dec_width = 1 + max(dec_plens + [0])
        dec_lengths = np.asarray([1 + p for p in dec_plens], np.int32)

        has_enc = any(enc_plens)
        has_dec = any(dec_plens)
        dim = self.spec.d_model
        enc_emb = dec_emb = None
        if has_enc:
            arr = np.zeros((n, bucket, dim), np.float32)
            for i, p in enumerate(enc_pre):
                if p is not None:
                    arr[i, : p.shape[0]] = p
            enc_emb = jnp.asarray(arr)
        if has_dec:
            arr = np.zeros((n, dec_width, dim), np.float32)
            for i, p in enumerate(dec_pre):
                if p is not None:
                    arr[i, 1: 1 + p.shape[0]] = p
            dec_emb = jnp.asarray(arr)

        key = (n, bucket, dec_width, has_enc, has_dec)
        fn = self._prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(partial(_s2s_prefill_step, self.spec,
                                 self.eos_token_id, dec_width),
                         donate_argnums=(1, 2))
            self._prefill_fns[key] = fn
        t0 = time.monotonic_ns()
        kwargs = {}
        if has_enc:
            kwargs["enc_prefix_embeds"] = enc_emb
            kwargs["enc_prefix_len"] = jnp.asarray(enc_plens, jnp.int32)
        if has_dec:
            kwargs["dec_prefix_embeds"] = dec_emb
            kwargs["dec_prefix_len"] = jnp.asarray(dec_plens, jnp.int32)
        try:
            self.dstate, self.state, packed = fn(
                self.model_params, self.dstate, self.state,
                jnp.asarray(ids), jnp.asarray(enc_lengths),
                jnp.asarray(slots, jnp.int32), jnp.asarray(dec_lengths),
                **kwargs)
            packed = jax.device_get(packed)
        except Exception as e:
            raise EngineDeviceError(f"seq2seq prefill failed: {e}") from e
        # decoder history after prefill: start token + tuned prefix + the
        # first sampled token (history_len = dec_lengths + 1)
        self._slot_ctx[np.asarray(slots)] = dec_lengths + 1
        step = StepResult(*sampling.unpack_step_outputs(packed))
        self.last_forward_ns = time.monotonic_ns() - t0
        return PrefillResult(first_token=step, prompt_details=None)

    def decode(self) -> StepResult:
        return self.decode_steps()[0]

    def _ctx_bucket_grid(self) -> list[int]:
        """Distinct self-KV cache_rows values decode may compile (ring mode
        only; see InferenceEngine._ctx_bucket_grid)."""
        if self.config.decode_write_mode != "ring" or self.decode_chunk == 1:
            return [self.max_dec]
        return sorted({min(b, self.max_dec)
                       for b in (self.config.decode_ctx_buckets
                                 or [self.max_dec])})

    def _pick_cache_rows(self) -> int:
        """Smallest configured decoder-context bucket covering every live
        slot's history (host mirror — no device fetch)."""
        if self._warmup_rows is not None:
            return self._warmup_rows
        if self.config.decode_write_mode != "ring" or self.decode_chunk == 1:
            return self.max_dec
        need = int(self._slot_ctx.max(initial=0))
        for b in self._ctx_bucket_grid():
            if b >= need:
                return b
        return self.max_dec

    def _get_decode_fn(self, want_details: bool, cache_rows: int):
        key = (want_details, cache_rows)
        fn = self._decode_fns.get(key)
        if fn is None:
            if self.decode_chunk == 1:
                fn = jax.jit(
                    partial(_s2s_decode_step, self.spec, self.eos_token_id,
                            want_details=want_details),
                    donate_argnums=(1, 2))
            elif self.config.decode_write_mode == "ring":
                fn = jax.jit(
                    partial(_s2s_ring_multi, self.spec, self.eos_token_id,
                            self.decode_chunk, want_details=want_details,
                            cache_rows=cache_rows),
                    donate_argnums=(1, 2))
            else:
                fn = jax.jit(
                    partial(_s2s_decode_multi, self.spec, self.eos_token_id,
                            self.decode_chunk, want_details=want_details),
                    donate_argnums=(1, 2))
            # AOT-compile so a first-crossed context bucket never traces or
            # compiles inside the serving loop (see InferenceEngine)
            fn = fn.lower(self.model_params, self.dstate,
                          self.state).compile()
            self._decode_fns[key] = fn
        return fn

    def precompile_decode(self, details=(False, True)) -> int:
        """AOT-compile every decode program (decoder context bucket x
        details variant). Returns the number of programs materialized."""
        n = 0
        for rows in self._ctx_bucket_grid():
            for want_details in details:
                self._get_decode_fn(want_details, rows)
                n += 1
        return n

    def decode_steps_begin(self, want_details: bool = True):
        """Dispatch one decoder chunk without fetching (see
        InferenceEngine.decode_steps_begin — same two-phase pipelining
        contract)."""
        self.last_n_emitted = None
        self._apply_pending_frees()
        cache_rows = self._pick_cache_rows()
        t0 = time.monotonic_ns()
        try:
            self.dstate, self.state, packed = self._get_decode_fn(
                want_details, cache_rows)(
                self.model_params, self.dstate, self.state)
        except Exception as e:
            raise EngineDeviceError(
                f"seq2seq decode dispatch failed: {e}") from e
        np.minimum(np.where(self._slot_ctx > 0,
                            self._slot_ctx + self.decode_chunk, 0),
                   self.max_dec, out=self._slot_ctx)
        return (packed, self.decode_chunk, t0)

    def decode_steps_end(self, handle) -> list[StepResult]:
        packed, chunk, t0 = handle
        try:
            packed = jax.device_get(packed)
        except Exception as e:
            raise EngineDeviceError(f"seq2seq decode failed: {e}") from e
        if chunk == 1:
            results = [StepResult(*sampling.unpack_step_outputs(packed))]
        else:
            results = [StepResult(*sampling.unpack_step_outputs(packed[i]))
                       for i in range(chunk)]
        self.last_forward_ns = time.monotonic_ns() - t0
        return results

    def decode_steps(self, want_details: bool = True) -> list[StepResult]:
        """`decode_chunk` decoder steps in one dispatch + one host fetch;
        the no-details program variant skips logprob/top-k/rank work."""
        return self.decode_steps_end(self.decode_steps_begin(want_details))
