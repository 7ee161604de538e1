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
from .engine import EngineState, PrefillResult, RequestParams, StepResult


def _s2s_prefill_step(spec: T5Spec, eos_id: int, params: dict,
                      dstate: T5DecodeState, state: EngineState,
                      enc_ids: jax.Array, enc_lengths: jax.Array,
                      slots: jax.Array):
    n = enc_ids.shape[0]
    t_max = state.history.shape[1]
    enc_states = t5.encode(spec, params, enc_ids, enc_lengths)
    dec_ids = jnp.full((n, 1), spec.decoder_start_token_id, jnp.int32)
    logits, dstate = t5.decoder_prefill(
        spec, params, dec_ids, jnp.ones((n,), jnp.int32),
        enc_states, enc_lengths, slots, dstate)
    last_logits = logits[:, 0]

    req_params = state.params.gather(slots)
    next_ids, details = sampling.next_tokens(
        last_logits, req_params,
        gen_count=jnp.zeros((n,), jnp.int32),
        token_history=dec_ids, history_len=jnp.ones((n,), jnp.int32),
        eos_token_id=eos_id)

    hist = state.history
    hist = hist.at[slots, 0].set(jnp.full((n,), spec.decoder_start_token_id,
                                          jnp.int32))
    hist = hist.at[slots, 1].set(next_ids)
    state = state._replace(
        history=hist,
        history_len=state.history_len.at[slots].set(2),
        hist_start=state.hist_start.at[slots].set(0),
        input_len=state.input_len.at[slots].set(enc_lengths),
        gen_count=state.gen_count.at[slots].set(1),
        active=state.active.at[slots].set(True),
    )
    return dstate, state, sampling.pack_step_outputs(next_ids, details)


def _s2s_decode_step(spec: T5Spec, eos_id: int, params: dict,
                     dstate: T5DecodeState, state: EngineState):
    s, t_max = state.history.shape
    rows = jnp.arange(s)
    pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
    ids = state.history[rows, pos]
    logits, dstate = t5.decoder_step(spec, params, ids, pos, dstate)
    next_ids, details = sampling.next_tokens(
        logits, state.params, state.gen_count, state.history,
        state.history_len, eos_id)
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


class Seq2SeqEngine:
    """Same surface as InferenceEngine, backed by an encoder-decoder model."""

    def __init__(self, spec: T5Spec, params: dict, config: ServingConfig,
                 eos_token_id: int):
        self.spec = spec
        self.model_params = params
        self.config = config
        self.eos_token_id = eos_token_id
        self.num_slots = config.max_batch_slots
        self.max_enc = config.max_sequence_length
        self.max_dec = min(config.max_new_tokens + 8, config.max_sequence_length)

        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        self.dstate = T5DecodeState.create(
            spec, self.num_slots, self.max_dec, self.max_enc, dtype)
        self.state = EngineState.create(self.num_slots, self.max_dec)
        self.free_slots: list[int] = list(range(self.num_slots))
        self._pending_frees: list[int] = []

        self._decode_fn = jax.jit(
            partial(_s2s_decode_step, spec, eos_token_id),
            donate_argnums=(1, 2))
        self._prefill_fns: dict[Any, Any] = {}
        self.last_forward_ns = 0

    @property
    def num_active(self) -> int:
        return self.num_slots - len(self.free_slots)

    def acquire_slot(self) -> Optional[int]:
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot: int) -> None:
        self._pending_frees.append(slot)
        self.free_slots.append(slot)

    def _apply_pending_frees(self) -> None:
        if self._pending_frees:
            slots = jnp.asarray(self._pending_frees, jnp.int32)
            self._pending_frees = []
            self.state = self.state._replace(
                active=self.state.active.at[slots].set(False))

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
        max_len = max(len(t) for t in token_ids)
        bucket = self.config.bucket_for(max_len)
        ids = np.zeros((n, bucket), np.int32)
        lengths = np.zeros((n,), np.int32)
        for i, toks in enumerate(token_ids):
            ids[i, : len(toks)] = toks
            lengths[i] = len(toks)

        key = (n, bucket)
        fn = self._prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(partial(_s2s_prefill_step, self.spec, self.eos_token_id),
                         donate_argnums=(1, 2))
            self._prefill_fns[key] = fn
        t0 = time.monotonic_ns()
        self.dstate, self.state, packed = fn(
            self.model_params, self.dstate, self.state,
            jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(slots, jnp.int32))
        step = StepResult(*sampling.unpack_step_outputs(packed))
        self.last_forward_ns = time.monotonic_ns() - t0
        return PrefillResult(first_token=step, prompt_details=None)

    def decode(self) -> StepResult:
        self._apply_pending_frees()
        t0 = time.monotonic_ns()
        self.dstate, self.state, packed = self._decode_fn(
            self.model_params, self.dstate, self.state)
        res = StepResult(*sampling.unpack_step_outputs(packed))
        self.last_forward_ns = time.monotonic_ns() - t0
        return res
