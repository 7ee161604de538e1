"""Speculative decoding engine: MLP-speculator drafts + batched verification.

Counterpart of the reference's paged speculative path (reference:
server/.../models/paged_causal_lm.py:481-563 + utils/paged.py:162-326):
per step, the speculator drafts K tokens from the last hidden state, one
`verify_chunk` forward scores positions [last_token, draft_0..draft_{K-1}],
and the longest model-agreeing draft prefix is accepted — emitting between
1 and K+1 tokens per model call.

Scope mirrors the reference's gating (paged_causal_lm.py:630-641): only
greedy rows speculate; sampling rows accept 0 drafts and take their regular
sampled token from the chunk's first position, so mixed batches stay exact.

Exactness invariant (tested): emitted tokens are identical to plain greedy
decoding for ANY speculator — a bad speculator only costs speed.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServingConfig
from ..models import core, speculator as spec_mod
from ..models.core import DecoderSpec, KVCache
from ..models.speculator import SpeculatorSpec
from . import sampling
from .engine import EngineState, InferenceEngine, StepResult
from .paged_engine import PagedInferenceEngine as PagedEngineBase


def _spec_prefill_step(spec: DecoderSpec, eos_id: int, params: dict,
                       cache: KVCache, state: EngineState,
                       spec_hidden: jax.Array,
                       ids: jax.Array, lengths: jax.Array, slots: jax.Array,
                       prefix_len: jax.Array):
    n, b = ids.shape
    t_max = state.history.shape[1]
    logits_all, hidden_all, cache = core.prefill(
        spec, params, ids, lengths, slots, cache, return_hidden=True)
    rows = jnp.arange(n)
    last_logits = logits_all[rows, lengths - 1]
    last_hidden = hidden_all[rows, lengths - 1]

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
    spec_hidden = spec_hidden.at[slots].set(last_hidden.astype(spec_hidden.dtype))
    return cache, state, spec_hidden, sampling.pack_step_outputs(next_ids, details)


def _accept_and_commit(eos_id: int, k: int, state: EngineState,
                       logits: jax.Array, hidden: jax.Array,
                       draft: jax.Array, spec_hidden: jax.Array):
    """Engine-agnostic half of a speculative step: run every verified chunk
    position through the full sampling pipeline, accept the longest
    model-agreeing draft prefix, commit the valid history prefix, and
    advance the speculator chain hidden. Shared by the slot
    (_spec_decode_step) and paged (_paged_spec_decode_step) engines.

    Returns (state, spec_hidden, packed [C, S, W], n_emit [S])."""
    s, t_max = state.history.shape
    c = k + 1
    rows = jnp.arange(s)

    # Emit every chunk position through the FULL sampling pipeline first
    # (penalties, EOS suppression, seeds), writing a tentative history so
    # later positions see earlier emissions for repetition penalty.
    packed_list = []
    emitted = []
    gen0 = state.gen_count
    hist_len = state.history_len
    tentative = state.history
    for j in range(c):
        next_ids_j, details_j = sampling.next_tokens(
            logits[:, j], state.params, gen0 + j, tentative, hist_len + j,
            eos_id, history_start=state.hist_start)
        packed_list.append(sampling.pack_step_outputs(next_ids_j, details_j))
        emitted.append(next_ids_j)
        write_pos = jnp.clip(hist_len + j, 0, t_max - 1)
        tentative = tentative.at[rows, write_pos].set(next_ids_j)
    emitted_m = jnp.stack(emitted, axis=1)                               # [S, C]
    packed = jnp.stack(packed_list)                                      # [C, S, W]

    # Acceptance: a draft token is good iff it equals the PENALIZED emitted
    # token at its position — this keeps speculative output bit-identical to
    # plain decoding even under penalties (the reference instead disables
    # speculation for penalized/sampled rows, paged_causal_lm.py:630-641;
    # sampled rows accept 0 here because draft is greedy w.r.t. the chain).
    do_sample = state.params.temperature != 0.0
    n_accept = spec_mod.accept_longest_prefix(draft, emitted_m[:, :k])
    n_accept = jnp.where(do_sample, 0, n_accept)                         # [S]
    n_emit = n_accept + 1

    # Commit only the valid prefix of the tentative history.
    hist = state.history
    for j in range(c):
        write_pos = jnp.clip(hist_len + j, 0, t_max - 1)
        valid = (j < n_emit) & state.active
        hist = hist.at[rows, write_pos].set(
            jnp.where(valid, emitted_m[:, j], hist[rows, write_pos]))

    adv = jnp.where(state.active, n_emit, 0)
    state = state._replace(
        history=hist,
        history_len=hist_len + adv,
        gen_count=state.gen_count + adv,
    )
    # speculator chain state: hidden at the last ACCEPTED chunk position
    last_idx = jnp.clip(n_emit - 1, 0, c - 1)
    new_hidden = hidden[rows, last_idx].astype(spec_hidden.dtype)
    spec_hidden = jnp.where(state.active[:, None], new_hidden, spec_hidden)
    return state, spec_hidden, packed, n_emit


def _spec_decode_step(spec: DecoderSpec, sspec: SpeculatorSpec, eos_id: int,
                      params: dict, spec_params: dict,
                      cache: KVCache, state: EngineState,
                      spec_hidden: jax.Array):
    """One speculative step (contiguous slot cache). Returns per-slot up to
    K+1 emitted tokens: packed [C, S, ...] per-position sampling outputs and
    n_emitted [S] (how many of the C positions are real for each slot)."""
    s, t_max = state.history.shape
    rows = jnp.arange(s)
    pos0 = jnp.clip(state.history_len - 1, 0, t_max - 1)
    last_ids = state.history[rows, pos0]

    draft = spec_mod.propose(sspec, spec_params, spec_hidden, last_ids)  # [S, K]
    chunk_ids = jnp.concatenate([last_ids[:, None], draft], axis=1)     # [S, C]
    logits, hidden, cache = core.verify_chunk(
        spec, params, chunk_ids, pos0, cache)                            # [S, C, V]
    state, spec_hidden, packed, n_emit = _accept_and_commit(
        eos_id, sspec.n_predict, state, logits, hidden, draft, spec_hidden)
    return cache, state, spec_hidden, packed, n_emit


def _paged_spec_decode_step(spec: DecoderSpec, sspec: SpeculatorSpec,
                            eos_id: int, page_size: int, max_seq: int,
                            live_pages: int,
                            params: dict, spec_params: dict,
                            cache, state: EngineState,
                            spec_hidden: jax.Array):
    """One speculative step over the paged pool: verification reads/writes
    go through the block table (the reference's speculative path IS the
    paged path — paged_causal_lm.py:481-563)."""
    from ..models import paged_core
    from ..ops import linear as linops

    s, t_max = state.history.shape
    # verify_chunk matmul rows = slots x (1 draft-anchor + n_predict drafts)
    params = linops.prepare_params(params, rows=s * (1 + sspec.n_predict))
    rows = jnp.arange(s)
    pos0 = jnp.clip(state.history_len - 1, 0, t_max - 1)
    last_ids = state.history[rows, pos0]

    draft = spec_mod.propose(sspec, spec_params, spec_hidden, last_ids)
    chunk_ids = jnp.concatenate([last_ids[:, None], draft], axis=1)
    logits, hidden, cache = paged_core.verify_chunk_paged(
        spec, params, chunk_ids, pos0, cache, page_size,
        active=state.active, max_seq=max_seq, live_pages=live_pages)
    state, spec_hidden, packed, n_emit = _accept_and_commit(
        eos_id, sspec.n_predict, state, logits, hidden, draft, spec_hidden)
    return cache, state, spec_hidden, packed, n_emit


class SpeculativeEngine(InferenceEngine):
    """InferenceEngine with speculative decoding (greedy rows)."""

    def __init__(self, spec, params, config: ServingConfig, eos_token_id: int,
                 speculator_spec: Optional[SpeculatorSpec] = None,
                 speculator_params: Optional[dict] = None,
                 n_predict: int = 3):
        if config.kv_cache_dtype == "int8":
            # verify_chunk reads/writes the cache at full precision
            raise ValueError(
                "kv_cache_dtype=int8 is not supported with speculative "
                "decoding")
        super().__init__(spec, params, config, eos_token_id)
        if speculator_spec is None:
            speculator_spec = SpeculatorSpec(
                vocab_size=spec.vocab_size, model_dim=spec.hidden_size,
                inner_dim=max(spec.hidden_size // 2, 64), n_predict=n_predict)
            speculator_params = spec_mod.init_speculator(
                speculator_spec, jax.random.key(7),
                dtype=jax.tree_util.tree_leaves(params)[0].dtype)
        self.sspec = speculator_spec
        self.spec_params = speculator_params
        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        self.spec_hidden = jnp.zeros((self.num_slots, spec.hidden_size), dtype)

        self._spec_decode_fn = jax.jit(
            partial(_spec_decode_step, self.spec, self.sspec, eos_token_id),
            donate_argnums=(2, 3, 4))
        self._spec_prefill_fns = {}
        self.accepted_histogram = np.zeros(self.sspec.n_predict + 2, np.int64)

    def reset(self) -> None:
        super().reset()
        self.spec_hidden = jnp.zeros_like(self.spec_hidden)

    def prefill(self, slots, token_ids, request_params,
                want_prompt_details=False, prefix_embeds=None):
        # speculative engine keeps its own prefill (hidden-state capture);
        # prompt details / soft prompts fall back to the base engine
        if want_prompt_details or prefix_embeds:
            return super().prefill(slots, token_ids, request_params,
                                   want_prompt_details, prefix_embeds)
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
        fn = self._spec_prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(partial(_spec_prefill_step, self.spec,
                                 self.eos_token_id),
                         donate_argnums=(1, 2, 3))
            self._spec_prefill_fns[key] = fn
        t0 = time.monotonic_ns()
        self.cache, self.state, self.spec_hidden, packed = fn(
            self.model_params, self.cache, self.state, self.spec_hidden,
            jnp.asarray(ids), jnp.asarray(lengths),
            jnp.asarray(slots, jnp.int32), jnp.zeros((n,), jnp.int32))
        packed = jax.device_get(packed)
        self._slot_ctx[np.asarray(slots)] = lengths + 1
        from .engine import PrefillResult

        step = StepResult(*sampling.unpack_step_outputs(packed))
        self.last_forward_ns = time.monotonic_ns() - t0
        return PrefillResult(first_token=step, prompt_details=None)

    # speculative decode couples dispatch and fetch (n_emit drives host-side
    # bookkeeping before the next dispatch), so the batcher must not use the
    # inherited two-phase begin/end pipeline here — it would bypass this
    # override and run plain (non-speculative) chunks
    supports_decode_pipeline = False
    # decode_steps has no per-call chunk: a speculative step already emits
    # small bursts (1..n_predict+1 tokens), so streaming latency is fine
    supports_chunk_override = False

    def decode_steps(self, want_details: bool = True,
                     chunk=None) -> list[StepResult]:
        del want_details, chunk  # always computed / burst already small
        """One speculative step → 1..K+1 emitted tokens per slot, exposed as
        a list of per-position StepResults with a validity mask applied via
        `emitted_mask` (rows beyond a slot's n_emit carry garbage; the
        batcher consults `last_n_emitted`)."""
        self._apply_pending_frees()
        t0 = time.monotonic_ns()
        (self.cache, self.state, self.spec_hidden, packed,
         n_emit) = self._spec_decode_fn(
            self.model_params, self.spec_params, self.cache, self.state,
            self.spec_hidden)
        packed, n_emit = jax.device_get((packed, n_emit))
        self.last_n_emitted = np.asarray(n_emit)
        active_mask = np.asarray(jax.device_get(self.state.active))
        for s in range(self.num_slots):
            if active_mask[s]:
                self.accepted_histogram[int(self.last_n_emitted[s])] += 1
        results = [StepResult(*sampling.unpack_step_outputs(packed[j]))
                   for j in range(packed.shape[0])]
        self.last_forward_ns = time.monotonic_ns() - t0
        return results


def _default_speculator(spec: DecoderSpec, params: dict,
                        speculator_spec, speculator_params, n_predict: int):
    """Build (or pass through) the MLP speculator for an engine."""
    if speculator_spec is None:
        speculator_spec = SpeculatorSpec(
            vocab_size=spec.vocab_size, model_dim=spec.hidden_size,
            inner_dim=max(spec.hidden_size // 2, 64), n_predict=n_predict)
        speculator_params = spec_mod.init_speculator(
            speculator_spec, jax.random.key(7),
            dtype=jax.tree_util.tree_leaves(params)[0].dtype)
    return speculator_spec, speculator_params


class PagedSpeculativeEngine(PagedEngineBase):
    """PagedInferenceEngine + speculative decoding through the block table
    (the reference's configuration: speculation exists only on its paged
    path, paged_causal_lm.py:481-563). Gating mirrors the reference's
    (paged_causal_lm.py:630-641): speculate only when the active batch is
    <= SPECULATOR_MAX_BATCH_SIZE, at least one active row is greedy, and
    pool pressure is <= 75% — otherwise the step falls back to the plain
    paged decode program. Accepts a mesh (TP) like the base engine."""

    def __init__(self, spec, params, config: ServingConfig, eos_token_id: int,
                 num_pages: Optional[int] = None, mesh=None,
                 speculator_spec: Optional[SpeculatorSpec] = None,
                 speculator_params: Optional[dict] = None,
                 n_predict: int = 3,
                 max_spec_batch: Optional[int] = None):
        if config.kv_cache_dtype == "int8":
            raise ValueError(
                "speculative decoding does not support kv_cache_dtype=int8 "
                "(the verify-chunk forward has no quantized write path); "
                "unset SPECULATOR or use kv_cache_dtype=auto")
        super().__init__(spec, params, config, eos_token_id,
                         num_pages=num_pages, mesh=mesh)
        self._init_speculator(speculator_spec, speculator_params, n_predict,
                              max_spec_batch)

    def _init_speculator(self, speculator_spec, speculator_params,
                         n_predict: int, max_spec_batch: Optional[int]):
        import os

        self.sspec, self.spec_params = _default_speculator(
            self.spec, self.model_params, speculator_spec,
            speculator_params, n_predict)
        dtype = jax.tree_util.tree_leaves(self.model_params)[0].dtype
        self.spec_hidden = jnp.zeros(
            (self.num_slots, self.spec.hidden_size), dtype)
        if self.mesh is not None:
            from ..parallel import sharding as shd

            self.spec_params = shd.replicate(self.spec_params, self.mesh)
            self.spec_hidden = shd.replicate(self.spec_hidden, self.mesh)
        self.max_spec_batch = max_spec_batch if max_spec_batch is not None \
            else int(os.getenv("SPECULATOR_MAX_BATCH_SIZE", "16"))
        self._greedy = np.zeros(self.num_slots, bool)
        self._spec_decode_fns = {}
        self._spec_prefill_fns = {}
        self.accepted_histogram = np.zeros(self.sspec.n_predict + 2, np.int64)
        self.spec_steps = 0
        self.fallback_steps = 0

    # -- bookkeeping hooks ---------------------------------------------------

    def set_request_params(self, slot: int, rp) -> None:
        self._greedy[slot] = (rp.temperature == 0.0)
        super().set_request_params(slot, rp)

    def reset(self) -> None:
        super().reset()
        self.spec_hidden = jnp.zeros_like(self.spec_hidden)
        self._greedy[:] = False

    # -- prefill with hidden capture ------------------------------------------

    def prefill(self, slots, token_ids, request_params,
                want_prompt_details: bool = False, prefix_embeds=None):
        result = super().prefill(slots, token_ids, request_params,
                                 want_prompt_details=want_prompt_details,
                                 prefix_embeds=prefix_embeds)
        # seed the speculator chain with the prompt's last hidden state via
        # a dedicated capture pass IS avoidable: verify position 0 always
        # recomputes the true logits, so a cold (zero) hidden only lowers
        # the FIRST chunk's acceptance — correctness is unaffected (the
        # exactness invariant is tested). Zero the rows so stale hidden
        # from a previous occupant of the slot can't leak in.
        self.spec_hidden = self.spec_hidden.at[
            jnp.asarray(slots, jnp.int32)].set(0.0)
        return result

    # -- speculative decode ----------------------------------------------------

    def _should_speculate(self) -> bool:
        active = self.num_slots - len(self.free_slots)
        if not (0 < active <= self.max_spec_batch):
            return False
        if not any(self._greedy[s] for s in range(self.num_slots)
                   if self._slot_ctx[s] > 0):
            return False
        used = self.allocator.num_pages - self.allocator.num_free
        return used / max(self.allocator.num_pages, 1) <= 0.75

    def _get_spec_decode_fn(self, live_pages: int):
        fn = self._spec_decode_fns.get(live_pages)
        if fn is None:
            fn = jax.jit(
                partial(_paged_spec_decode_step, self.spec, self.sspec,
                        self.eos_token_id, self.page_size, self.max_seq,
                        live_pages),
                donate_argnums=(2, 3, 4))
            fn = fn.lower(self.model_params, self.spec_params, self.cache,
                          self.state, self.spec_hidden).compile()
            self._spec_decode_fns[live_pages] = fn
        return fn

    def _spec_live_pages(self) -> int:
        """Live-page bucket covering every context PLUS the chunk width
        (verify writes K+1 positions past the current context)."""
        need = -(-(int(self._slot_ctx.max(initial=0))
                   + self.sspec.n_predict + 1) // self.page_size)
        for b in self._page_bucket_grid():
            if b >= need:
                return b
        return self.allocator.max_pages_per_slot

    # dispatch/fetch stay coupled on the speculative path (see
    # SpeculativeEngine); the batcher uses the synchronous decode_steps
    supports_decode_pipeline = False
    # decode_steps has no per-call chunk: a speculative step already emits
    # small bursts (1..n_predict+1 tokens), so streaming latency is fine
    supports_chunk_override = False

    def decode_steps(self, want_details: bool = True,
                     chunk=None) -> list[StepResult]:
        if not self._should_speculate():
            self.fallback_steps += 1
            return super().decode_steps(want_details=want_details,
                                        chunk=chunk)
        self.spec_steps += 1
        self.last_n_emitted = None
        self._apply_pending_frees()
        live_pages = self._spec_live_pages()
        t0 = time.monotonic_ns()
        try:
            (self.cache, self.state, self.spec_hidden, packed,
             n_emit) = self._get_spec_decode_fn(live_pages)(
                self.model_params, self.spec_params, self.cache, self.state,
                self.spec_hidden)
            packed, n_emit = jax.device_get((packed, n_emit))
        except Exception as e:
            from .engine import EngineDeviceError

            raise EngineDeviceError(f"paged speculative decode failed: {e}") \
                from e
        self.last_n_emitted = np.asarray(n_emit)
        c = self.sspec.n_predict + 1
        # context advances by each slot's own emitted count
        adv = np.where(self._slot_ctx > 0, self.last_n_emitted, 0)
        np.minimum(self._slot_ctx + adv, self.max_seq, out=self._slot_ctx)
        for s in range(self.num_slots):
            if self._slot_ctx[s] > 0:
                self.accepted_histogram[int(self.last_n_emitted[s])] += 1
        results = [StepResult(*sampling.unpack_step_outputs(packed[j]))
                   for j in range(c)]
        self.last_forward_ns = time.monotonic_ns() - t0
        return results
