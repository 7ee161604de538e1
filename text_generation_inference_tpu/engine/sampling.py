"""Vectorized next-token choosing: logits processing, warping, and sampling.

Semantics match the reference's heterogeneous chooser stack
(reference: server/.../utils/tokens.py:161-384 and utils/logits_process.py):

  order of operations per step:
    1. min_new_tokens EOS suppression, else exponential length penalty on the
       EOS logit (reference: tokens.py:242-256)
    2. repetition penalty over previously seen tokens (reference:
       logits_process.py:93-141)
    3. warpers: temperature, top-k, top-p, typical-p (reference:
       tokens.py:261-263; only no-op for disabled values)
    4. greedy argmax when temperature == 0.0, else sample from the warped
       distribution (Gumbel-max, equivalent to the reference's
       exponential-race trick, tokens.py:36-41)
    5. logprob/rank/top-n token details are computed from the *warped*
       scores (reference: tokens.py:265-271, 388-425)

Everything here is shape-static and mask-driven: one compiled function serves
every mix of greedy/sampling requests in the slot batch. Disabled parameter
encodings follow the reference: temperature 0 => greedy, top_k 0 / top_p 1 /
typical_p 1 / repetition_penalty 1 => no-op. The reference's per-request
`torch.Generator` seeds become per-slot JAX PRNG keys folded with the step
counter, preserving the same-seed => same-output guarantee.

One intentional divergence: the reference's repetition penalty also penalizes
pad tokens that appear in the left-padded input tensor (unless pad == eos,
logits_process.py:105-134). This engine keeps an explicit validity mask over
the token history, so padding is never penalized — the behavior for
batch-size-1 (the reference's canonical case) is identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# Cap on returned top-n candidates: API max is 5, ties may extend the list to
# at most 4*n (reference: tokens.py:412). 20 covers the worst case.
MAX_TOP_N = 5
TOP_N_CAP = 4 * MAX_TOP_N


class SlotSamplingParams(NamedTuple):
    """Per-slot sampling parameter vectors (all shape [num_slots])."""

    temperature: jax.Array        # f32; 0.0 => greedy
    top_k: jax.Array              # i32; 0 => disabled
    top_p: jax.Array              # f32; 1.0 => disabled
    typical_p: jax.Array          # f32; 1.0 => disabled
    repetition_penalty: jax.Array # f32; 1.0 => disabled
    lp_start: jax.Array           # i32; length-penalty start index
    lp_decay: jax.Array           # f32; <= 1.0 => disabled
    min_new_tokens: jax.Array     # i32
    seed: jax.Array               # u32; per-slot RNG seed

    @classmethod
    def empty(cls, num_slots: int) -> "SlotSamplingParams":
        # NOTE: every field gets its own freshly-allocated array — sharing one
        # buffer across fields breaks jit buffer donation ("donated twice")
        return cls(
            temperature=jnp.zeros((num_slots,), jnp.float32),
            top_k=jnp.zeros((num_slots,), jnp.int32),
            top_p=jnp.ones((num_slots,), jnp.float32),
            typical_p=jnp.ones((num_slots,), jnp.float32),
            repetition_penalty=jnp.ones((num_slots,), jnp.float32),
            lp_start=jnp.zeros((num_slots,), jnp.int32),
            lp_decay=jnp.zeros((num_slots,), jnp.float32),
            min_new_tokens=jnp.zeros((num_slots,), jnp.int32),
            seed=jnp.zeros((num_slots,), jnp.uint32),
        )

    def write_slot(
        self,
        slot: int,
        *,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        typical_p: float = 1.0,
        repetition_penalty: float = 1.0,
        lp_start: int = 0,
        lp_decay: float = 0.0,
        min_new_tokens: int = 0,
        seed: int = 0,
    ) -> "SlotSamplingParams":
        """Host-side functional update of one slot's parameters."""
        return SlotSamplingParams(
            temperature=self.temperature.at[slot].set(temperature),
            top_k=self.top_k.at[slot].set(top_k),
            top_p=self.top_p.at[slot].set(top_p if top_p > 0 else 1.0),
            typical_p=self.typical_p.at[slot].set(typical_p if typical_p > 0 else 1.0),
            repetition_penalty=self.repetition_penalty.at[slot].set(
                repetition_penalty if repetition_penalty > 0 else 1.0),
            lp_start=self.lp_start.at[slot].set(lp_start),
            lp_decay=self.lp_decay.at[slot].set(lp_decay),
            min_new_tokens=self.min_new_tokens.at[slot].set(min_new_tokens),
            seed=self.seed.at[slot].set(jnp.uint32(seed)),
        )

    def gather(self, idx: jax.Array) -> "SlotSamplingParams":
        """Select rows (e.g. the slots being prefilled)."""
        return SlotSamplingParams(*(a[idx] for a in self))


def apply_eos_penalties(
    scores: jax.Array,          # [N, V] f32
    gen_count: jax.Array,       # [N] i32: tokens generated so far
    min_new_tokens: jax.Array,  # [N]
    lp_start: jax.Array,        # [N]
    lp_decay: jax.Array,        # [N]
    eos_token_id: int,
) -> jax.Array:
    """min_new_tokens suppression / exponential length boost of the EOS logit.

    Reference: tokens.py:242-256 — suppression wins over the length penalty,
    and the boost adds |logit| * (decay^tokens_past - 1) so that negative
    logits are boosted toward zero and beyond.
    """
    eos = scores[:, eos_token_id]
    suppress = gen_count < min_new_tokens
    tokens_past = gen_count - lp_start
    boost_on = (lp_decay > 1.0) & (tokens_past > 0) & ~suppress
    # Clamp the exponent to avoid inf from very long generations; the boost is
    # monotone so the argmax is unaffected once it saturates.
    exponent = jnp.clip(tokens_past, 0, 512).astype(jnp.float32)
    boost = jnp.abs(eos) * (jnp.power(lp_decay, exponent) - 1.0)
    new_eos = jnp.where(suppress, NEG_INF, jnp.where(boost_on, eos + boost, eos))
    return scores.at[:, eos_token_id].set(new_eos)


def apply_repetition_penalty(
    scores: jax.Array,        # [N, V] f32
    token_history: jax.Array, # [N, T] i32: input + generated ids per row
    history_len: jax.Array,   # [N] i32: number of valid ids per row
    penalty: jax.Array,       # [N] f32; 1.0 => no-op
    history_start: Optional[jax.Array] = None,  # [N] i32: skip ids before this
) -> jax.Array:
    """CTRL-style repetition penalty over all previously seen tokens.

    Reference: logits_process.py:112-134 — negative scores are multiplied by
    the penalty, positive ones divided, so the probability always decreases.
    `history_start` masks out soft-prompt placeholder positions (prefix
    embeddings have no token ids, reference passes only real input_ids).
    """
    n, v = scores.shape
    t = token_history.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, t), 1)
    valid = pos < history_len[:, None]
    if history_start is not None:
        valid &= pos >= history_start[:, None]
    ids_safe = jnp.where(valid, token_history, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, t), 0)
    seen = (
        jnp.zeros((n, v), jnp.bool_)
        .at[rows, ids_safe]
        .max(valid, mode="drop")
    )
    p = penalty[:, None]
    penalized = jnp.where(scores < 0, scores * p, scores / p)
    return jnp.where(seen & (p != 1.0), penalized, scores)


def apply_warpers(
    scores: jax.Array,    # [N, V] f32
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    typical_p: jax.Array,
) -> jax.Array:
    """Temperature → top-k → top-p → typical-p, all vectorized and masked.

    The three truncation warpers share a single ascending sort of the scores
    (the reference sorts separately per warper: logits_process.py:207, 287,
    361 — one sort is the TPU-friendly formulation).
    """
    n, v = scores.shape

    # --- temperature (0 encodes greedy => treated as 1.0, tokens.py:202) ---
    temp = jnp.where(temperature == 0.0, 1.0, temperature)
    scores = scores / temp[:, None]

    # one shared ascending sort feeds both top-k and top-p
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, v), 1)
    sorted_asc, order = jax.lax.sort_key_val(scores, iota, dimension=-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, v), 0)

    # --- top-k: keep scores >= k-th highest (ties kept, logits_process.py:294) ---
    k = jnp.clip(top_k, 0, v)
    kth_pos = jnp.clip(v - k, 0, v - 1)
    kth_score = jnp.take_along_axis(sorted_asc, kth_pos[:, None], axis=-1)
    kth_score = jnp.where((top_k > 0)[:, None], kth_score, NEG_INF)
    scores = jnp.where(scores < kth_score, NEG_INF, scores)

    # --- top-p: drop the low-probability prefix of the ascending order whose
    # cumulative mass is <= 1 - top_p, always keeping the most likely token
    # (logits_process.py:206-224) ---
    probs_asc = jax.nn.softmax(sorted_asc, axis=-1)
    cum_asc = jnp.cumsum(probs_asc, axis=-1)
    remove_sorted = cum_asc <= (1.0 - top_p)[:, None]
    # rows with top_p >= 1 are disabled outright (the raw formula would still
    # drop tokens whose probability underflows to exactly 0)
    remove_sorted &= (top_p < 1.0)[:, None]
    remove_sorted = remove_sorted.at[:, -1].set(False)
    remove = jnp.zeros((n, v), jnp.bool_).at[rows, order].set(remove_sorted)
    scores = jnp.where(remove, NEG_INF, scores)

    # --- typical-p: keep the smallest set of tokens (by closeness of their
    # surprisal to the entropy) whose mass reaches typical_p
    # (logits_process.py:353-387); gated behind cond — its extra sort only
    # runs when some row actually uses typical decoding ---
    def apply_typical(scores):
        normalized = jax.nn.log_softmax(scores, axis=-1)
        p_full = jnp.exp(normalized)
        ent = -jnp.sum(jnp.where(p_full > 0, normalized * p_full, 0.0),
                       axis=-1, keepdims=True)
        shifted = jnp.abs((-normalized) - ent)        # -inf scores => +inf
        shifted_sorted, t_order = jax.lax.sort_key_val(shifted, iota,
                                                       dimension=-1)
        sorted_probs = jnp.take_along_axis(p_full, t_order, axis=-1)
        cum_t = jnp.cumsum(sorted_probs, axis=-1)
        last_ind = jnp.sum(cum_t < typical_p[:, None], axis=-1)
        last_ind = jnp.clip(last_ind, 0, v - 1)
        disabled = typical_p >= 1.0
        last_ind = jnp.where(disabled, v - 1, last_ind)
        threshold = jnp.take_along_axis(shifted_sorted, last_ind[:, None],
                                        axis=-1)
        return jnp.where(shifted > threshold, NEG_INF, scores)

    scores = jax.lax.cond(
        jnp.any(typical_p < 1.0), apply_typical, lambda s: s, scores)

    return scores


def choose_tokens(
    warped: jax.Array,       # [N, V] f32 (post-warp scores)
    do_sample: jax.Array,    # [N] bool
    seeds: jax.Array,        # [N] u32 per-slot seeds
    step: jax.Array,         # [N] i32 per-slot step counter (generated count)
) -> jax.Array:
    """Greedy argmax or seeded categorical sample per row.

    The per-(seed, step) PRNG key makes sampling deterministic regardless of
    which slot a request lands in or what else is in the batch — the same
    reproducibility contract as the reference's per-request generators
    (tokens.py:32-41), though the concrete streams differ (JAX threefry vs
    torch Philox).
    """
    greedy_ids = jnp.argmax(warped, axis=-1).astype(jnp.int32)

    def sample_row(seed, step_i, logits):
        key = jax.random.fold_in(jax.random.key(seed), step_i)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    # the PRNG (threefry over [N, V]) is the single most expensive sampling
    # op; an all-greedy batch skips it entirely (same StaticWarper-style
    # device branch as the warper gating below)
    sampled_ids = jax.lax.cond(
        jnp.any(do_sample),
        lambda w: jax.vmap(sample_row)(seeds, step, w),
        lambda w: greedy_ids,
        warped)
    return jnp.where(do_sample, sampled_ids, greedy_ids)


class TokenDetails(NamedTuple):
    """Compact per-row token info shipped to the host each step."""

    logprob: jax.Array    # [N] f32: logprob of the chosen token (post-warp)
    rank: jax.Array       # [N] i32: 1-based rank of the chosen token
    top_ids: jax.Array    # [N, TOP_N_CAP] i32: highest-score candidate ids
    top_logprobs: jax.Array  # [N, TOP_N_CAP] f32
    top_scores: jax.Array    # [N, TOP_N_CAP] f32 (for host-side tie handling)


def token_details(warped: jax.Array, next_ids: jax.Array) -> TokenDetails:
    """logprob / rank / top-n extraction from the warped scores.

    Reference: tokens.py:388-425 — logprobs are log_softmax over the warped
    scores; rank counts strictly-greater scores; top-n selects every score
    tied with the n-th highest, capped at 4n entries.
    """
    n, v = warped.shape
    logprobs = jax.nn.log_softmax(warped, axis=-1)
    rows = jnp.arange(n)
    chosen_lp = logprobs[rows, next_ids]
    chosen_score = warped[rows, next_ids]
    rank = jnp.sum(warped > chosen_score[:, None], axis=-1).astype(jnp.int32) + 1
    cap = min(TOP_N_CAP, v)
    top_scores, top_ids = jax.lax.top_k(warped, cap)
    top_lps = jnp.take_along_axis(logprobs, top_ids, axis=-1)
    if cap < TOP_N_CAP:
        pad = TOP_N_CAP - cap
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_lps = jnp.pad(top_lps, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=0)
    return TokenDetails(
        logprob=chosen_lp,
        rank=rank,
        top_ids=top_ids.astype(jnp.int32),
        top_logprobs=top_lps,
        top_scores=top_scores,
    )


def next_tokens(
    logits: jax.Array,          # [N, V] raw model logits (any float dtype)
    params: SlotSamplingParams, # rows aligned with logits
    gen_count: jax.Array,       # [N] i32 tokens generated so far per row
    token_history: jax.Array,   # [N, T] i32
    history_len: jax.Array,     # [N] i32
    eos_token_id: int,
    history_start: Optional[jax.Array] = None,
    want_details: bool = True,
) -> tuple[jax.Array, Optional[TokenDetails]]:
    """Full next-token pipeline. Returns (next_ids [N], details).

    The repetition-penalty scatter and the warper sorts run under lax.cond so
    an all-greedy / penalty-free batch pays nothing for them (the reference
    only constructs processors that are actually needed, tokens.py:184-221 —
    here that decision is a cheap device-side branch instead of a Python
    rebuild per batch change).
    """
    scores = logits.astype(jnp.float32)
    scores = apply_eos_penalties(
        scores, gen_count, params.min_new_tokens, params.lp_start,
        params.lp_decay, eos_token_id)
    scores = jax.lax.cond(
        jnp.any(params.repetition_penalty != 1.0),
        lambda s: apply_repetition_penalty(
            s, token_history, history_len, params.repetition_penalty,
            history_start),
        lambda s: s,
        scores)
    do_sample = params.temperature != 0.0
    warped = jax.lax.cond(
        jnp.any(do_sample),
        lambda s: apply_warpers(
            s, params.temperature, params.top_k, params.top_p,
            params.typical_p),
        lambda s: s,
        scores)
    next_ids = choose_tokens(warped, do_sample, params.seed, gen_count)
    details = token_details(warped, next_ids) if want_details else None
    return next_ids, details


def pack_step_outputs(next_ids: jax.Array,
                      details: Optional[TokenDetails]) -> jax.Array:
    """Pack (ids, details) into ONE [N, 3 + 3*TOP_N_CAP] f32 array so the
    host fetches a single buffer per step (important when the accelerator
    sits behind an RPC tunnel — per-transfer latency dominates).

    `details=None` (the no-details decode variant — no active request asked
    for token info, the common serving case; the reference likewise only
    computes logprobs/top-n when requested) packs just the ids: [N, 1]."""
    if details is None:
        return next_ids[:, None].astype(jnp.float32)
    return jnp.concatenate([
        next_ids[:, None].astype(jnp.float32),
        details.logprob[:, None],
        details.rank[:, None].astype(jnp.float32),
        details.top_ids.astype(jnp.float32),
        details.top_logprobs,
        details.top_scores,
    ], axis=1)


def unpack_step_outputs(packed) -> tuple:
    """numpy inverse of pack_step_outputs → (next_ids, logprob, rank,
    top_ids, top_logprobs, top_scores). Ids-only payloads (see
    pack_step_outputs) yield NaN/0/empty detail fields."""
    import numpy as np

    packed = np.asarray(packed)
    cap = TOP_N_CAP
    n = packed.shape[0]
    if packed.shape[1] == 1:
        return (
            packed[:, 0].astype(np.int32),
            np.full((n,), np.nan, np.float32),
            np.zeros((n,), np.int32),
            np.zeros((n, cap), np.int32),
            np.full((n, cap), NEG_INF, np.float32),
            np.full((n, cap), NEG_INF, np.float32),
        )
    return (
        packed[:, 0].astype(np.int32),
        packed[:, 1],
        packed[:, 2].astype(np.int32),
        packed[:, 3:3 + cap].astype(np.int32),
        packed[:, 3 + cap:3 + 2 * cap],
        packed[:, 3 + 2 * cap:3 + 3 * cap],
    )


class PromptDetails(NamedTuple):
    """Per-prompt-token info (reference: tokens.py:429-506)."""

    logprob: jax.Array    # [T] f32; NaN at position 0
    rank: jax.Array       # [T] i32; 0 at position 0
    top_ids: jax.Array    # [T, TOP_N_CAP] i32
    top_logprobs: jax.Array  # [T, TOP_N_CAP] f32
    top_scores: jax.Array    # [T, TOP_N_CAP] f32


def prompt_token_details(
    prompt_logits: jax.Array,  # [T-1, V]: logits at positions 0..T-2
    prompt_ids: jax.Array,     # [T] i32: the prompt token ids
) -> PromptDetails:
    """Input-token logprobs/ranks/top-n from the prefill logits.

    Position i's details come from the logits at position i-1; the first
    prompt token has no prediction (NaN logprob / rank 0 / no top tokens),
    matching reference tokens.py:441-455. Ranks and top-n here use the raw
    logits (no warping is defined for prompt positions).
    """
    t = prompt_ids.shape[0]
    v = prompt_logits.shape[-1]
    logprobs = jax.nn.log_softmax(prompt_logits.astype(jnp.float32), axis=-1)
    rows = jnp.arange(t - 1)
    targets = prompt_ids[1:]
    chosen_lp = logprobs[rows, targets]
    chosen_score = prompt_logits[rows, targets].astype(jnp.float32)
    rank = jnp.sum(
        prompt_logits.astype(jnp.float32) > chosen_score[:, None], axis=-1
    ).astype(jnp.int32) + 1
    cap = min(TOP_N_CAP, v)
    top_scores, top_ids = jax.lax.top_k(prompt_logits.astype(jnp.float32), cap)
    top_lps = jnp.take_along_axis(logprobs, top_ids, axis=-1)
    if cap < TOP_N_CAP:
        pad = TOP_N_CAP - cap
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_lps = jnp.pad(top_lps, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=0)
    return PromptDetails(
        logprob=jnp.concatenate([jnp.full((1,), jnp.nan, jnp.float32), chosen_lp]),
        rank=jnp.concatenate([jnp.zeros((1,), jnp.int32), rank]),
        top_ids=jnp.concatenate(
            [jnp.zeros((1, TOP_N_CAP), jnp.int32), top_ids.astype(jnp.int32)]),
        top_logprobs=jnp.concatenate(
            [jnp.full((1, TOP_N_CAP), NEG_INF, jnp.float32), top_lps]),
        top_scores=jnp.concatenate(
            [jnp.full((1, TOP_N_CAP), NEG_INF, jnp.float32), top_scores]),
    )
