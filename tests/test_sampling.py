"""Vectorized-vs-sequential sampling parity tests.

Mirrors the reference's test strategy (reference:
server/tests/test_logit_processors.py:17-80): each vectorized warper is
compared elementwise against the stock per-request HuggingFace warper on
fixed tensors.
"""

import numpy as np
import pytest
import torch
from transformers import (
    TemperatureLogitsWarper,
    TopKLogitsWarper,
    TopPLogitsWarper,
    TypicalLogitsWarper,
    RepetitionPenaltyLogitsProcessor,
)

import jax.numpy as jnp

from text_generation_inference_tpu.engine import sampling as S

VOCAB = 73
BATCH = 9
RNG = np.random.default_rng(42)
LOGITS = RNG.normal(size=(BATCH, VOCAB)).astype(np.float32) * 3.0


def hf_warp(warper, scores: np.ndarray) -> np.ndarray:
    out = warper(None, torch.tensor(scores[None] if scores.ndim == 1 else scores))
    return out.numpy()


def assert_close(a, b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def run_warpers(logits, temperature=None, top_k=None, top_p=None, typical_p=None):
    n = logits.shape[0]
    temperature = temperature if temperature is not None else [1.0] * n
    top_k = top_k if top_k is not None else [0] * n
    top_p = top_p if top_p is not None else [1.0] * n
    typical_p = typical_p if typical_p is not None else [1.0] * n
    return np.asarray(
        S.apply_warpers(
            jnp.asarray(logits),
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(typical_p, jnp.float32),
        )
    )


class TestWarperParity:
    def test_temperature(self):
        temps = [0.5, 1.0, 2.0, 0.1, 1.5, 0.9, 3.0, 1.0, 0.25]
        ours = run_warpers(LOGITS, temperature=temps)
        for i, t in enumerate(temps):
            expected = (
                hf_warp(TemperatureLogitsWarper(t), LOGITS[i : i + 1])
                if t != 1.0
                else LOGITS[i : i + 1]
            )
            assert_close(ours[i : i + 1], expected)

    def test_top_k(self):
        ks = [1, 5, 10, 0, 72, 73, 100, 2, 50]
        ours = run_warpers(LOGITS, top_k=ks)
        for i, k in enumerate(ks):
            if k == 0:
                expected = LOGITS[i : i + 1]
            else:
                expected = hf_warp(TopKLogitsWarper(top_k=k), LOGITS[i : i + 1])
            assert_close(ours[i : i + 1], expected)

    def test_top_p(self):
        ps = [0.1, 0.5, 0.9, 1.0, 0.99, 0.3, 0.7, 0.05, 0.62]
        ours = run_warpers(LOGITS, top_p=ps)
        for i, p in enumerate(ps):
            if p >= 1.0:
                expected = LOGITS[i : i + 1]
            else:
                expected = hf_warp(TopPLogitsWarper(top_p=p), LOGITS[i : i + 1])
            assert_close(ours[i : i + 1], expected)

    def test_typical(self):
        ms = [0.1, 0.5, 0.9, 1.0, 0.99, 0.3, 0.7, 0.25, 0.85]
        ours = run_warpers(LOGITS, typical_p=ms)
        for i, m in enumerate(ms):
            if m >= 1.0:
                expected = LOGITS[i : i + 1]
            else:
                expected = hf_warp(TypicalLogitsWarper(mass=m), LOGITS[i : i + 1])
            assert_close(ours[i : i + 1], expected)

    def test_stacked_warpers_match_sequential(self):
        temps = [0.7, 1.0, 1.3, 0.5, 2.0, 1.0, 0.8, 1.1, 0.6]
        ks = [10, 0, 5, 20, 0, 3, 7, 15, 0]
        ps = [0.9, 0.8, 1.0, 0.95, 0.5, 1.0, 0.85, 0.6, 0.99]
        ours = run_warpers(LOGITS, temperature=temps, top_k=ks, top_p=ps)
        for i in range(BATCH):
            x = torch.tensor(LOGITS[i : i + 1])
            if temps[i] != 1.0:
                x = TemperatureLogitsWarper(temps[i])(None, x)
            if ks[i] != 0:
                x = TopKLogitsWarper(top_k=ks[i])(None, x)
            if ps[i] < 1.0:
                x = TopPLogitsWarper(top_p=ps[i])(None, x)
            assert_close(ours[i : i + 1], x.numpy())


class TestRepetitionPenalty:
    def test_matches_hf_processor(self):
        # no padding: every row's history is fully valid, so the masked
        # implementation must agree with the HF processor exactly
        hist = RNG.integers(0, VOCAB, size=(BATCH, 12)).astype(np.int32)
        penalties = [1.0, 1.2, 2.0, 0.8, 1.5, 1.0, 1.05, 3.0, 1.1]
        ours = np.asarray(
            S.apply_repetition_penalty(
                jnp.asarray(LOGITS),
                jnp.asarray(hist),
                jnp.full((BATCH,), 12, jnp.int32),
                jnp.asarray(penalties, jnp.float32),
            )
        )
        for i, p in enumerate(penalties):
            proc = RepetitionPenaltyLogitsProcessor(penalty=p)
            expected = proc(
                torch.tensor(hist[i : i + 1].astype(np.int64)),
                torch.tensor(LOGITS[i : i + 1].copy()),
            ).numpy()
            assert_close(ours[i : i + 1], expected)

    def test_padding_not_penalized(self):
        hist = np.zeros((1, 8), np.int32)
        hist[0, :2] = [3, 5]
        out = np.asarray(
            S.apply_repetition_penalty(
                jnp.asarray(LOGITS[:1]),
                jnp.asarray(hist),
                jnp.asarray([2], jnp.int32),
                jnp.asarray([2.0], jnp.float32),
            )
        )
        changed = np.nonzero(out[0] != LOGITS[0])[0]
        assert set(changed.tolist()) <= {3, 5}


class TestEosPenalties:
    EOS = 7

    def run(self, gen_count, min_new=0, lp_start=0, lp_decay=0.0):
        return np.asarray(
            S.apply_eos_penalties(
                jnp.asarray(LOGITS[:1]),
                jnp.asarray([gen_count], jnp.int32),
                jnp.asarray([min_new], jnp.int32),
                jnp.asarray([lp_start], jnp.int32),
                jnp.asarray([lp_decay], jnp.float32),
                eos_token_id=self.EOS,
            )
        )[0]

    def test_min_new_tokens_suppresses_eos(self):
        out = self.run(gen_count=2, min_new=5)
        assert out[self.EOS] == -np.inf
        mask = np.ones(VOCAB, bool)
        mask[self.EOS] = False
        np.testing.assert_array_equal(out[mask], LOGITS[0][mask])

    def test_min_reached_no_suppression(self):
        out = self.run(gen_count=5, min_new=5)
        assert out[self.EOS] == LOGITS[0][self.EOS]

    def test_length_penalty_boosts_eos(self):
        # reference formula: eos + |eos| * (decay^past - 1), tokens.py:252-255
        out = self.run(gen_count=10, lp_start=4, lp_decay=1.5)
        eos = LOGITS[0][self.EOS]
        expected = eos + abs(eos) * (1.5 ** 6 - 1.0)
        np.testing.assert_allclose(out[self.EOS], expected, rtol=1e-5)

    def test_length_penalty_before_start_noop(self):
        out = self.run(gen_count=3, lp_start=4, lp_decay=1.5)
        assert out[self.EOS] == LOGITS[0][self.EOS]


class TestChooseTokens:
    def test_greedy_is_argmax(self):
        ids = np.asarray(
            S.choose_tokens(
                jnp.asarray(LOGITS),
                jnp.zeros((BATCH,), bool),
                jnp.zeros((BATCH,), jnp.uint32),
                jnp.zeros((BATCH,), jnp.int32),
            )
        )
        np.testing.assert_array_equal(ids, LOGITS.argmax(-1))

    def test_sampling_deterministic_per_seed_and_step(self):
        seeds = jnp.asarray(np.arange(BATCH), jnp.uint32)
        steps = jnp.zeros((BATCH,), jnp.int32)
        do = jnp.ones((BATCH,), bool)
        a = S.choose_tokens(jnp.asarray(LOGITS), do, seeds, steps)
        b = S.choose_tokens(jnp.asarray(LOGITS), do, seeds, steps)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = S.choose_tokens(jnp.asarray(LOGITS), do, seeds, steps + 1)
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_sampling_independent_of_slot_position(self):
        # the same (seed, step, logits) must sample the same token no matter
        # which row of the batch it occupies
        logits = np.tile(LOGITS[0], (BATCH, 1))
        do = jnp.ones((BATCH,), bool)
        seeds = jnp.full((BATCH,), 1234, jnp.uint32)
        steps = jnp.full((BATCH,), 3, jnp.int32)
        ids = np.asarray(S.choose_tokens(jnp.asarray(logits), do, seeds, steps))
        assert len(set(ids.tolist())) == 1

    def test_sampling_respects_filtering(self):
        warped = np.full((4, VOCAB), -np.inf, np.float32)
        allowed = [3, 17, 42, 60]
        for i, a in enumerate(allowed):
            warped[i, a] = 1.0
        ids = np.asarray(
            S.choose_tokens(
                jnp.asarray(warped),
                jnp.ones((4,), bool),
                jnp.asarray([1, 2, 3, 4], jnp.uint32),
                jnp.zeros((4,), jnp.int32),
            )
        )
        np.testing.assert_array_equal(ids, allowed)


class TestTokenDetails:
    def test_logprob_rank(self):
        next_ids = jnp.asarray(LOGITS.argmax(-1), jnp.int32)
        det = S.token_details(jnp.asarray(LOGITS), next_ids)
        ref_lp = torch.log_softmax(torch.tensor(LOGITS), -1).numpy()
        np.testing.assert_allclose(
            np.asarray(det.logprob),
            ref_lp[np.arange(BATCH), LOGITS.argmax(-1)],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(det.rank), np.ones(BATCH))

    def test_rank_of_nonmax_token(self):
        order = np.argsort(-LOGITS[0])
        third = order[2]
        det = S.token_details(jnp.asarray(LOGITS[:1]), jnp.asarray([third]))
        assert int(det.rank[0]) == 3

    def test_top_ids_sorted_desc(self):
        det = S.token_details(
            jnp.asarray(LOGITS), jnp.asarray(LOGITS.argmax(-1), jnp.int32))
        top_scores = np.asarray(det.top_scores)
        assert (np.diff(top_scores, axis=-1) <= 1e-6).all()
        np.testing.assert_array_equal(
            np.asarray(det.top_ids)[:, 0], LOGITS.argmax(-1))


class TestPromptDetails:
    def test_shapes_and_first_token(self):
        t = 6
        ids = jnp.asarray(RNG.integers(0, VOCAB, size=(t,)), jnp.int32)
        logits = jnp.asarray(RNG.normal(size=(t - 1, VOCAB)).astype(np.float32))
        det = S.prompt_token_details(logits, ids)
        assert det.logprob.shape == (t,)
        assert np.isnan(float(det.logprob[0]))
        assert int(det.rank[0]) == 0
        ref_lp = torch.log_softmax(torch.tensor(np.asarray(logits)), -1).numpy()
        np.testing.assert_allclose(
            np.asarray(det.logprob)[1:],
            ref_lp[np.arange(t - 1), np.asarray(ids)[1:]],
            rtol=1e-5, atol=1e-6,
        )


class TestFullPipeline:
    def test_greedy_pipeline_end_to_end(self):
        n = 4
        params = S.SlotSamplingParams.empty(n)
        hist = jnp.zeros((n, 16), jnp.int32)
        ids, det = S.next_tokens(
            jnp.asarray(LOGITS[:n]), params,
            gen_count=jnp.zeros((n,), jnp.int32),
            token_history=hist,
            history_len=jnp.zeros((n,), jnp.int32),
            eos_token_id=0,
        )
        np.testing.assert_array_equal(np.asarray(ids), LOGITS[:n].argmax(-1))
        assert np.asarray(det.rank).tolist() == [1] * n

    def test_write_slot_roundtrip(self):
        params = S.SlotSamplingParams.empty(8)
        params = params.write_slot(
            3, temperature=0.7, top_k=40, top_p=0.9, repetition_penalty=1.2,
            min_new_tokens=2, seed=99)
        assert float(params.temperature[3]) == pytest.approx(0.7)
        assert int(params.top_k[3]) == 40
        assert float(params.top_p[3]) == pytest.approx(0.9)
        assert int(params.seed[3]) == 99
        # other slots untouched
        assert float(params.temperature[0]) == 0.0
        assert float(params.top_p[0]) == 1.0
