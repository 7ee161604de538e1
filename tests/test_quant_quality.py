"""Quantization-quality harness: perplexity + token-KL thresholds in CI.

BASELINE.md's quality target is "GPTQ-INT4 perplexity matching the
reference CUDA ExLlamaV2 path within its stated 4-bit delta"; the reference
itself ships no quality harness (quality is inherited from its kernels).
Here the fidelity of every quantization path is measured against the fp
model on a committed fixture corpus and asserted:

  * token-level KL(fp || quant): checkpoint-independent fidelity —
    INT8 must be far tighter than INT4; GPTQ (Hessian-calibrated) must not
    be worse than RTN on the calibration distribution.
  * perplexity delta: the quantized model's teacher-forced ppl must stay
    within a small relative delta of the fp model's.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from text_generation_inference_tpu.models import families
from text_generation_inference_tpu.ops.quant import quality
from text_generation_inference_tpu.ops.quant.int4 import (
    quantize_layer_params_int4,
)
from text_generation_inference_tpu.ops.quant.int8 import quantize_layer_params
from tests import fixtures


@pytest.fixture(scope="module")
def setup():
    spec, params = families.load_model(fixtures.tiny_llama(),
                                       dtype=jnp.float32)
    rng = np.random.default_rng(7)
    # committed fixture corpus: deterministic token sequences (the KL
    # measure is distribution-over-inputs agnostic; ppl uses the same)
    corpus = [rng.integers(1, spec.vocab_size,
                           size=int(n)).tolist() for n in
              rng.integers(12, 48, size=8)]
    return spec, params, corpus


class TestQuantQuality:
    def test_int8_much_tighter_than_int4(self, setup):
        spec, params, corpus = setup
        kl_int8 = quality.mean_token_kl(
            spec, params, quantize_layer_params(params), corpus)
        kl_rtn4 = quality.mean_token_kl(
            spec, params, quantize_layer_params_int4(params, groupsize=32),
            corpus)
        # weight-only int8 carries ~16x finer resolution than 4-bit
        assert kl_int8 < kl_rtn4 / 4
        assert kl_int8 < 0.01

    @pytest.mark.parametrize("act_order", [False, True])
    def test_gptq_not_worse_than_rtn(self, setup, act_order):
        spec, params, corpus = setup
        q_gptq = quality.gptq_quantize_params(
            spec, params, corpus, groupsize=32, act_order=act_order)
        kl_gptq = quality.mean_token_kl(spec, params, q_gptq, corpus)
        kl_rtn = quality.mean_token_kl(
            spec, params, quantize_layer_params_int4(params, groupsize=32),
            corpus)
        # GPTQ calibrates on the corpus' own activations: must beat RTN
        # there (reference bar: within the stated 4-bit delta)
        assert kl_gptq <= kl_rtn * 1.05
        assert kl_gptq < 0.5

    def test_perplexity_delta_bounded(self, setup):
        spec, params, corpus = setup
        ppl_fp = quality.perplexity(spec, params, corpus)
        q_gptq = quality.gptq_quantize_params(spec, params, corpus,
                                              groupsize=32)
        ppl_q4 = quality.perplexity(spec, q_gptq, corpus)
        ppl_q8 = quality.perplexity(
            spec, quantize_layer_params(params), corpus)
        assert abs(ppl_q8 - ppl_fp) / ppl_fp < 0.01
        assert abs(ppl_q4 - ppl_fp) / ppl_fp < 0.10

    def test_int8_kv_decode_kl_near_lossless(self, setup):
        """KV_CACHE_DTYPE=int8 fidelity on the production ring-decode read
        path (per-token-per-head symmetric quant): teacher-forced decode
        distributions must be near-identical to the fp cache — far tighter
        than even INT8 weight quantization."""
        spec, params, corpus = setup
        kl = quality.kv_cache_kl(spec, params, corpus, split=0.5)
        assert np.isfinite(kl)
        assert kl < 1e-3

    def test_outlier_decomposition_beats_plain_int8_on_outlier_model(self):
        """Static LLM.int8 (Int8OutlierWeight): on a model with a systematic
        residual-stream outlier feature, calibrated decomposition must beat
        plain per-channel int8 by a wide margin (the reason the reference
        ships bitsandbytes for >=6.7B checkpoints)."""
        from text_generation_inference_tpu.ops.quant.calibrate import (
            collect_linear_input_absmax)

        spec, params = families.load_model(fixtures.tiny_llama(),
                                           dtype=jnp.float32)
        emb = np.array(params["embed_tokens"], np.float32)
        emb[:, 13] += 30.0                  # hot feature dim, every token
        params = dict(params, embed_tokens=jnp.asarray(emb))
        rng = np.random.default_rng(11)
        corpus = [rng.integers(1, spec.vocab_size, size=int(n)).tolist()
                  for n in rng.integers(12, 48, size=6)]

        calib = rng.integers(0, spec.vocab_size, size=(2, 24))
        stats = collect_linear_input_absmax(spec, params, calib)
        kl_plain = quality.mean_token_kl(
            spec, params, quantize_layer_params(params), corpus)
        kl_outlier = quality.mean_token_kl(
            spec, params, quantize_layer_params(params, outlier_stats=stats),
            corpus)
        assert kl_outlier < kl_plain, (kl_outlier, kl_plain)
        assert kl_outlier < kl_plain / 2, (kl_outlier, kl_plain)
