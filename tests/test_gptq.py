"""Offline GPTQ quantization → load → generate pipeline."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_generation_inference_tpu.ops.quant import int4
from text_generation_inference_tpu.ops.quant.gptq_quantize import (
    gptq_quantize_weight,
    quantize_model,
)
from tests import fixtures


class TestGptqAlgorithm:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.in_f, self.out_f = 128, 64
        self.w = rng.normal(size=(self.out_f, self.in_f)).astype(np.float32)
        x = rng.normal(size=(512, self.in_f)).astype(np.float32)
        self.x = x
        self.h = 2.0 * x.T @ x

    def reconstruction_error(self, qweight, qzeros, scales, g_idx):
        q = int4.Int4Weight(
            qweight=jnp.asarray(qweight), qzeros=jnp.asarray(qzeros),
            scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx))
        deq = np.asarray(int4.dequantize(q, jnp.float32))     # [in, out]
        # GPTQ objective: activation-space error ||xW - xW_q||
        return np.mean((self.x @ self.w.T - self.x @ deq) ** 2)

    def test_gptq_beats_rtn(self):
        qw, qz, sc, gi = gptq_quantize_weight(
            self.w, self.h, groupsize=32)
        gptq_err = self.reconstruction_error(qw, qz, sc, gi)

        rtn = int4.quantize_rtn(self.w.T.copy(), groupsize=32)
        deq_rtn = np.asarray(int4.dequantize(rtn, jnp.float32))
        rtn_err = np.mean((self.x @ self.w.T - self.x @ deq_rtn) ** 2)

        assert gptq_err < rtn_err, (gptq_err, rtn_err)
        # and the quantization must be reasonably tight in absolute terms
        signal = np.mean((self.x @ self.w.T) ** 2)
        assert gptq_err / signal < 0.01

    def test_act_order_roundtrip(self):
        qw, qz, sc, gi = gptq_quantize_weight(
            self.w, self.h, groupsize=32, act_order=True)
        # g_idx must be a permutation-consistent group map
        assert sorted(np.bincount(gi).tolist()) == [32] * 4
        err = self.reconstruction_error(qw, qz, sc, gi)
        signal = np.mean((self.x @ self.w.T) ** 2)
        assert err / signal < 0.01

    def test_normalize_act_order_preserves_dequant(self):
        qw, qz, sc, gi = gptq_quantize_weight(
            self.w, self.h, groupsize=32, act_order=True)
        raw = int4.Int4Weight(
            qweight=jnp.asarray(qw), qzeros=jnp.asarray(qz),
            scales=jnp.asarray(sc), g_idx=jnp.asarray(gi))
        norm = int4.normalize_act_order(qw, qz, sc, gi)
        assert norm.perm is not None
        x = np.random.default_rng(1).normal(size=(4, self.in_f)).astype(np.float32)
        # raw path: plain dequant with original g_idx
        y_raw = x @ np.asarray(int4.dequantize(raw, jnp.float32))
        # normalized path: permute inputs then sequential-group dequant
        xp = x[:, np.asarray(norm.perm)]
        y_norm = xp @ np.asarray(int4.dequantize(
            norm._replace(perm=None), jnp.float32))
        np.testing.assert_allclose(y_raw, y_norm, rtol=1e-4, atol=1e-4)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def quantized_dir(self, tmp_path_factory):
        model_dir = fixtures.tiny_llama()
        out = tmp_path_factory.mktemp("gptq") / "tiny_llama_gptq"
        quantize_model(model_dir, str(out), bits=4, groupsize=32,
                       num_samples=4, seq_len=64)
        return str(out)

    def test_quantize_gptq_flag(self, quantized_dir):
        """QUANTIZE=gptq is a requirement-check, not a quantizer: it loads
        a GPTQ checkpoint fine and errors on an fp one (closing the silent
        no-op the reference also trips on, server/main.py plumbing)."""
        from text_generation_inference_tpu.models import families

        spec, params = families.load_model(quantized_dir, dtype=jnp.float32,
                                           quantize="gptq")
        from text_generation_inference_tpu.ops.quant.int4 import Int4Weight

        assert isinstance(params["layers"]["wq"], Int4Weight)
        with pytest.raises(ValueError, match="no GPTQ tensors"):
            families.load_model(fixtures.tiny_llama(), dtype=jnp.float32,
                                quantize="gptq")
        with pytest.raises(ValueError, match="unsupported quantize"):
            families.load_model(fixtures.tiny_llama(), dtype=jnp.float32,
                                quantize="int4")

    def test_load_and_generate(self, quantized_dir):
        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.engine.engine import (
            InferenceEngine, RequestParams)
        from text_generation_inference_tpu.models import families

        spec, params = families.load_model(quantized_dir, dtype=jnp.float32)
        from text_generation_inference_tpu.ops.quant.int4 import Int4Weight

        assert isinstance(params["layers"]["wq"], Int4Weight)
        cfg = ServingConfig(max_sequence_length=64, max_new_tokens=16,
                            max_batch_slots=2, prefill_buckets=[16])
        cfg.validate()
        engine = InferenceEngine(spec, params, cfg, eos_token_id=2)
        slot = engine.acquire_slot()
        res = engine.prefill([slot], [[5, 9, 23, 77, 41]], [RequestParams()])
        toks = [int(res.first_token.next_ids[0])]
        for _ in range(5):
            toks.append(int(engine.decode().next_ids[slot]))
        assert all(0 <= t < spec.vocab_size for t in toks)

    def test_quantized_close_to_fp32(self, quantized_dir):
        """Quantized logits must stay close to fp32 logits on tiny models
        (the perplexity-parity stand-in, BASELINE.md)."""
        from text_generation_inference_tpu.models import core, families

        model_dir = fixtures.tiny_llama()
        spec_f, params_f = families.load_model(model_dir, dtype=jnp.float32)
        spec_q, params_q = families.load_model(quantized_dir, dtype=jnp.float32)

        ids = np.zeros((1, 16), np.int32)
        ids[0, :6] = [5, 9, 23, 77, 41, 3]
        cache_f = core.KVCache.create(spec_f, 1, 32, jnp.float32)
        cache_q = core.KVCache.create(spec_q, 1, 32, jnp.float32)
        lf, _ = core.prefill(spec_f, params_f, jnp.asarray(ids),
                             jnp.asarray([6], jnp.int32),
                             jnp.asarray([0], jnp.int32), cache_f)
        lq, _ = core.prefill(spec_q, params_q, jnp.asarray(ids),
                             jnp.asarray([6], jnp.int32),
                             jnp.asarray([0], jnp.int32), cache_q)
        pf = np.asarray(jnp.take_along_axis(
            jnp.log(jnp.clip(jnp.exp(lf[0, :6]) /
                             jnp.sum(jnp.exp(lf[0, :6]), -1, keepdims=True),
                             1e-9, None)), jnp.argmax(lf[0, :6], -1)[:, None], 1))
        # simpler: compare softmax distributions
        import scipy.special

        p_f = scipy.special.softmax(np.asarray(lf[0, :6]), axis=-1)
        p_q = scipy.special.softmax(np.asarray(lq[0, :6]), axis=-1)
        tv = 0.5 * np.abs(p_f - p_q).sum(-1).mean()
        assert tv < 0.25, f"quantized distribution diverged: TV={tv}"


class TestShapedGptqCheckpoint:
    """scripts/make_shaped_checkpoint.py --quantize gptq writes tensors the
    family loader consumes directly — the fixture path the north-star
    loadgen serves (7B GPTQ-INT4; reference consumes the same AutoGPTQ
    layout, server/.../utils/weights.py:203-229)."""

    def test_write_load_decode(self, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "scripts"))
        from make_shaped_checkpoint import PRESETS, write_checkpoint

        out = str(tmp_path / "mini_gptq")
        write_checkpoint(out, PRESETS["mini"], quantize="gptq")
        assert (tmp_path / "mini_gptq" / "quantize_config.json").exists()

        from text_generation_inference_tpu.models import core, families

        spec, params = families.load_model(out, dtype=jnp.float32,
                                           quantize="gptq")
        assert isinstance(params["layers"]["wq"], int4.Int4Weight), \
            type(params["layers"]["wq"])

        ids = np.zeros((1, 8), np.int32)
        ids[0, :4] = [5, 9, 23, 77]
        cache = core.KVCache.create(spec, 1, 16, jnp.float32)
        logits, _ = core.prefill(spec, params, jnp.asarray(ids),
                                 jnp.asarray([4], jnp.int32),
                                 jnp.asarray([0], jnp.int32), cache)
        out_l = np.asarray(logits)
        assert np.isfinite(out_l).all()
        # random-but-scaled weights: logits must be sane, not degenerate
        assert 1e-4 < np.abs(out_l).max() < 1e3
