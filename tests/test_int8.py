"""INT8 weight-only quantization (the reference's bitsandbytes slot)."""

import numpy as np
import pytest

import jax.numpy as jnp

from text_generation_inference_tpu.ops.quant.int8 import (
    Int8Weight,
    dequantize_int8,
    matmul_int8,
    quantize_int8,
    quantize_layer_params,
)
from tests import fixtures


class TestQuantize:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(256, 512)).astype(np.float32)
        q = quantize_int8(w)
        back = np.asarray(dequantize_int8(q, jnp.float32))
        # symmetric absmax per channel: max error is scale/2 ~ absmax/254
        err = np.abs(back - w).max(axis=0)
        bound = np.abs(w).max(axis=0) / 127.0
        assert (err <= bound + 1e-6).all()

    def test_matmul_close_to_dense(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(256, 512)).astype(np.float32)
        x = rng.normal(size=(4, 256)).astype(np.float32)
        y_dense = x @ w
        y_q = np.asarray(matmul_int8(jnp.asarray(x), quantize_int8(w)))
        rel = np.abs(y_q - y_dense) / (np.abs(y_dense) + 1.0)
        assert rel.mean() < 0.02

    def test_stacked_shapes(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(3, 64, 128)).astype(np.float32)
        q = quantize_int8(w)
        assert q.q.shape == (3, 64, 128) and q.scale.shape == (3, 128)
        back = np.asarray(dequantize_int8(q, jnp.float32))
        assert np.abs(back - w).max() < np.abs(w).max() / 64


class TestEngineInt8:
    def test_load_model_int8_generates(self):
        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.engine.engine import (
            InferenceEngine, RequestParams)
        from text_generation_inference_tpu.models import families

        model_dir = fixtures.tiny_llama()
        spec, dense = families.load_model(model_dir, dtype=jnp.float32)
        spec, quant = families.load_model(model_dir, dtype=jnp.float32,
                                          quantize="int8")
        assert isinstance(quant["layers"]["wq"], Int8Weight)
        # embeddings / lm_head stay full precision
        assert not isinstance(quant["embed_tokens"], Int8Weight)

        cfg = ServingConfig(
            max_sequence_length=64, max_new_tokens=16, max_batch_slots=2,
            prefill_buckets=[8, 16])
        cfg.validate()

        def run(params):
            eng = InferenceEngine(spec, params, cfg, eos_token_id=2)
            slot = eng.acquire_slot()
            res = eng.prefill([slot], [[5, 9, 23, 77, 41]],
                              [RequestParams(max_new_tokens=8)])
            toks = [int(res.first_token.next_ids[0])]
            for _ in range(7):
                toks.append(int(eng.decode().next_ids[slot]))
            return toks

        toks_dense = run(dense)
        toks_int8 = run(quant)
        # int8 per-channel error is ~1%; random-weight argmax margins are
        # larger, so the greedy streams should mostly agree
        agree = sum(a == b for a, b in zip(toks_dense, toks_int8))
        assert agree >= 6, (toks_dense, toks_int8)

    def test_fused_int8(self):
        from text_generation_inference_tpu.models import families
        from text_generation_inference_tpu.models.fuse import fuse_params

        model_dir = fixtures.tiny_llama()
        spec, quant = families.load_model(model_dir, dtype=jnp.float32,
                                          quantize="int8")
        fused = fuse_params(spec, quant)
        assert isinstance(fused["layers"]["w_qkv"], Int8Weight)
        assert fused["layers"]["w_qkv"].out_features == \
            spec.q_size + 2 * spec.kv_size
        # fused dequant equals concatenated per-projection dequants
        lp = quant["layers"]
        cat = np.concatenate([
            np.asarray(dequantize_int8(lp[k], jnp.float32))
            for k in ("wq", "wk", "wv")], axis=-1)
        got = np.asarray(dequantize_int8(fused["layers"]["w_qkv"],
                                         jnp.float32))
        np.testing.assert_array_equal(got, cat)
