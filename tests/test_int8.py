"""INT8 weight-only quantization (the reference's bitsandbytes slot)."""

import numpy as np
import pytest

import jax
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


class TestOutlierDecomposition:
    """Static LLM.int8: outlier feature rows bf16, rest int8
    (ops/quant/int8.py::Int8OutlierWeight; reference bitsandbytes slot,
    server/.../utils/layers.py:114-169)."""

    def _outlier_weight(self, seed=0, in_f=256, out_f=512, hot=(3, 77, 190)):
        rng = np.random.default_rng(seed)
        w = rng.normal(size=(in_f, out_f)).astype(np.float32)
        # hot input features: large weight rows inflate every channel's
        # absmax scale in plain int8
        for h in hot:
            w[h] *= 40.0
        return w, np.asarray(hot, np.int32)

    def test_decomposition_exact_roundtrip(self):
        from text_generation_inference_tpu.ops.quant.int8 import (
            dequantize_int8_outliers, quantize_int8_outliers)

        w, hot = self._outlier_weight()
        q = quantize_int8_outliers(w, hot)
        back = np.asarray(dequantize_int8_outliers(q, jnp.float32))
        # outlier rows are exact up to bf16 storage
        np.testing.assert_allclose(back[hot], w[hot], rtol=8e-3)
        # q rows for outliers are zeroed
        assert np.all(np.asarray(q.q)[hot] == 0)

    def test_matmul_beats_plain_int8_under_outliers(self):
        from text_generation_inference_tpu.ops.quant.int8 import (
            matmul_int8_outliers, quantize_int8_outliers)

        w, hot = self._outlier_weight(seed=1)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, w.shape[0])).astype(np.float32)
        y_dense = x @ w
        y_plain = np.asarray(matmul_int8(jnp.asarray(x), quantize_int8(w)))
        y_out = np.asarray(matmul_int8_outliers(
            jnp.asarray(x), quantize_int8_outliers(w, hot)))
        err_plain = np.abs(y_plain - y_dense).mean()
        err_out = np.abs(y_out - y_dense).mean()
        # removing the hot rows un-inflates every channel scale: the error
        # should drop by a large factor, not epsilon
        assert err_out < err_plain / 4, (err_out, err_plain)

    def test_stacked_and_linops_dispatch(self):
        from text_generation_inference_tpu.ops import linear as linops
        from text_generation_inference_tpu.ops.quant.int8 import (
            quantize_int8_outliers)

        rng = np.random.default_rng(3)
        w = rng.normal(size=(3, 64, 128)).astype(np.float32)
        idx = np.stack([np.asarray([1, 7], np.int32)] * 3)
        q = quantize_int8_outliers(w, idx)
        assert q.q.shape == (3, 64, 128) and q.outlier_w.shape == (3, 2, 128)
        assert linops.is_quantized(q)
        x = rng.normal(size=(4, 64)).astype(np.float32)
        per_layer = jax.tree_util.tree_map(lambda a: a[1], q)
        y = np.asarray(linops.matmul(jnp.asarray(x), per_layer))
        rel = np.abs(y - x @ w[1]) / (np.abs(x @ w[1]) + 1.0)
        assert rel.mean() < 0.02

    def test_pick_outlier_features(self):
        from text_generation_inference_tpu.ops.quant.calibrate import (
            pick_outlier_features)

        absmax = np.ones((2, 64), np.float32)
        absmax[0, 5] = 9.0
        absmax[1, 11] = 7.5
        absmax[1, 30] = 6.5
        idx = pick_outlier_features(absmax, threshold=6.0)
        assert idx.shape == (2, 2)
        assert 5 in idx[0]
        assert set(idx[1]) == {11, 30}
        # nothing crosses the threshold -> K == 0
        none = pick_outlier_features(np.ones((2, 64), np.float32))
        assert none.shape == (2, 0)

    def test_calibration_finds_planted_outlier_feature(self):
        from text_generation_inference_tpu.models import families
        from text_generation_inference_tpu.ops.quant.calibrate import (
            collect_linear_input_absmax, pick_outlier_features)

        model_dir = fixtures.tiny_llama()
        spec, params = families.load_model(model_dir, dtype=jnp.float32)
        # plant a systematic residual-stream outlier: one embedding feature
        # column is hot for every token (the LLM.int8 phenomenon)
        emb = np.array(params["embed_tokens"], np.float32)
        emb[:, 13] += 50.0
        params = dict(params, embed_tokens=jnp.asarray(emb))
        rng = np.random.default_rng(0)
        ids = rng.integers(0, spec.vocab_size, size=(2, 16))
        stats = collect_linear_input_absmax(spec, params, ids)
        assert "wq" in stats and stats["wq"].shape == (spec.num_layers,
                                                       spec.hidden_size)
        idx = pick_outlier_features(stats["wq"], threshold=6.0)
        assert idx.shape[1] >= 1
        assert all(13 in row for row in idx)

    def test_load_model_bitsandbytes_generates(self):
        from text_generation_inference_tpu.config import ServingConfig
        from text_generation_inference_tpu.engine.engine import (
            InferenceEngine, RequestParams)
        from text_generation_inference_tpu.models import families
        from text_generation_inference_tpu.ops.quant.int8 import (
            Int8OutlierWeight)

        model_dir = fixtures.tiny_llama()
        spec, dense = families.load_model(model_dir, dtype=jnp.float32)
        spec, quant = families.load_model(model_dir, dtype=jnp.float32,
                                          quantize="bitsandbytes")
        kinds = {type(quant["layers"][k]) for k in ("wq", "wo", "w_down")}
        assert kinds <= {Int8Weight, Int8OutlierWeight}, kinds

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
        toks_q = run(quant)
        agree = sum(a == b for a, b in zip(toks_dense, toks_q))
        assert agree >= 6, (toks_dense, toks_q)

    def test_fuse_outlier_weights(self):
        from text_generation_inference_tpu.models.fuse import fuse_params
        from text_generation_inference_tpu.ops.quant.int8 import (
            Int8OutlierWeight, dequantize_int8_outliers,
            quantize_int8_outliers)

        rng = np.random.default_rng(4)
        lp = {}
        idx = np.stack([np.asarray([2, 9], np.int32)] * 2)
        shapes = {"wq": 64, "wk": 32, "wv": 32}
        dense = {}
        for k, out in shapes.items():
            w = rng.normal(size=(2, 48, out)).astype(np.float32)
            dense[k] = w
            lp[k] = quantize_int8_outliers(w, idx)
        params = {"layers": lp}

        from text_generation_inference_tpu.models.core import DecoderSpec

        spec = DecoderSpec(vocab_size=64, hidden_size=48, num_layers=2,
                           num_heads=4, num_kv_heads=2, head_dim=16,
                           intermediate_size=96, pos="rope", norm="rmsnorm",
                           activation="silu_glu")
        fused = fuse_params(spec, params)
        w_qkv = fused["layers"]["w_qkv"]
        assert isinstance(w_qkv, Int8OutlierWeight)
        cat = np.concatenate(
            [np.asarray(dequantize_int8_outliers(
                quantize_int8_outliers(dense[k], idx), jnp.float32))
             for k in ("wq", "wk", "wv")], axis=-1)
        got = np.asarray(dequantize_int8_outliers(w_qkv, jnp.float32))
        np.testing.assert_array_equal(got, cat)
