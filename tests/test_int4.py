"""INT4 GPTQ quantization: pack/unpack roundtrip, dequant, fused kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_generation_inference_tpu.ops.pallas import int4_matmul as im
from text_generation_inference_tpu.ops.quant import int4


class TestPacking:
    def test_row_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.integers(0, 16, size=(64, 32)).astype(np.int32)
        packed = int4.pack_rows(q)
        assert packed.shape == (8, 32)
        got = np.asarray(int4.unpack_rows(jnp.asarray(packed)))
        np.testing.assert_array_equal(got, q)

    def test_col_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.integers(0, 16, size=(4, 64)).astype(np.int32)
        packed = int4.pack_cols(q)
        assert packed.shape == (4, 8)
        got = np.asarray(int4.unpack_cols(jnp.asarray(packed)))
        np.testing.assert_array_equal(got, q)


class TestRtnQuantization:
    def test_dequant_close_to_original(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(256, 64)).astype(np.float32)
        q = int4.quantize_rtn(w, groupsize=64)
        deq = np.asarray(int4.dequantize(q, jnp.float32))
        # int4 with per-group scale: error bounded by scale/2 per element
        scales = np.asarray(q.scales)
        bound = np.repeat(scales, 64, axis=0) * 0.51
        assert (np.abs(deq - w) <= bound + 1e-5).all()

    def test_matmul_dequant(self):
        rng = np.random.default_rng(3)
        w = rng.normal(size=(128, 64)).astype(np.float32)
        x = rng.normal(size=(4, 128)).astype(np.float32)
        q = int4.quantize_rtn(w, groupsize=32)
        got = np.asarray(int4.matmul_dequant(jnp.asarray(x), q))
        want = x @ np.asarray(int4.dequantize(q, jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestFusedKernel:
    @pytest.mark.parametrize("in_f,out_f,gs,bi,bo", [
        (256, 128, 64, 128, 128),
        (512, 256, 128, 256, 128),
        (256, 128, 128, 64, 64),   # block_in < groupsize -> clamped
        (384, 128, 128, 128, 128), # in not multiple of block count edge
    ])
    def test_matches_dequant(self, in_f, out_f, gs, bi, bo):
        if in_f % gs:
            pytest.skip("in_features must be multiple of groupsize")
        rng = np.random.default_rng(5)
        w = rng.normal(size=(in_f, out_f)).astype(np.float32)
        x = rng.normal(size=(8, in_f)).astype(np.float32)
        q = int4.quantize_rtn(w, groupsize=gs)
        want = np.asarray(int4.matmul_dequant(jnp.asarray(x), q))
        got = np.asarray(im.int4_matmul(
            jnp.asarray(x), q, block_in=bi, block_out=bo, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_sequential_gidx_detection(self):
        rng = np.random.default_rng(6)
        w = rng.normal(size=(128, 32)).astype(np.float32)
        q = int4.quantize_rtn(w, groupsize=32)
        assert im.is_sequential_gidx(q)
        shuffled = q._replace(g_idx=q.g_idx[::-1])
        assert not im.is_sequential_gidx(shuffled)
