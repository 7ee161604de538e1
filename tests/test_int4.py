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


class TestNativeS4:
    """Native-s4 representation (populate_q4 / int4_matmul_s4): the TPU
    decode path converts packed weights to jnp.int4 inside each chunk jit
    (linops.prepare_params) — ~12x faster than the packed kernel."""

    def _weight(self, in_f=256, out_f=256, gs=128, seed=0):
        from text_generation_inference_tpu.ops.quant.int4 import quantize_rtn

        rng = np.random.default_rng(seed)
        return quantize_rtn(
            rng.normal(size=(in_f, out_f)).astype(np.float32), groupsize=gs)

    def test_dequant_s4_exact_match(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            dequantize, dequantize_s4, populate_q4)

        w = self._weight()
        dense = np.asarray(dequantize(w, jnp.float32))
        w4 = populate_q4(w)
        assert w4.qweight is None and w4.q4 is not None
        dense4 = np.asarray(dequantize_s4(w4, jnp.float32))
        # association differs ((q-z)*s vs q*s - z*s): equal to float eps
        np.testing.assert_allclose(dense4, dense, rtol=1e-5, atol=1e-6)

    def test_matmul_dequant_uses_q4(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            matmul_dequant, populate_q4)

        w = self._weight(seed=1)
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(4, w.in_features)).astype(np.float32))
        y_packed = np.asarray(matmul_dequant(x, w))
        y_s4 = np.asarray(matmul_dequant(x, populate_q4(w)))
        np.testing.assert_allclose(y_s4, y_packed, rtol=1e-5, atol=1e-5)

    def test_lane_pack_roundtrip(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            pack_lane, unpack_lane)

        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.integers(0, 16, size=(64, 128)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(unpack_lane(pack_lane(q))), np.asarray(q))

    def test_to_lane_matches_row_major_q4(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            populate_q4, to_lane)

        w = self._weight(seed=5)
        wl = to_lane(w)
        assert wl.qweight is None and wl.qlane is not None
        assert wl.in_features == w.in_features
        assert wl.out_features == w.out_features
        q4_row = np.asarray(populate_q4(w).q4, np.int8)
        q4_lane = np.asarray(populate_q4(wl).q4, np.int8)
        np.testing.assert_array_equal(q4_lane, q4_row)

    def test_to_lane_stacked(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            Int4Weight, populate_q4, to_lane)

        w0, w1 = self._weight(seed=8), self._weight(seed=9)
        stacked = Int4Weight(
            qweight=jnp.stack([w0.qweight, w1.qweight]),
            qzeros=jnp.stack([w0.qzeros, w1.qzeros]),
            scales=jnp.stack([w0.scales, w1.scales]),
            g_idx=jnp.stack([w0.g_idx, w1.g_idx]),
            perm=None,
            zbias=jnp.stack([w0.zbias, w1.zbias]))
        q4_row = np.asarray(populate_q4(stacked).q4, np.int8)
        q4_lane = np.asarray(populate_q4(to_lane(stacked)).q4, np.int8)
        np.testing.assert_array_equal(q4_lane, q4_row)

    def test_populate_q4_stacked(self):
        from text_generation_inference_tpu.ops.quant.int4 import (
            Int4Weight, dequantize, dequantize_s4, populate_q4)

        w0, w1 = self._weight(seed=3), self._weight(seed=4)
        stacked = Int4Weight(
            qweight=jnp.stack([w0.qweight, w1.qweight]),
            qzeros=jnp.stack([w0.qzeros, w1.qzeros]),
            scales=jnp.stack([w0.scales, w1.scales]),
            g_idx=jnp.stack([w0.g_idx, w1.g_idx]),
            perm=None,
            zbias=jnp.stack([w0.zbias, w1.zbias]))
        s4 = populate_q4(stacked)
        assert s4.q4.shape == (2, w0.in_features, w0.out_features)
        for i, w in enumerate((w0, w1)):
            got = np.asarray(dequantize_s4(
                s4._replace(q4=s4.q4[i], scales=s4.scales[i],
                            zbias=s4.zbias[i], g_idx=s4.g_idx[i]),
                jnp.float32))
            np.testing.assert_allclose(
                got, np.asarray(dequantize(w, jnp.float32)),
                rtol=1e-5, atol=1e-6)

    def test_s4_kernel_interpret(self):
        from text_generation_inference_tpu.ops.pallas.int4_matmul import (
            int4_matmul_s4)
        from text_generation_inference_tpu.ops.quant.int4 import (
            matmul_dequant, populate_q4)

        w = populate_q4(self._weight(in_f=256, out_f=256, seed=5))
        x = jnp.asarray(np.random.default_rng(6).normal(
            size=(4, 256)).astype(np.float32))
        try:
            y = int4_matmul_s4(x, w, compute_dtype=jnp.float32,
                               interpret=True)
        except Exception as e:
            pytest.skip(f"s4 unsupported in interpret mode: {e}")
        ref = matmul_dequant(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_s4_stacked_kernel_interpret(self):
        """Stacked-weight kernel (scalar-prefetch layer index) matches the
        per-layer dequant reference for every layer index."""
        from text_generation_inference_tpu.ops.pallas.int4_matmul import (
            int4_matmul_s4_stacked, prep_stacked_scales, stacked_blocks)
        from text_generation_inference_tpu.ops.quant.int4 import (
            Int4Weight, matmul_dequant, populate_q4)

        gs, in_f, out_f = 128, 256, 256
        ws = [populate_q4(self._weight(in_f, out_f, gs, seed=10 + i))
              for i in range(3)]
        q4 = jnp.stack([w.q4 for w in ws])
        scales = jnp.stack([w.scales for w in ws])
        zbias = jnp.stack([w.zbias for w in ws])
        bi, _bo = stacked_blocks(in_f, out_f, gs, 4)
        sc_b, zb_b = prep_stacked_scales(scales, zbias, in_f, bi, gs,
                                         compute_dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(11).normal(
            size=(4, in_f)).astype(np.float32))
        for li, w in enumerate(ws):
            try:
                y = int4_matmul_s4_stacked(
                    x, q4, sc_b, zb_b, jnp.int32(li), groupsize=gs,
                    compute_dtype=jnp.float32, interpret=True)
            except Exception as e:
                pytest.skip(f"s4 unsupported in interpret mode: {e}")
            ref = matmul_dequant(x, w)
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)


class TestStackedScan:
    """_layer_scan + split_stacked_quant: the stacked scalar-prefetch path
    must produce the same numbers as the plain scan-xs path."""

    def _stacked_weight(self, L=3, in_f=256, out_f=256, gs=128):
        from text_generation_inference_tpu.ops.quant.int4 import (
            Int4Weight, quantize_rtn)

        ws = [quantize_rtn(np.random.default_rng(20 + i).normal(
            size=(in_f, out_f)).astype(np.float32), groupsize=gs)
            for i in range(L)]
        return Int4Weight(
            qweight=jnp.stack([w.qweight for w in ws]),
            qzeros=jnp.stack([w.qzeros for w in ws]),
            scales=jnp.stack([w.scales for w in ws]),
            g_idx=jnp.stack([w.g_idx for w in ws]),
            perm=None,
            zbias=jnp.stack([w.zbias for w in ws]))

    def test_matches_plain_scan(self, monkeypatch):
        import functools

        from text_generation_inference_tpu.models import core
        from text_generation_inference_tpu.ops import linear as linops
        from text_generation_inference_tpu.ops.pallas import int4_matmul as im

        L, in_f, out_f = 3, 256, 256
        layers = {
            "w": self._stacked_weight(L, in_f, out_f),
            "b": jnp.asarray(np.random.default_rng(30).normal(
                size=(L, out_f)).astype(np.float32)),
        }
        x = jnp.asarray(np.random.default_rng(31).normal(
            size=(4, in_f)).astype(np.float32))

        def layer(x, inputs):
            lp, extra = inputs
            y = linops.matmul(x, lp["w"]) + lp["b"] + extra
            return (y[:, :in_f] * 0.01).astype(x.dtype), y.sum()

        extras = jnp.arange(L, dtype=jnp.float32)

        # reference: plain scan over packed weights (CPU dequant path)
        monkeypatch.setenv("INT4_STACKED", "0")
        ref_x, ref_ys = core._layer_scan(layer, x, layers, (extras,))

        # stacked path: pretend we're on TPU, run the kernel interpreted
        monkeypatch.setenv("INT4_STACKED", "1")
        monkeypatch.setattr(linops, "_use_pallas", lambda: True)
        monkeypatch.setattr(
            im, "int4_matmul_s4_stacked",
            functools.partial(im.int4_matmul_s4_stacked, interpret=True,
                              compute_dtype=jnp.float32))
        prepared = linops.prepare_params(layers, rows=4)
        w = prepared["w"]
        assert w.q4 is not None and w.sc_b is not None, \
            "prepare_params(rows=) must populate q4 and blocked scales"
        split = linops.split_stacked_quant(prepared, rows=4)
        assert split is not None, "stacked split must engage"
        got_x, got_ys = core._layer_scan(layer, x, prepared, (extras,))
        # prepare_params blocks scales in bf16 (the TPU compute dtype), so
        # tolerance is bf16-eps scale, not f32
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(got_ys), np.asarray(ref_ys),
                                   rtol=1e-2, atol=1e-2)


class TestFusedMlpKernel:
    """int4_mlp_s4_stacked: whole GLU MLP in one kernel must match the
    two-GEMM + activation reference per layer."""

    def make(self, layers=3, s=5, h=256, inter=384, gs=128, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(s, h)) * 0.3, jnp.float32)
        gu_q = rng.integers(-8, 8, size=(layers, h, 2 * inter))
        d_q = rng.integers(-8, 8, size=(layers, inter, h))
        gu_sc = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(layers, h // gs, 2 * inter))
            * (0.6 / np.sqrt(h) / 4.6), jnp.float32)
        d_sc = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(layers, inter // gs, h))
            * (0.6 / np.sqrt(inter) / 4.6), jnp.float32)
        # natural zbias = (zero+1)*scale with zero = 8 (symmetric)
        gu_zb = 8.0 * gu_sc
        d_zb = 8.0 * d_sc
        gu_q4 = jnp.asarray(gu_q, jnp.int4)
        d_q4 = jnp.asarray(d_q, jnp.int4)
        return x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs

    @staticmethod
    def ref_mlp(x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs, li,
                activation="silu_glu"):
        def deq(q4, sc, zb):
            in_f, out_f = q4.shape
            w = (q4.astype(jnp.float32)
                 * jnp.repeat(sc, gs, axis=0)
                 - jnp.repeat(zb - 8.0 * sc, gs, axis=0))
            return w
        wgu = deq(gu_q4[li], gu_sc[li], gu_zb[li])
        inter = d_q4.shape[1]
        gu = x @ wgu
        g, u = gu[:, :inter], gu[:, inter:]
        if activation == "silu_glu":
            a = jax.nn.silu(g) * u
        else:
            a = jax.nn.gelu(g, approximate=True) * u
        wd = deq(d_q4[li], d_sc[li], d_zb[li])
        return a @ wd

    @staticmethod
    def blocked_down(d_sc, d_zb, inter, gs, s, block_i=None):
        bi = block_i or im.mlp_block_i(inter, d_sc.shape[2], gs,
                                       max(8, -(-s // 8) * 8))
        return im.prep_stacked_scales(d_sc, d_zb, inter, bi, gs)

    def test_matches_reference_per_layer(self):
        x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs = self.make()
        inter = d_q4.shape[1]
        dsb, dzb_b = self.blocked_down(d_sc, d_zb, inter, gs, x.shape[0])
        for li in range(gu_q4.shape[0]):
            ref = self.ref_mlp(x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb,
                               gs, li)
            got = im.int4_mlp_s4_stacked(
                x, gu_q4, gu_sc, gu_zb, d_q4, dsb, dzb_b,
                jnp.asarray([li], jnp.int32), inter=inter,
                groupsize_down=gs,
                compute_dtype=jnp.float32, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)

    def test_small_block_i(self):
        x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs = self.make(seed=3)
        inter = d_q4.shape[1]
        dsb, dzb_b = self.blocked_down(d_sc, d_zb, inter, gs, x.shape[0],
                                       block_i=128)
        ref = self.ref_mlp(x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs, 1)
        got = im.int4_mlp_s4_stacked(
            x, gu_q4, gu_sc, gu_zb, d_q4, dsb, dzb_b,
            jnp.asarray([1], jnp.int32), inter=inter, groupsize_down=gs,
            block_i=128, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_gelu_glu(self):
        x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs = self.make(seed=5)
        inter = d_q4.shape[1]
        dsb, dzb_b = self.blocked_down(d_sc, d_zb, inter, gs, x.shape[0])
        ref = self.ref_mlp(x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs, 0,
                           activation="gelu_glu")
        got = im.int4_mlp_s4_stacked(
            x, gu_q4, gu_sc, gu_zb, d_q4, dsb, dzb_b,
            jnp.asarray([0], jnp.int32), inter=inter, groupsize_down=gs,
            activation="gelu_glu", compute_dtype=jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_traced_layer_in_scan(self):
        x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb, gs = self.make(layers=2,
                                                                seed=7)
        inter = d_q4.shape[1]
        dsb, dzb_b = self.blocked_down(d_sc, d_zb, inter, gs, x.shape[0])

        def step(carry, li):
            y = im.int4_mlp_s4_stacked(
                x, gu_q4, gu_sc, gu_zb, d_q4, dsb, dzb_b, li,
                inter=inter, groupsize_down=gs,
                compute_dtype=jnp.float32, interpret=True)
            return carry, y

        _, ys = jax.lax.scan(step, 0, jnp.arange(2, dtype=jnp.int32))
        for li in range(2):
            ref = self.ref_mlp(x, gu_q4, gu_sc, gu_zb, d_q4, d_sc, d_zb,
                               gs, li)
            np.testing.assert_allclose(np.asarray(ys[li]), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
