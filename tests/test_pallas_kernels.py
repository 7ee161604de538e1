"""Pallas kernel correctness in interpreter mode (CPU).

Real-TPU runs are covered by bench/perf scripts; interpret mode validates
the kernel math (online softmax, masking, block clamping) device-free.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_generation_inference_tpu.ops.pallas import decode_attention as da
from text_generation_inference_tpu.ops.pallas import flash_prefill as fp
from text_generation_inference_tpu.ops.pallas import paged_attention as pa


def make_inputs(s=4, kh=2, g=4, d=64, t=512, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(s, kh, g, d)), dtype)
    k = jnp.asarray(rng.normal(size=(s, kh, t, d)), dtype)
    v = jnp.asarray(rng.normal(size=(s, kh, t, d)), dtype)
    ctx = jnp.asarray(rng.integers(1, t + 1, size=(s,)), jnp.int32)
    return q, k, v, ctx


class TestDecodeAttention:
    def test_matches_reference(self):
        q, k, v, ctx = make_inputs()
        ref = da.decode_attention_reference(q, k, v, ctx)
        got = da.decode_attention(q, k, v, ctx, block_t=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_short_contexts(self):
        q, k, v, _ = make_inputs(t=512)
        ctx = jnp.asarray([1, 2, 3, 130], jnp.int32)
        ref = da.decode_attention_reference(q, k, v, ctx)
        got = da.decode_attention(q, k, v, ctx, block_t=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_full_context(self):
        q, k, v, _ = make_inputs(t=256)
        ctx = jnp.full((4,), 256, jnp.int32)
        ref = da.decode_attention_reference(q, k, v, ctx)
        got = da.decode_attention(q, k, v, ctx, block_t=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_block_not_dividing_t(self):
        q, k, v, ctx = make_inputs(t=384, seed=3)
        ref = da.decode_attention_reference(q, k, v, ctx)
        got = da.decode_attention(q, k, v, ctx, block_t=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16(self):
        q, k, v, ctx = make_inputs(dtype=jnp.bfloat16, seed=5)
        ref = da.decode_attention_reference(q, k, v, ctx)
        got = da.decode_attention(q, k, v, ctx, block_t=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


def make_prefill_inputs(n=2, t=256, kh=2, g=4, d=64, seed=0,
                        dtype=jnp.float32, lengths=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(n, t, kh, g, d)), dtype)
    k = jnp.asarray(rng.normal(size=(n, t, kh, d)), dtype)
    v = jnp.asarray(rng.normal(size=(n, t, kh, d)), dtype)
    if lengths is None:
        lengths = rng.integers(1, t + 1, size=(n,))
    lengths = jnp.asarray(lengths, jnp.int32)
    return q, k, v, lengths


class TestFlashPrefill:
    def check(self, q, k, v, lengths, **kw):
        ref = fp.flash_prefill_reference(q, k, v, lengths)
        got = fp.flash_prefill(q, k, v, lengths, interpret=True, **kw)
        # only positions within each row's true length are meaningful
        for i, ln in enumerate(np.asarray(lengths)):
            np.testing.assert_allclose(
                np.asarray(got, np.float32)[i, :ln],
                np.asarray(ref, np.float32)[i, :ln],
                rtol=2e-5, atol=2e-5)

    def test_full_lengths(self):
        q, k, v, lengths = make_prefill_inputs(lengths=[256, 256])
        self.check(q, k, v, lengths)

    def test_ragged_lengths(self):
        q, k, v, lengths = make_prefill_inputs(lengths=[100, 17], seed=2)
        self.check(q, k, v, lengths)

    def test_block_not_dividing(self):
        q, k, v, lengths = make_prefill_inputs(t=192, lengths=[192, 50], seed=3)
        self.check(q, k, v, lengths, block_q=128, block_k=128)

    def test_small_blocks(self):
        q, k, v, lengths = make_prefill_inputs(t=128, lengths=[128, 64], seed=4)
        self.check(q, k, v, lengths, block_q=32, block_k=64)


class TestPagedAttention:
    def make(self, s=3, kh=2, g=4, d=64, pages=16, page_size=64, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(s, kh, g, d)), jnp.float32)
        # head-major pool layout [K, P*page, D]
        k_pool = jnp.asarray(
            rng.normal(size=(kh, pages * page_size, d)), jnp.float32)
        v_pool = jnp.asarray(
            rng.normal(size=(kh, pages * page_size, d)), jnp.float32)
        # each slot owns a random disjoint-ish set of pages
        max_pages = 4
        bt = rng.choice(pages, size=(s, max_pages), replace=False)
        ctx = rng.integers(1, max_pages * page_size + 1, size=(s,))
        return (q, k_pool, v_pool, jnp.asarray(bt, jnp.int32),
                jnp.asarray(ctx, jnp.int32), page_size)

    def test_matches_gather_reference(self):
        q, kp, vp, bt, ctx, ps = self.make()
        ref = pa.paged_decode_attention_reference(q, kp, vp, bt, ctx, ps)
        got = pa.paged_decode_attention(q, kp, vp, bt, ctx, ps, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_single_page_contexts(self):
        q, kp, vp, bt, _, ps = self.make(seed=2)
        ctx = jnp.asarray([1, ps, ps // 2], jnp.int32)
        ref = pa.paged_decode_attention_reference(q, kp, vp, bt, ctx, ps)
        got = pa.paged_decode_attention(q, kp, vp, bt, ctx, ps, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_page_indirection_matters(self):
        """Shuffling the block table must change results accordingly."""
        q, kp, vp, bt, ctx, ps = self.make(seed=3)
        shuffled = jnp.roll(bt, 1, axis=1)
        a = pa.paged_decode_attention(q, kp, vp, bt, ctx, ps, interpret=True)
        b = pa.paged_decode_attention(q, kp, vp, shuffled, ctx, ps,
                                      interpret=True)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestPagedAttentionPartial(TestPagedAttention):
    """Stats-returning variant (flash-decoding merge support)."""

    def test_partial_matches_reference_partial(self):
        q, kp, vp, bt, ctx, ps = self.make()
        acc_r, m_r, l_r = pa.paged_decode_attention_partial_reference(
            q, kp, vp, bt, ctx, ps)
        acc_k, m_k, l_k = pa.paged_decode_attention_partial(
            q, kp, vp, bt, ctx, ps, interpret=True)
        np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_r),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_r),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r),
                                   rtol=2e-4, atol=2e-4)

    def test_partial_normalizes_to_full(self):
        q, kp, vp, bt, ctx, ps = self.make(seed=3)
        acc, m, l = pa.paged_decode_attention_partial(
            q, kp, vp, bt, ctx, ps, interpret=True)
        full = pa.paged_decode_attention_reference(q, kp, vp, bt, ctx, ps)
        got = np.asarray(acc) / np.maximum(np.asarray(l)[..., None], 1e-30)
        np.testing.assert_allclose(got, np.asarray(full),
                                   rtol=2e-5, atol=2e-5)

    def test_zero_context_slot(self):
        # ctx == 0 (chunk_start of a fresh chunk at position 0): the merge
        # must be able to ignore the pool part entirely
        q, kp, vp, bt, _, ps = self.make(seed=4)
        ctx = jnp.asarray([0, ps, 5], jnp.int32)
        acc, m, l = pa.paged_decode_attention_partial(
            q, kp, vp, bt, ctx, ps, interpret=True)
        assert np.asarray(l)[0].max() == 0.0
        assert np.all(np.isneginf(np.asarray(m)[0]))


class TestPagedAttentionPartialStacked(TestPagedAttention):
    """Layer-stacked pools + scalar-prefetched layer index: every layer of
    the stack must reproduce the per-layer partial kernel exactly."""

    def make_stacked(self, layers=3, seed=7, **kw):
        rng = np.random.default_rng(seed)
        q, kp, vp, bt, ctx, ps = self.make(seed=seed, **kw)
        kh, rows, d = kp.shape
        kps = jnp.asarray(rng.normal(size=(layers, kh, rows, d)), jnp.float32)
        vps = jnp.asarray(rng.normal(size=(layers, kh, rows, d)), jnp.float32)
        return q, kps, vps, bt, ctx, ps

    def test_every_layer_matches_unstacked(self):
        q, kps, vps, bt, ctx, ps = self.make_stacked()
        for li in range(kps.shape[0]):
            acc_r, m_r, l_r = pa.paged_decode_attention_partial(
                q, kps[li], vps[li], bt, ctx, ps, interpret=True)
            acc_s, m_s, l_s = pa.paged_decode_attention_partial_stacked(
                q, kps, vps, bt, ctx, jnp.asarray([li], jnp.int32), ps,
                interpret=True)
            np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_r),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(acc_s), np.asarray(acc_r),
                                       rtol=2e-4, atol=2e-4)

    def test_traced_layer_index_in_scan(self):
        """The serving path passes li as a traced scan value — the kernel
        must accept it (scalar prefetch of a dynamic scalar)."""
        q, kps, vps, bt, ctx, ps = self.make_stacked(layers=2, seed=9)

        def step(carry, li):
            acc, m, l = pa.paged_decode_attention_partial_stacked(
                q, kps, vps, bt, ctx, li, ps, interpret=True)
            return carry, acc

        _, accs = jax.lax.scan(
            step, 0, jnp.arange(2, dtype=jnp.int32))
        for li in range(2):
            ref, _, _ = pa.paged_decode_attention_partial_reference(
                q, kps[li], vps[li], bt, ctx, ps)
            np.testing.assert_allclose(np.asarray(accs[li]), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)

    def test_zero_context_slot_stacked(self):
        q, kps, vps, bt, _, ps = self.make_stacked(seed=11)
        ctx = jnp.asarray([0, ps, 5], jnp.int32)
        acc, m, l = pa.paged_decode_attention_partial_stacked(
            q, kps, vps, bt, ctx, jnp.asarray([1], jnp.int32), ps,
            interpret=True)
        assert np.asarray(l)[0].max() == 0.0
        assert np.all(np.isneginf(np.asarray(m)[0]))

    def make_stacked_int8(self, layers=3, seed=13, **kw):
        """int8 pools + [L, K, POOL_R] f32 scale pools (same quantization
        scheme as PagedKVCache: symmetric per-row-per-head absmax/127)."""
        rng = np.random.default_rng(seed)
        q, kps, vps, bt, ctx, ps = self.make_stacked(layers=layers,
                                                     seed=seed, **kw)
        def quant(p):
            s = np.abs(np.asarray(p)).max(axis=-1) / 127.0   # [L, K, R]
            s = np.maximum(s, 1e-8)
            qv = np.clip(np.round(np.asarray(p) / s[..., None]),
                         -127, 127).astype(np.int8)
            return jnp.asarray(qv), jnp.asarray(s, jnp.float32)
        kq, ks = quant(kps)
        vq, vs = quant(vps)
        return q, kq, vq, ks, vs, bt, ctx, ps

    def test_int8_stacked_matches_scale_reference(self):
        q, kq, vq, ks, vs, bt, ctx, ps = self.make_stacked_int8()
        for li in range(kq.shape[0]):
            acc_r, m_r, l_r = pa.paged_decode_attention_partial_reference(
                q, kq[li], vq[li], bt, ctx, ps,
                k_scale_pool=ks[li], v_scale_pool=vs[li])
            acc_k, m_k, l_k = pa.paged_decode_attention_partial_stacked(
                q, kq, vq, bt, ctx, jnp.asarray([li], jnp.int32), ps,
                k_scale_pools=ks, v_scale_pools=vs, interpret=True)
            np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_r),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_r),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r),
                                       rtol=2e-4, atol=2e-4)

    def test_int8_stacked_close_to_fp_attention(self):
        """End-to-end sanity: quantized-pool attention stays close to the
        full-precision pool result (int8 per-row symmetric error only)."""
        q, kps, vps, bt, ctx, ps = self.make_stacked(seed=13)
        q2, kq, vq, ks, vs, bt2, ctx2, ps2 = self.make_stacked_int8(seed=13)
        acc_f, m_f, l_f = pa.paged_decode_attention_partial_stacked(
            q, kps, vps, bt, ctx, jnp.asarray([0], jnp.int32), ps,
            interpret=True)
        acc_q, m_q, l_q = pa.paged_decode_attention_partial_stacked(
            q2, kq, vq, bt2, ctx2, jnp.asarray([0], jnp.int32), ps2,
            k_scale_pools=ks, v_scale_pools=vs, interpret=True)
        out_f = np.asarray(acc_f) / np.maximum(np.asarray(l_f)[..., None],
                                               1e-30)
        out_q = np.asarray(acc_q) / np.maximum(np.asarray(l_q)[..., None],
                                               1e-30)
        np.testing.assert_allclose(out_q, out_f, rtol=0.1, atol=0.05)

    def test_int8_zero_context_slot(self):
        q, kq, vq, ks, vs, bt, _, ps = self.make_stacked_int8(seed=17)
        ctx = jnp.asarray([0, ps, 5], jnp.int32)
        acc, m, l = pa.paged_decode_attention_partial_stacked(
            q, kq, vq, bt, ctx, jnp.asarray([1], jnp.int32), ps,
            k_scale_pools=ks, v_scale_pools=vs, interpret=True)
        assert np.asarray(l)[0].max() == 0.0
        assert np.all(np.isneginf(np.asarray(m)[0]))


from text_generation_inference_tpu.ops.pallas import ring_decode_attention as rda


def make_ring_inputs(s=4, kh=2, g=4, d=64, t=256, c=8, seed=0,
                     dtype=jnp.float32, max_ctx=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(s, kh, g, d)), dtype)
    k = jnp.asarray(rng.normal(size=(s, kh, t, d)), dtype)
    v = jnp.asarray(rng.normal(size=(s, kh, t, d)), dtype)
    kb = jnp.asarray(rng.normal(size=(s, kh, c, d)), dtype)
    vb = jnp.asarray(rng.normal(size=(s, kh, c, d)), dtype)
    kn = jnp.asarray(rng.normal(size=(s, kh, d)), dtype)
    vn = jnp.asarray(rng.normal(size=(s, kh, d)), dtype)
    ctx = jnp.asarray(rng.integers(0, (max_ctx or t) + 1, size=(s,)),
                      jnp.int32)
    return q, k, v, kb, vb, kn, vn, ctx


class TestRingDecodeAttention:
    def _check(self, args, step, **kw):
        ref = rda.ring_decode_attention_reference(*args, jnp.int32(step))
        got = rda.ring_decode_attention(*args, jnp.int32(step),
                                        interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_reference(self):
        self._check(make_ring_inputs(), step=5, block_t=128)

    def test_step_zero_only_current_token(self):
        self._check(make_ring_inputs(seed=1), step=0, block_t=128)

    def test_zero_context_slots(self):
        args = make_ring_inputs(seed=2, max_ctx=1)
        self._check(args, step=3, block_t=128)

    def test_full_buffer(self):
        self._check(make_ring_inputs(seed=3, c=16), step=16, block_t=128)

    def test_slot_padding(self):
        # s=5 with block_s=4 exercises the pad/strip path
        self._check(make_ring_inputs(s=5, seed=4), step=2,
                    block_t=128, block_s=4)

    def test_bf16(self):
        args = make_ring_inputs(dtype=jnp.bfloat16, seed=5)
        ref = rda.ring_decode_attention_reference(*args, jnp.int32(4))
        got = rda.ring_decode_attention(*args, jnp.int32(4), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_block_not_dividing_t(self):
        self._check(make_ring_inputs(t=384, seed=6), step=7, block_t=256)
