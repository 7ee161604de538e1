"""Pallas TPU kernel: fused decode attention for the RING-BUFFER scheme.

The ring decode path (models/core.py::decode_ring_step) attends over three
sources per step: the read-only KV cache (pre-chunk context), the in-chunk
ring buffer, and the current token's k/v. The XLA formulation needs three
einsums + a concat + a softmax per layer, materializing [S, K, G, T+C+1]
f32 scores in HBM each step (~0.7 ms/step at S=48/B=256 over the pure KV
bandwidth on v5e). This kernel fuses all of it into one online-softmax
pass that reads each live KV byte exactly once and keeps scores in VMEM.

Replaces (for the serving decode hot loop) what the reference implements
as paged/flash decode CUDA kernels (reference: server/.../utils/paged.py,
utils/flash_attn.py).

MEASURED VERDICT (v5e, TinyLlama S=48/ctx-bucket 256/chunk 64, via
scripts/probe_decode.py ring_ctx256_kernel): 6.33 ms/step vs 4.66 for the
XLA concat-softmax formulation — the grid is only (48/8)x(1+1) iterations
at that context, so per-call overhead x 22 layers x 64 scan steps swamps
the saved score-pipeline traffic (attention total is ~1.3 ms/step, the
whole kernel win ceiling). The engine therefore keeps the XLA path; this
kernel stays as the probe's `kernel` mode and as the candidate for
long-context regimes where the cache block count (and thus useful work
per launch) is much larger.

Design notes (v5e):
  * one grid step covers a GROUP of slots (default 8) so the per-iteration
    overhead amortizes: per (layer, step) the grid is (S/SB) * (nb + 1)
    iterations instead of S * nb;
  * the cache KV axis is blocked; blocks past the group's max context are
    index-clamped to the last live block, so Mosaic elides their DMA
    (dead-KV skipping at slot-group granularity — this composes with the
    engine's context-bucket slicing, which bounds nb);
  * the final grid step folds in the ring buffer (cols < step_idx) and the
    current token, then normalizes.

Shapes (SB = slot block, G = query heads per KV head, B = cache rows,
C = ring capacity):
  q:          [S, K, G, D]
  k/v cache:  [S, K, B, D]
  kbuf/vbuf:  [S, K, C, D]
  k/v new:    [S, K, D]
  ctx:        [S] i32  (valid cache rows per slot = chunk_start)
  step_idx:   scalar i32 (valid ring cols)
  out:        [S, K, G, D]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 256
DEFAULT_BLOCK_S = 8
NEG_INF = float("-inf")


def _kernel(gmax_ref,           # scalar-prefetch: [S/SB] i32 group max ctx
            step_ref,           # scalar-prefetch: [1] i32
            q_ref,              # [SB, K, G, D]
            k_ref,              # [SB, K, BT, D]
            v_ref,              # [SB, K, BT, D]
            kb_ref,             # [SB, K, C, D]
            vb_ref,             # [SB, K, C, D]
            kn_ref,             # [SB, K, D]
            vn_ref,             # [SB, K, D]
            ctx_ref,            # [SB, 1] i32 (VMEM per-slot context)
            o_ref,              # [SB, K, G, D]
            m_ref,              # VMEM scratch [SB * K * G, 1] f32
            l_ref,              # VMEM scratch [SB * K * G, 1] f32
            acc_ref,            # VMEM scratch [SB * K * G, D] f32
            *, block_t: int, scale: float):
    b = pl.program_id(1)
    nb = pl.num_programs(1) - 1          # last grid step = ring + current
    gmax = gmax_ref[pl.program_id(0)]
    sb, kh, g, d = q_ref.shape

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic supports ONE batch dim in tpu.matmul — all dots below collapse
    # (SB, K) into a single leading batch axis of size SB*K
    bk = sb * kh

    def _accumulate(scores, vsrc):
        """Online-softmax update. scores [BK,G,N] f32 (masked with -inf);
        vsrc [BK,N,D] f32 with dead rows zeroed."""
        m_prev = m_ref[...].reshape(bk, g, 1)
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(scores == NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_safe)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, alpha)
        l_prev = l_ref[...].reshape(bk, g, 1)
        l_ref[...] = (l_prev * alpha
                      + jnp.sum(p, axis=-1, keepdims=True)).reshape(-1, 1)
        pv = jax.lax.dot_general(
            p, vsrc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [BK,G,D]
        acc_ref[...] = (acc_ref[...].reshape(bk, g, d)
                        * alpha + pv).reshape(-1, d)
        m_ref[...] = m_new.reshape(-1, 1)

    def _slot_iota(shape, slot_axis, minor_axis):
        """iota over `minor_axis` compared against per-slot ctx: returns the
        per-slot context broadcast to `shape` ([BK, ...] with slot varying
        along slot_axis // kh)."""
        return jax.lax.broadcasted_iota(jnp.int32, shape, minor_axis)

    @pl.when((b < nb) & (b * block_t < gmax))
    def _cache_block():
        q = q_ref[...].astype(jnp.float32).reshape(bk, g, d)
        k = k_ref[...].astype(jnp.float32).reshape(bk, block_t, d)
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # [BK,G,BT]
        ctx = jnp.broadcast_to(
            ctx_ref[...].reshape(sb, 1, 1, 1), (sb, kh, g, block_t)
        ).reshape(bk, g, block_t)
        pos = b * block_t + _slot_iota((bk, g, block_t), 0, 2)
        scores = jnp.where(pos < ctx, scores, NEG_INF)
        v = v_ref[...].astype(jnp.float32).reshape(bk, block_t, d)
        ctx_v = jnp.broadcast_to(
            ctx_ref[...].reshape(sb, 1, 1, 1), (sb, kh, block_t, d)
        ).reshape(bk, block_t, d)
        v_valid = (b * block_t
                   + _slot_iota((bk, block_t, d), 0, 1)) < ctx_v
        v = jnp.where(v_valid, v, 0.0)
        _accumulate(scores, v)

    @pl.when(b == nb)
    def _ring_and_finish():
        step = step_ref[0]
        q = q_ref[...].astype(jnp.float32).reshape(bk, g, d)
        kb = kb_ref[...].astype(jnp.float32)                 # [SB,K,C,D]
        c = kb.shape[2]
        kb = kb.reshape(bk, c, d)
        bscores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # [BK,G,C]
        col = jax.lax.broadcasted_iota(jnp.int32, (bk, g, c), 2)
        bscores = jnp.where(col < step, bscores, NEG_INF)
        kn = kn_ref[...].astype(jnp.float32).reshape(bk, 1, d)
        s_new = (jnp.sum(q * kn, axis=-1, keepdims=True)
                 * scale)                                    # [BK,G,1]
        scores = jnp.concatenate([bscores, s_new], axis=-1)  # [BK,G,C+1]
        vb = vb_ref[...].astype(jnp.float32).reshape(bk, c, d)
        vcol = jax.lax.broadcasted_iota(jnp.int32, (bk, c, d), 1)
        vb = jnp.where(vcol < step, vb, 0.0)
        vn = vn_ref[...].astype(jnp.float32).reshape(bk, 1, d)
        vsrc = jnp.concatenate([vb, vn], axis=1)             # [BK,C+1,D]
        _accumulate(scores, vsrc)
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[...] = (acc_ref[...] / denom).reshape(
            sb, kh, g, d).astype(o_ref.dtype)


def ring_decode_attention(q: jax.Array, k_cache: jax.Array,
                          v_cache: jax.Array, kbuf: jax.Array,
                          vbuf: jax.Array, k_new: jax.Array,
                          v_new: jax.Array, ctx: jax.Array,
                          step_idx: jax.Array, *,
                          block_t: int = DEFAULT_BLOCK_T,
                          block_s: int = DEFAULT_BLOCK_S,
                          interpret: bool = False) -> jax.Array:
    """See module docstring. Returns [S, K, G, D]."""
    s, kh, g, d = q.shape
    t = k_cache.shape[2]
    block_t = min(block_t, t)
    block_s = min(block_s, s)
    nb = pl.cdiv(t, block_t)
    scale = 1.0 / math.sqrt(d)

    pad = (-s) % block_s
    if pad:
        zmask = ((0, pad), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, zmask)
        k_cache = jnp.pad(k_cache, zmask)
        v_cache = jnp.pad(v_cache, zmask)
        kbuf = jnp.pad(kbuf, zmask)
        vbuf = jnp.pad(vbuf, zmask)
        k_new = jnp.pad(k_new, zmask[:3])
        v_new = jnp.pad(v_new, zmask[:3])
        ctx = jnp.pad(ctx, (0, pad))
    sp = s + pad
    ctx = ctx.astype(jnp.int32)
    # per-group max context drives the DMA-skip index map (scalar core)
    gmax = jnp.max(ctx.reshape(sp // block_s, block_s), axis=1)
    step_arr = jnp.reshape(step_idx, (1,)).astype(jnp.int32)

    def q_index(si, bi, gmax_ref, step_ref):
        return (si, 0, 0, 0)

    def kv_index(si, bi, gmax_ref, step_ref):
        # clamp dead/off-the-end blocks to the last live block: repeated
        # indices make Mosaic skip the DMA entirely (incl. the ring step)
        last_live = jnp.maximum(pl.cdiv(gmax_ref[si], block_t) - 1, 0)
        return (si, 0, jnp.minimum(bi, last_live), 0)

    def buf_index(si, bi, gmax_ref, step_ref):
        return (si, 0, 0, 0)

    def new_index(si, bi, gmax_ref, step_ref):
        return (si, 0, 0)

    def ctx_index(si, bi, gmax_ref, step_ref):
        return (si, 0)

    c = kbuf.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sp // block_s, nb + 1),
        in_specs=[
            pl.BlockSpec((block_s, kh, g, d), q_index),
            pl.BlockSpec((block_s, kh, block_t, d), kv_index),
            pl.BlockSpec((block_s, kh, block_t, d), kv_index),
            pl.BlockSpec((block_s, kh, c, d), buf_index),
            pl.BlockSpec((block_s, kh, c, d), buf_index),
            pl.BlockSpec((block_s, kh, d), new_index),
            pl.BlockSpec((block_s, kh, d), new_index),
            pl.BlockSpec((block_s, 1), ctx_index),
        ],
        out_specs=pl.BlockSpec((block_s, kh, g, d), q_index),
        scratch_shapes=[
            pltpu.VMEM((block_s * kh * g, 1), jnp.float32),
            pltpu.VMEM((block_s * kh * g, 1), jnp.float32),
            pltpu.VMEM((block_s * kh * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, kh, g, d), q.dtype),
        interpret=interpret,
    )
    out = kernel(gmax, step_arr, q, k_cache, v_cache, kbuf, vbuf,
                 k_new, v_new, ctx[:, None])
    return out[:s] if pad else out


def ring_decode_attention_reference(q, k_cache, v_cache, kbuf, vbuf,
                                    k_new, v_new, ctx, step_idx):
    """XLA reference (same math as models/core.py decode_ring_step)."""
    s, kh, g, d = q.shape
    t = k_cache.shape[2]
    c = kbuf.shape[2]
    scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32)
    scores = jnp.einsum("skgd,sktd->skgt", qf,
                        k_cache.astype(jnp.float32)) * scale
    mask = jnp.arange(t)[None, :] < ctx[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    bscores = jnp.einsum("skgd,skcd->skgc", qf,
                         kbuf.astype(jnp.float32)) * scale
    bmask = jnp.arange(c)[None, :] < step_idx
    bscores = jnp.where(bmask[:, None, None, :], bscores, NEG_INF)
    s_new = jnp.sum(qf * k_new.astype(jnp.float32)[:, :, None, :],
                    axis=-1) * scale
    all_scores = jnp.concatenate([scores, bscores, s_new[..., None]], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = (jnp.einsum("skgt,sktd->skgd", probs[..., :t],
                      v_cache.astype(jnp.float32))
           + jnp.einsum("skgc,skcd->skgd", probs[..., t:t + c],
                        vbuf.astype(jnp.float32))
           + probs[..., t + c:] * v_new.astype(jnp.float32)[:, :, None, :])
    return out.astype(q.dtype)
