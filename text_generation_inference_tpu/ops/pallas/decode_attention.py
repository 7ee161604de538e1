"""Pallas TPU kernel: batched decode attention over the slot KV cache.

Replaces the XLA einsum decode attention in models/core.py (and stands in
for the reference's paged/flash decode kernels, reference:
server/.../utils/flash_attn.py, utils/paged.py). The win over plain XLA is
*bandwidth proportional to live context*: the KV sequence axis is a grid
dimension, and blocks beyond a slot's context length are mapped back to the
previous block index — Mosaic elides the DMA when consecutive grid steps
request the same block, so dead KV is never streamed from HBM. With mixed
context lengths in the slot batch this saves up to max_seq/ctx of decode
attention bandwidth.

One program handles ALL kv heads of one (slot, kv-block) — each program is
small, so a per-head grid would be dominated by program overhead (measured
on v5e).

Shapes (G = query heads per KV head):
  q:    [S, K, G, D]
  k, v: [S, K, T, D]   (slot-major KV cache layout, one layer)
  ctx:  [S] int32      (live tokens per slot, including this step's token)
  out:  [S, K, G, D]

Online-softmax accumulation (flash-attention style) across KV blocks with
running max/denominator carried in VMEM scratch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 256
NEG_INF = float("-inf")


def _kernel(ctx_ref,            # scalar-prefetch: [S] i32
            q_ref,              # [1, K, G, D]
            k_ref,              # [1, K, BT, D]
            v_ref,              # [1, K, BT, D]
            o_ref,              # [1, K, G, D]
            m_ref,              # VMEM scratch [K*G, 1] f32
            l_ref,              # VMEM scratch [K*G, 1] f32
            acc_ref,            # VMEM scratch [K*G, D] f32
            *, block_t: int, scale: float):
    s = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    ctx = ctx_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b * block_t < ctx)
    def _compute():
        q = q_ref[0].astype(jnp.float32)                    # [K, G, D]
        k = k_ref[0].astype(jnp.float32)                    # [K, BT, D]
        kh, g, d = q.shape
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale     # [K, G, BT]
        pos = b * block_t + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 2)
        scores = jnp.where(pos < ctx, scores, NEG_INF)

        m_prev = m_ref[...].reshape(kh, g, 1)
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked blocks (all -inf) against NaN from exp(-inf - -inf)
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - m_safe)                        # [K, G, BT]
        p = jnp.where(scores == NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_safe)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, alpha)

        l_prev = l_ref[...].reshape(kh, g, 1)
        l_ref[...] = (l_prev * alpha
                      + jnp.sum(p, axis=-1, keepdims=True)).reshape(kh * g, 1)
        v = v_ref[0].astype(jnp.float32)                    # [K, BT, D]
        # zero dead rows (0 * NaN hazard from padded block loads)
        v_valid = (b * block_t + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 1)) < ctx
        v = jnp.where(v_valid, v, 0.0)
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [K, G, D]
        acc_ref[...] = (acc_ref[...].reshape(kh, g, d) * alpha
                        + pv).reshape(kh * g, d)
        m_ref[...] = m_new.reshape(kh * g, 1)

    @pl.when(b == nb - 1)
    def _finish():
        kh, g, d = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).reshape(kh, g, d).astype(o_ref.dtype)


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     ctx: jax.Array, *, block_t: int = DEFAULT_BLOCK_T,
                     interpret: bool = False) -> jax.Array:
    """See module docstring. Returns [S, K, G, D]."""
    s, kh, g, d = q.shape
    t = k.shape[2]
    block_t = min(block_t, t)
    nb = pl.cdiv(t, block_t)
    scale = 1.0 / math.sqrt(d)

    def q_index(si, bi, ctx_ref):
        return (si, 0, 0, 0)

    def kv_index(si, bi, ctx_ref):
        # clamp dead blocks to the last live block: consecutive identical
        # indices make Mosaic skip the DMA entirely
        last_live = jnp.maximum(pl.cdiv(ctx_ref[si], block_t) - 1, 0)
        return (si, 0, jnp.minimum(bi, last_live), 0)

    def o_index(si, bi, ctx_ref):
        return (si, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec((1, kh, g, d), q_index),
            pl.BlockSpec((1, kh, block_t, d), kv_index),
            pl.BlockSpec((1, kh, block_t, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, kh, g, d), o_index),
        scratch_shapes=[
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, kh, g, d), q.dtype),
        interpret=interpret,
    )
    return kernel(ctx.astype(jnp.int32), q, k, v)


def decode_attention_reference(q, k, v, ctx):
    """XLA reference implementation (same math as models/core.py decode)."""
    s, kh, g, d = q.shape
    t = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("skgd,sktd->skgt", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = jnp.arange(t)[None, :] < ctx[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("skgt,sktd->skgd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
