"""Pallas TPU kernel: causal flash attention for prefill buckets.

TPU-native replacement for the reference's flash_attn varlen CUDA kernel
(reference: server/.../utils/flash_attn.py:59-125). Instead of ragged
cu_seqlens batches, sequences are right-padded into a static bucket and the
kernel masks by true length — the bucket IS the static block structure XLA
needs (SURVEY §7 "ragged attention without varlen kernels").

Never materializes the [T, T] score matrix: online-softmax accumulation over
KV blocks, with two kinds of block skipping:
  * causal skipping: KV blocks strictly above the diagonal are never
    computed, and their DMA is elided by clamping the block index;
  * length skipping: KV blocks past the row's true length are elided the
    same way.

Shapes: q [N, T, K, G, D]; k/v [N, T, K, D]; lengths [N] → out like q.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, block_q: int, block_k: int, scale: float):
    n = pl.program_id(0)
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)
    seq_len = len_ref[n]

    @pl.when(kb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # compute only blocks that intersect the causal triangle and the live
    # length; everything else was clamped to a previous index (DMA elided)
    live = (kb * block_k <= qb * block_q + block_q - 1) & \
           (kb * block_k < seq_len)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                                      # [BQ, G, D]
        bq, g, d = q.shape
        q2 = q.reshape(bq * g, d).astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)                  # [BK, D]
        scores = jax.lax.dot_general(
            q2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [BQ*G, BK]

        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (bq * g, k.shape[0]), 0) // g
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq * g, k.shape[0]), 1)
        mask = (k_pos <= q_pos) & (k_pos < seq_len)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(scores == NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_safe)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, alpha)

        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)                  # [BK, D]
        # zero dead rows: padded block loads may contain garbage/NaN which
        # would survive 0 * NaN in the p @ v product
        v_valid = (kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 0)) < seq_len
        v = jnp.where(v_valid, v, 0.0)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = m_new

    @pl.when(kb == nkb - 1)
    def _finish():
        bq, g, d = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
        denom = jnp.maximum(l_ref[...], 1e-30)
        out = (acc_ref[...] / denom).reshape(bq, g, d)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  lengths: jax.Array, *, block_q: int = 128,
                  block_k: int = 128, interpret: bool = False) -> jax.Array:
    """See module docstring. Returns [N, T, K, G, D]."""
    n, t, kh, g, d = q.shape
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    nq = pl.cdiv(t, block_q)
    nk = pl.cdiv(t, block_k)
    scale = 1.0 / math.sqrt(d)

    # move seq dim next to head grouping for blocked loads:
    # q -> [N, K, T, G, D]; k/v -> [N, K, T, D]
    qt = q.transpose(0, 2, 1, 3, 4)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def q_index(ni, ki, qi, kvi, len_ref):
        return (ni, ki, qi, 0, 0)

    def kv_index(ni, ki, qi, kvi, len_ref):
        # clamp to the last block this q-block can see (causal + length)
        causal_last = jnp.minimum(
            (qi * block_q + block_q - 1) // block_k, nk - 1)
        len_last = jnp.maximum(pl.cdiv(len_ref[ni], block_k) - 1, 0)
        return (ni, ki, jnp.minimum(jnp.minimum(kvi, causal_last), len_last), 0)

    def o_index(ni, ki, qi, kvi, len_ref):
        return (ni, ki, qi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, kh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, g, d), q_index),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, g, d), o_index),
        scratch_shapes=[
            pltpu.VMEM((block_q * g, 1), jnp.float32),
            pltpu.VMEM((block_q * g, 1), jnp.float32),
            pltpu.VMEM((block_q * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, block_q=block_q, block_k=block_k,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, kh, nq * block_q, g, d), q.dtype),
        interpret=interpret,
    )
    out = kernel(lengths.astype(jnp.int32), qt, kt, vt)
    return out[:, :, :t].transpose(0, 2, 1, 3, 4)


def flash_prefill_reference(q, k, v, lengths):
    """XLA reference (same math as models/core.py prefill attention)."""
    n, t, kh, g, d = q.shape
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("nqkgd,nvkd->nkgqv", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    key_valid = jnp.arange(t)[None, :] < lengths[:, None]
    mask = causal[None, :, :] & key_valid[:, None, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("nkgqv,nvkd->nqkgd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
