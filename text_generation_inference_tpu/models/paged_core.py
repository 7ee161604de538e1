"""Decoder forward passes over the paged KV pool.

Same layer math as models/core.py (shares its building blocks); only the
cache side differs: K/V rows live in flat page pools [L, P*page, K, D] and
every read/write goes through the block table. This is the TPU counterpart
of the reference's PagedCausalLM forward path (reference:
server/.../models/paged_causal_lm.py:418-479 prepare_inputs_for_prefill /
slot mapping; custom_modeling/paged_llama_modeling.py store()/attend()).

RoPE/learned positions supported; ALiBi models use the gather-based
attention fallback (bias needs absolute key positions, which the paged
Pallas kernel does not carry).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..engine.paged_cache import PagedKVCache
from ..ops.pallas.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_reference,
)
from .core import (
    DecoderSpec,
    _apply_rope,
    _attn_out,
    _embed,
    _mlp,
    _norm,
    _qkv,
    _rope_freqs,
    _unembed,
)


def _use_kernel() -> bool:
    import os

    if os.getenv("FLASH_ATTENTION", "1").lower() in ("0", "false"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def decode_paged(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S]
    positions: jax.Array,    # [S] write position (= context_len - 1)
    cache: PagedKVCache,
    context_len: jax.Array,  # [S] = positions + 1 for active slots
    page_size: int,
    active: Optional[jax.Array] = None,   # [S] bool; inactive writes dropped
) -> tuple[jax.Array, PagedKVCache]:
    """One decode step over every slot via the page pool."""
    s = ids.shape[0]
    bt = cache.block_table
    x = _embed(spec, params, ids, positions)

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None

    # flat pool row for each slot's write position; INACTIVE slots must not
    # write at all — their block-table rows are stale (freed slots keep old
    # page ids, fresh slots point at page 0), so an in-bounds write would
    # corrupt whichever live request now owns those pool rows. Route them
    # out of bounds and scatter with mode="drop".
    pool_rows = cache.k.shape[2]
    write_rows = (bt[jnp.arange(s), positions // page_size] * page_size
                  + positions % page_size)
    if active is not None:
        write_rows = jnp.where(active, write_rows, pool_rows)
    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    use_kernel = _use_kernel() and spec.pos != "alibi"

    def layer(x, inputs):
        lp, kp, vp = inputs                       # pools [K, P*page, D]
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)               # q [S,H,Dh]; k/v [S,K,Dh]
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        kp = kp.at[:, write_rows].set(
            k.transpose(1, 0, 2).astype(kp.dtype), mode="drop")
        vp = vp.at[:, write_rows].set(
            v.transpose(1, 0, 2).astype(vp.dtype), mode="drop")

        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
        if use_kernel:
            attn = paged_decode_attention(qg, kp, vp, bt, context_len,
                                          page_size)
        else:
            attn = paged_decode_attention_reference(
                qg, kp, vp, bt, context_len, page_size)
        attn = attn.reshape(s, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (kp, vp)

    x, (new_k, new_v) = jax.lax.scan(layer, x, (params["layers"], cache.k, cache.v))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, cache._replace(k=new_k, v=new_v)


def prefill_paged(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,        # [N, T] right-padded bucket
    lengths: jax.Array,    # [N]
    slots: jax.Array,      # [N]
    cache: PagedKVCache,
    page_size: int,
    prefix_embeds: Optional[jax.Array] = None,
    prefix_len: Optional[jax.Array] = None,
) -> tuple[jax.Array, PagedKVCache]:
    """Bucket prefill whose KV lands in the target slots' pages.

    Attention within the bucket is self-contained (causal over the prompt),
    so only the writes differ from core.prefill. Returns all-position
    logits + updated pool.
    """
    n, t = ids.shape
    bt = cache.block_table
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
    x = _embed(spec, params, ids, positions)
    if prefix_embeds is not None:
        use_prefix = positions < prefix_len[:, None]
        x = jnp.where(use_prefix[..., None], prefix_embeds.astype(x.dtype), x)

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None

    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    key_valid = positions < lengths[:, None]
    mask = causal[None, :, :] & key_valid[:, None, :]
    if spec.pos == "alibi":
        from .core import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(spec.num_heads))
        alibi = slopes[:, None] * jnp.arange(t, dtype=jnp.float32)[None, :]
        bias = alibi[None, :, None, :]
    else:
        bias = None

    # flat pool rows for every (row, position); invalid positions dropped
    pool_rows = cache.k.shape[2]
    pages = bt[slots[:, None], positions // page_size]       # [N, T]
    flat = pages * page_size + positions % page_size
    flat = jnp.where(key_valid, flat, pool_rows)             # OOB -> dropped
    flat = flat.reshape(-1)

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads

    from ..ops import attention as attn_ops

    def layer(x, inputs):
        lp, kp, vp = inputs
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        qg = q.reshape(n, t, spec.num_kv_heads, group, spec.head_dim)
        b = (bias.reshape(1, spec.num_kv_heads, group, 1, t)
             if bias is not None else None)
        attn = attn_ops.prefill_attention(qg, k, v, lengths, b, mask, scale)
        attn = attn.reshape(n, t, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)

        k_rows = k.reshape(-1, spec.num_kv_heads, spec.head_dim)
        v_rows = v.reshape(-1, spec.num_kv_heads, spec.head_dim)
        kp = kp.at[:, flat].set(
            k_rows.transpose(1, 0, 2).astype(kp.dtype), mode="drop")
        vp = vp.at[:, flat].set(
            v_rows.transpose(1, 0, 2).astype(vp.dtype), mode="drop")
        return x, (kp, vp)

    x, (new_k, new_v) = jax.lax.scan(layer, x, (params["layers"], cache.k, cache.v))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, cache._replace(k=new_k, v=new_v)
