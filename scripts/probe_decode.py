"""Decode-step component breakdown on the real chip.

Times variants of the TinyLlama decode step (S slots, chunked scan) to
attribute the gap between the measured step time and the HBM roofline:

  full       engine step as shipped (forward + sampling + pack)
  nosample   forward only (argmax next id), same scan/carry structure
  nowrite    forward, KV scatter write skipped entirely (incorrect math,
             measures the scatter's cost)
  ringbuf    forward with chunk-local KV ring buffer: in-chunk tokens kept
             in a [C,S,K,D] buffer carried through the scan, ONE contiguous
             scatter at chunk end (the round-2 candidate design)
  ctx<N>     forward reading only the first N cache rows (static slice) —
             upper bound for context-bucketed decode
  samponly   sampling + pack alone on cached logits

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decode.py full nosample ...
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from text_generation_inference_tpu.engine import sampling
from text_generation_inference_tpu.engine.engine import EngineState
from text_generation_inference_tpu.models import core
from text_generation_inference_tpu.models.core import DecoderSpec, KVCache

PROBE_MODEL = os.environ.get("PROBE_MODEL", "tinyllama")

if PROBE_MODEL == "llama7b-int4":
    S = int(os.environ.get("PROBE_SLOTS", "16"))
    T = int(os.environ.get("PROBE_MAXSEQ", "512"))
    CHUNK = int(os.environ.get("PROBE_CHUNK", "32"))
    spec = DecoderSpec(
        vocab_size=32000, hidden_size=4096, num_layers=32,
        num_heads=32, num_kv_heads=32, head_dim=128,
        intermediate_size=11008, pos="rope", norm="rmsnorm",
        activation="silu_glu", norm_eps=1e-5)
else:
    S = int(os.environ.get("PROBE_SLOTS", "48"))
    T = int(os.environ.get("PROBE_MAXSEQ", "1024"))
    CHUNK = int(os.environ.get("PROBE_CHUNK", "64"))
    spec = DecoderSpec(
        vocab_size=32000, hidden_size=2048, num_layers=22,
        num_heads=32, num_kv_heads=4, head_dim=64,
        intermediate_size=5632, pos="rope", norm="rmsnorm",
        activation="silu_glu", norm_eps=1e-5)
CALLS = int(os.environ.get("PROBE_CALLS", "4"))


def _forward_step(write, read_rows, params, cache, state):
    """core.decode clone with togglable write/read behavior; returns
    argmax ids so logits are consumed."""
    s, t_max = state.history.shape
    rows = jnp.arange(s)
    pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
    ids = state.history[rows, pos]
    x = core._embed(spec, params, ids, pos)
    cos, sin = core._rope_freqs(spec, pos)
    key_pos = jnp.arange(read_rows, dtype=jnp.int32)
    old_mask = key_pos[None, :] < pos[:, None]
    scale = 1.0 / (spec.head_dim ** 0.5)
    group = spec.num_heads // spec.num_kv_heads

    def layer(x, inputs):
        lp, ck, cv = inputs
        ck = ck[:, :, :read_rows]     # [S, K, T, D] -> [S, K, read_rows, D]
        cv = cv[:, :, :read_rows]
        h = core._norm(spec, lp["ln1"], x)
        q, k, v = core._qkv(spec, lp, h)
        q = core._apply_rope(spec, q, cos, sin)
        k = core._apply_rope(spec, k, cos, sin)
        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
        scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(old_mask[:, None, None, :], scores, -jnp.inf)
        score_new = jnp.sum(
            qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
            axis=-1) * scale
        all_scores = jnp.concatenate([scores, score_new[..., None]], axis=-1)
        probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
        attn = jnp.einsum("skgt,sktd->skgd", probs[..., :read_rows], cv) \
            + probs[..., read_rows:] * v[:, :, None, :]
        attn = attn.reshape(s, spec.num_heads, spec.head_dim)
        attn = core._attn_out(spec, lp, attn)
        x = x + attn
        h2 = core._norm(spec, lp["ln2"], x)
        x = x + core._mlp(spec, lp, h2)
        return x, (k, v)

    x, (k_all, v_all) = jax.lax.scan(layer, x, (params["layers"], cache.k, cache.v))
    if write == "post":
        new_k = cache.k.at[:, rows, :, pos, :].set(
            k_all.transpose(1, 0, 2, 3).astype(cache.k.dtype))
        new_v = cache.v.at[:, rows, :, pos, :].set(
            v_all.transpose(1, 0, 2, 3).astype(cache.v.dtype))
        cache = KVCache(k=new_k, v=new_v)
    x = core._norm(spec, params["final_norm"], x)
    logits = core._unembed(spec, params, x)
    next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    new_hist = state.history.at[rows, state.history_len].set(next_ids, mode="drop")
    state = state._replace(history=new_hist,
                           history_len=state.history_len + 1)
    return cache, state, next_ids


def _ringbuf_chunk(params, cache, state):
    """Chunk-local ring buffer: scan carries kv_buf [C,L?,S,K,D]... layout:
    per layer we need the chunk kv; carry [L, C, S, K, D] would be
    22*64*48*4*64*2B = 69MB — fine. One scatter at chunk end."""
    s, t_max = state.history.shape
    L = spec.num_layers
    kbuf = jnp.zeros((L, CHUNK, s, spec.num_kv_heads, spec.head_dim),
                     cache.k.dtype)
    vbuf = jnp.zeros_like(kbuf)
    start_pos = jnp.clip(state.history_len - 1, 0, t_max - 1)  # [S]
    scale = 1.0 / (spec.head_dim ** 0.5)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)

    def step(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        x = core._embed(spec, params, ids, pos)
        cos, sin = core._rope_freqs(spec, pos)
        key_pos = jnp.arange(t_max, dtype=jnp.int32)
        cache_mask = key_pos[None, :] < start_pos[:, None]      # pre-chunk KV
        # in-chunk buffer: entries 0..i valid (i inclusive after this write)
        buf_mask = jnp.arange(CHUNK)[None, :] <= i              # [1, C]
        buf_mask = buf_mask & (start_pos[:, None] + jnp.arange(CHUNK)[None, :]
                               < pos[:, None] + 1)

        def layer(x, inputs):
            lp, ck, cv, kb, vb = inputs
            h = core._norm(spec, lp["ln1"], x)
            q, k, v = core._qkv(spec, lp, h)
            q = core._apply_rope(spec, q, cos, sin)
            k = core._apply_rope(spec, k, cos, sin)
            kb = kb.at[i].set(k.astype(kb.dtype))
            vb = vb.at[i].set(v.astype(vb.dtype))
            qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
            scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(cache_mask[:, None, None, :], scores, -jnp.inf)
            # chunk buffer scores: kb [C,S,K,D]
            bscores = jnp.einsum("skgd,cskd->skgc", qg, kb,
                                 preferred_element_type=jnp.float32) * scale
            bscores = jnp.where(buf_mask[:, None, None, :], bscores, -jnp.inf)
            all_scores = jnp.concatenate([scores, bscores], axis=-1)
            probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
            attn = jnp.einsum("skgt,sktd->skgd", probs[..., :t_max], cv) \
                + jnp.einsum("skgc,cskd->skgd", probs[..., t_max:], vb)
            attn = attn.reshape(s, spec.num_heads, spec.head_dim)
            attn = core._attn_out(spec, lp, attn)
            x = x + attn
            h2 = core._norm(spec, lp["ln2"], x)
            x = x + core._mlp(spec, lp, h2)
            return x, (kb, vb)

        x, (kbuf, vbuf) = jax.lax.scan(
            layer, x, (params["layers"], cache.k, cache.v, kbuf, vbuf))
        x = core._norm(spec, params["final_norm"], x)
        logits = core._unembed(spec, params, x)
        next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_hist = state.history.at[rows, state.history_len].set(
            next_ids, mode="drop")
        state = state._replace(history=new_hist,
                               history_len=state.history_len + 1)
        return (kbuf, vbuf, state), next_ids

    (kbuf, vbuf, state), ids_seq = jax.lax.scan(
        step, (kbuf, vbuf, state), jnp.arange(CHUNK))
    # chunk-end scatter: write position start_pos + c for each (c, slot)
    wpos = start_pos[None, :] + jnp.arange(CHUNK)[:, None]       # [C, S]
    wpos = jnp.where(wpos < t_max, wpos, t_max)                  # drop OOB
    # cache [L, S, K, T, D]; advanced indices (C,S) move to the front, so
    # the updated region is [C, S, L, K, D]
    new_k = cache.k.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        kbuf.transpose(1, 2, 0, 3, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        vbuf.transpose(1, 2, 0, 3, 4).astype(cache.v.dtype), mode="drop")
    return KVCache(k=new_k, v=new_v), state, ids_seq


def _ringbuf2_chunk(params, cache, state):
    """Ring buffer in cache-matching layout [L, S, K, C, D]: the buffer
    einsum has identical batch/contract structure to the cache einsum
    (skgd,skcd->skgc), no transposes. One scatter at chunk end."""
    s, t_max = state.history.shape
    L = spec.num_layers
    kbuf = jnp.zeros((L, s, spec.num_kv_heads, CHUNK, spec.head_dim),
                     cache.k.dtype)
    vbuf = jnp.zeros_like(kbuf)
    start_pos = jnp.clip(state.history_len - 1, 0, t_max - 1)  # [S]
    scale = 1.0 / (spec.head_dim ** 0.5)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    cache_mask = key_pos[None, :] < start_pos[:, None]          # static/chunk

    def step(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        x = core._embed(spec, params, ids, pos)
        cos, sin = core._rope_freqs(spec, pos)
        buf_mask = jnp.arange(CHUNK)[None, :] < i               # [1, C]

        def layer(x, inputs):
            lp, ck, cv, kb, vb = inputs
            h = core._norm(spec, lp["ln1"], x)
            q, k, v = core._qkv(spec, lp, h)
            q = core._apply_rope(spec, q, cos, sin)
            k = core._apply_rope(spec, k, cos, sin)
            kb = jax.lax.dynamic_update_slice_in_dim(
                kb, k[:, :, None, :].astype(kb.dtype), i, axis=2)
            vb = jax.lax.dynamic_update_slice_in_dim(
                vb, v[:, :, None, :].astype(vb.dtype), i, axis=2)
            qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
            scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(cache_mask[:, None, None, :], scores, -jnp.inf)
            bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                                 preferred_element_type=jnp.float32) * scale
            bscores = jnp.where(buf_mask[:, None, None, :], bscores, -jnp.inf)
            score_new = jnp.sum(
                qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
                axis=-1) * scale
            all_scores = jnp.concatenate(
                [scores, bscores, score_new[..., None]], axis=-1)
            probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
            attn = jnp.einsum("skgt,sktd->skgd", probs[..., :t_max], cv) \
                + jnp.einsum("skgc,skcd->skgd",
                             probs[..., t_max:t_max + CHUNK], vb) \
                + probs[..., t_max + CHUNK:] * v[:, :, None, :]
            attn = attn.reshape(s, spec.num_heads, spec.head_dim)
            attn = core._attn_out(spec, lp, attn)
            x = x + attn
            h2 = core._norm(spec, lp["ln2"], x)
            x = x + core._mlp(spec, lp, h2)
            return x, (kb, vb)

        x, (kbuf, vbuf) = jax.lax.scan(
            layer, x, (params["layers"], cache.k, cache.v, kbuf, vbuf))
        x = core._norm(spec, params["final_norm"], x)
        logits = core._unembed(spec, params, x)
        next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_hist = state.history.at[rows, state.history_len].set(
            next_ids, mode="drop")
        state = state._replace(history=new_hist,
                               history_len=state.history_len + 1)
        return (kbuf, vbuf, state), next_ids

    (kbuf, vbuf, state), ids_seq = jax.lax.scan(
        step, (kbuf, vbuf, state), jnp.arange(CHUNK))
    wpos = start_pos[None, :] + jnp.arange(CHUNK)[:, None]       # [C, S]
    wpos = jnp.where(wpos < t_max, wpos, t_max)                  # drop OOB
    # kbuf [L, S, K, C, D] -> update region [C, S, L, K, D]
    new_k = cache.k.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        kbuf.transpose(3, 1, 0, 2, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        vbuf.transpose(3, 1, 0, 2, 4).astype(cache.v.dtype), mode="drop")
    return KVCache(k=new_k, v=new_v), state, ids_seq


def _ringbuf3_chunk(params, cache, state):
    """Like ringbuf2 but the buffers are READ-ONLY xs of the layer scan
    (no ys restacking copy); the per-layer k/v stacks from the scan are
    written into the carried buffers with ONE dynamic_update_slice per
    step at chunk level."""
    s, t_max = state.history.shape
    L = spec.num_layers
    kbuf = jnp.zeros((L, s, spec.num_kv_heads, CHUNK, spec.head_dim),
                     cache.k.dtype)
    vbuf = jnp.zeros_like(kbuf)
    start_pos = jnp.clip(state.history_len - 1, 0, t_max - 1)  # [S]
    scale = 1.0 / (spec.head_dim ** 0.5)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    cache_mask = key_pos[None, :] < start_pos[:, None]

    def step(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        x = core._embed(spec, params, ids, pos)
        cos, sin = core._rope_freqs(spec, pos)
        buf_mask = jnp.arange(CHUNK)[None, :] < i               # [1, C]

        def layer(x, inputs):
            lp, ck, cv, kb, vb = inputs
            h = core._norm(spec, lp["ln1"], x)
            q, k, v = core._qkv(spec, lp, h)
            q = core._apply_rope(spec, q, cos, sin)
            k = core._apply_rope(spec, k, cos, sin)
            qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
            scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(cache_mask[:, None, None, :], scores, -jnp.inf)
            bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                                 preferred_element_type=jnp.float32) * scale
            bscores = jnp.where(buf_mask[:, None, None, :], bscores, -jnp.inf)
            score_new = jnp.sum(
                qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
                axis=-1) * scale
            all_scores = jnp.concatenate(
                [scores, bscores, score_new[..., None]], axis=-1)
            probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
            attn = jnp.einsum("skgt,sktd->skgd", probs[..., :t_max], cv) \
                + jnp.einsum("skgc,skcd->skgd",
                             probs[..., t_max:t_max + CHUNK], vb) \
                + probs[..., t_max + CHUNK:] * v[:, :, None, :]
            attn = attn.reshape(s, spec.num_heads, spec.head_dim)
            attn = core._attn_out(spec, lp, attn)
            x = x + attn
            h2 = core._norm(spec, lp["ln2"], x)
            x = x + core._mlp(spec, lp, h2)
            return x, (k, v)

        x, (k_all, v_all) = jax.lax.scan(
            layer, x, (params["layers"], cache.k, cache.v, kbuf, vbuf))
        # ONE in-place column write per step: k_all [L, S, K, D]
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k_all[:, :, :, None, :].astype(kbuf.dtype), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v_all[:, :, :, None, :].astype(vbuf.dtype), (0, 0, 0, i, 0))
        x = core._norm(spec, params["final_norm"], x)
        logits = core._unembed(spec, params, x)
        next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_hist = state.history.at[rows, state.history_len].set(
            next_ids, mode="drop")
        state = state._replace(history=new_hist,
                               history_len=state.history_len + 1)
        return (kbuf, vbuf, state), next_ids

    (kbuf, vbuf, state), ids_seq = jax.lax.scan(
        step, (kbuf, vbuf, state), jnp.arange(CHUNK))
    wpos = start_pos[None, :] + jnp.arange(CHUNK)[:, None]       # [C, S]
    wpos = jnp.where(wpos < t_max, wpos, t_max)                  # drop OOB
    new_k = cache.k.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        kbuf.transpose(3, 1, 0, 2, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        vbuf.transpose(3, 1, 0, 2, 4).astype(cache.v.dtype), mode="drop")
    return KVCache(k=new_k, v=new_v), state, ids_seq


def _ring_ctx_chunk(read_rows, params, cache, state, mode="base"):
    """ringbuf3 with the cache READ sliced to the first `read_rows` rows
    once per chunk (the slice is a copy, amortized over CHUNK steps); the
    chunk-end scatter still hits the full cache. Valid when every active
    slot's context fits in read_rows.

    mode (cost attribution; all but "base"/"merge" are incorrect math):
      base      — shipped formulation (concat softmax)
      merge     — two-part online-softmax merge, no big concat
      noattn    — attention replaced by v broadcast (isolates attn cost)
      nounembed — lm_head skipped, ids advance by a dummy (isolates unembed)
    """
    from text_generation_inference_tpu.ops import linear as linops

    params = linops.prepare_params(params)
    from text_generation_inference_tpu.models.core import KVCache as KVC

    read_cache = KVC(
        k=jax.lax.slice_in_dim(cache.k, 0, read_rows, axis=3),
        v=jax.lax.slice_in_dim(cache.v, 0, read_rows, axis=3))
    s, t_max = state.history.shape
    L = spec.num_layers
    kbuf = jnp.zeros((L, s, spec.num_kv_heads, CHUNK, spec.head_dim),
                     cache.k.dtype)
    vbuf = jnp.zeros_like(kbuf)
    start_pos = jnp.clip(state.history_len - 1, 0, t_max - 1)  # [S]
    scale = 1.0 / (spec.head_dim ** 0.5)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)
    key_pos = jnp.arange(read_rows, dtype=jnp.int32)
    cache_mask = key_pos[None, :] < start_pos[:, None]

    def step(carry, i):
        kbuf, vbuf, state = carry
        pos = jnp.clip(state.history_len - 1, 0, t_max - 1)
        ids = state.history[rows, pos]
        x = core._embed(spec, params, ids, pos)
        cos, sin = core._rope_freqs(spec, pos)
        buf_mask = jnp.arange(CHUNK)[None, :] < i               # [1, C]

        def layer(x, inputs):
            lp, ck, cv, kb, vb = inputs
            h = core._norm(spec, lp["ln1"], x)
            q, k, v = core._qkv(spec, lp, h)
            q = core._apply_rope(spec, q, cos, sin)
            k = core._apply_rope(spec, k, cos, sin)
            qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
            if mode == "kernel":
                from text_generation_inference_tpu.ops.pallas import (
                    ring_decode_attention as rda)

                attn = rda.ring_decode_attention(
                    qg, ck, cv, kb, vb, k, v, start_pos, i)
            elif mode == "noattn":
                attn = jnp.broadcast_to(
                    v[:, :, None, :], (s, spec.num_kv_heads, group,
                                       spec.head_dim))
            elif mode == "merge":
                # two-part online-softmax merge: big cache part and small
                # (buffer + current) part each get a local softmax; results
                # are rescaled by their max/denominator — no [T+C+1] concat
                scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                    preferred_element_type=jnp.float32) * scale
                scores = jnp.where(cache_mask[:, None, None, :], scores,
                                   -jnp.inf)
                m1 = jnp.max(scores, axis=-1)                       # [S,K,G]
                e1 = jnp.exp(scores - m1[..., None])
                e1 = jnp.where(jnp.isfinite(scores), e1, 0.0)
                l1 = jnp.sum(e1, axis=-1)
                acc1 = jnp.einsum("skgt,sktd->skgd", e1.astype(cv.dtype), cv)
                bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                                     preferred_element_type=jnp.float32) * scale
                bscores = jnp.where(buf_mask[:, None, None, :], bscores,
                                    -jnp.inf)
                score_new = jnp.sum(
                    qg.astype(jnp.float32)
                    * k[:, :, None, :].astype(jnp.float32),
                    axis=-1) * scale
                small = jnp.concatenate([bscores, score_new[..., None]],
                                        axis=-1)                    # [S,K,G,C+1]
                m2 = jnp.max(small, axis=-1)
                e2 = jnp.exp(small - m2[..., None])
                e2 = jnp.where(jnp.isfinite(small), e2, 0.0)
                l2 = jnp.sum(e2, axis=-1)
                vb_ext = jnp.concatenate([vb, v[:, :, None, :]], axis=2)
                acc2 = jnp.einsum("skgc,skcd->skgd", e2.astype(cv.dtype),
                                  vb_ext)
                m = jnp.maximum(m1, m2)
                w1 = jnp.where(l1 > 0, jnp.exp(m1 - m), 0.0)
                w2 = jnp.exp(m2 - m)
                denom = l1 * w1 + l2 * w2
                attn = (acc1.astype(jnp.float32) * w1[..., None]
                        + acc2.astype(jnp.float32) * w2[..., None]) \
                    / denom[..., None]
                attn = attn.astype(x.dtype)
            else:
                scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                    preferred_element_type=jnp.float32) * scale
                scores = jnp.where(cache_mask[:, None, None, :], scores,
                                   -jnp.inf)
                bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                                     preferred_element_type=jnp.float32) * scale
                bscores = jnp.where(buf_mask[:, None, None, :], bscores,
                                    -jnp.inf)
                score_new = jnp.sum(
                    qg.astype(jnp.float32)
                    * k[:, :, None, :].astype(jnp.float32),
                    axis=-1) * scale
                all_scores = jnp.concatenate(
                    [scores, bscores, score_new[..., None]], axis=-1)
                probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
                attn = jnp.einsum("skgt,sktd->skgd",
                                  probs[..., :read_rows], cv) \
                    + jnp.einsum("skgc,skcd->skgd",
                                 probs[..., read_rows:read_rows + CHUNK], vb) \
                    + probs[..., read_rows + CHUNK:] * v[:, :, None, :]
            attn = attn.reshape(s, spec.num_heads, spec.head_dim)
            attn = core._attn_out(spec, lp, attn)
            x = x + attn
            h2 = core._norm(spec, lp["ln2"], x)
            x = x + core._mlp(spec, lp, h2)
            return x, (k, v)

        x, (k_all, v_all) = jax.lax.scan(
            layer, x, (params["layers"], read_cache.k, read_cache.v,
                       kbuf, vbuf))
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k_all[:, :, :, None, :].astype(kbuf.dtype), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v_all[:, :, :, None, :].astype(vbuf.dtype), (0, 0, 0, i, 0))
        x = core._norm(spec, params["final_norm"], x)
        if mode == "nounembed":
            next_ids = (ids + jnp.sum(x, axis=-1).astype(jnp.int32) % 3 + 1) % 32000
        else:
            logits = core._unembed(spec, params, x)
            next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_hist = state.history.at[rows, state.history_len].set(
            next_ids, mode="drop")
        state = state._replace(history=new_hist,
                               history_len=state.history_len + 1)
        return (kbuf, vbuf, state), next_ids

    (kbuf, vbuf, state), ids_seq = jax.lax.scan(
        step, (kbuf, vbuf, state), jnp.arange(CHUNK))
    wpos = start_pos[None, :] + jnp.arange(CHUNK)[:, None]       # [C, S]
    wpos = jnp.where(wpos < t_max, wpos, t_max)                  # drop OOB
    new_k = cache.k.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        kbuf.transpose(3, 1, 0, 2, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, jnp.broadcast_to(rows[None, :], (CHUNK, s)), :,
                       wpos, :].set(
        vbuf.transpose(3, 1, 0, 2, 4).astype(cache.v.dtype), mode="drop")
    return KVCache(k=new_k, v=new_v), state, ids_seq


def build(variant):
    eos = 2

    if variant == "ringbuf2":
        return jax.jit(_ringbuf2_chunk, donate_argnums=(1, 2)), "ringbuf2"
    if variant == "ringbuf3":
        return jax.jit(_ringbuf3_chunk, donate_argnums=(1, 2)), "ringbuf3"
    if variant.startswith("ring_ctx"):
        body = variant[8:]
        for mode in ("noattn", "nounembed", "merge", "kernel"):
            if body.endswith("_" + mode):
                rr = int(body[: -len(mode) - 1])
                return jax.jit(partial(_ring_ctx_chunk, rr, mode=mode),
                               donate_argnums=(1, 2)), variant
        rr = int(body)
        return jax.jit(partial(_ring_ctx_chunk, rr),
                       donate_argnums=(1, 2)), variant

    if variant == "full":
        from text_generation_inference_tpu.engine.engine import _decode_multi

        fn = jax.jit(partial(_decode_multi, spec, eos, CHUNK),
                     donate_argnums=(1, 2))
        return fn, "full"
    if variant == "samponly":
        def samp_chunk(logits, state):
            def body(state, _):
                next_ids, details = sampling.next_tokens(
                    logits, state.params, state.gen_count, state.history,
                    state.history_len, eos, history_start=state.hist_start)
                state = state._replace(gen_count=state.gen_count + 1)
                return state, sampling.pack_step_outputs(next_ids, details)
            state, packed = jax.lax.scan(body, state, None, length=CHUNK)
            return state, packed
        return jax.jit(samp_chunk, donate_argnums=(1,)), "samponly"

    if variant == "ringbuf":
        return jax.jit(_ringbuf_chunk, donate_argnums=(1, 2)), "ringbuf"

    if variant.startswith("ctx"):
        read_rows = int(variant[3:])
        write = None            # no write: pure read-cost probe
    elif variant == "nowrite":
        read_rows, write = T, None
    elif variant == "nosample":
        read_rows, write = T, "post"
    else:
        raise ValueError(variant)

    def chunk_fn(params, cache, state):
        def body(carry, _):
            cache, state = carry
            cache, state, ids = _forward_step(write, read_rows, params,
                                              cache, state)
            return (cache, state), ids
        (cache, state), ids = jax.lax.scan(body, (cache, state), None,
                                           length=CHUNK)
        return cache, state, ids

    return jax.jit(chunk_fn, donate_argnums=(1, 2)), variant


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}", file=sys.stderr)
    if PROBE_MODEL == "llama7b-int4":
        import bench

        params = bench._init_int4_params(spec, jax.random.key(0),
                                         jnp.bfloat16)
    else:
        params = core.init_params(spec, jax.random.key(0),
                                  dtype=jnp.bfloat16)
    if os.environ.get("PROBE_FUSE", "0").lower() not in ("0", "false"):
        from text_generation_inference_tpu.models.fuse import fuse_params

        params = fuse_params(spec, params)
    results = {}
    for variant in sys.argv[1:]:
        cache = KVCache.create(spec, S, T, jnp.bfloat16)
        state = EngineState.create(S, T)
        rng = np.random.default_rng(0)
        hist = rng.integers(0, 32000, size=(S, T)).astype(np.int32)
        state = state._replace(
            history=jnp.asarray(hist),
            history_len=jnp.full((S,), 128, jnp.int32),
            active=jnp.ones((S,), jnp.bool_),
        )
        fn, name = build(variant)
        if variant == "samponly":
            logits = jnp.asarray(
                rng.normal(size=(S, 32000)).astype(np.float32))
            args = lambda st: (logits, st)
            t0 = time.perf_counter()
            state, out = fn(*args(state))
            np.asarray(out[0, 0])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(CALLS):
                state, out = fn(*args(state))
                np.asarray(out[0, 0])
            dt = (time.perf_counter() - t0) / CALLS
        else:
            t0 = time.perf_counter()
            cache, state, out = fn(params, cache, state)
            np.asarray(jax.device_get(out))[0]
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(CALLS):
                cache, state, out = fn(params, cache, state)
                np.asarray(jax.device_get(out))[0]
            dt = (time.perf_counter() - t0) / CALLS
        ms_per_step = dt / CHUNK * 1e3
        results[name] = round(ms_per_step, 3)
        print(f"{name}: {ms_per_step:.3f} ms/step "
              f"(chunk {dt*1e3:.1f} ms, compile {compile_s:.0f}s)",
              file=sys.stderr)
        del cache, state
    print(json.dumps(results))


if __name__ == "__main__":
    main()
