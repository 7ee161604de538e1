"""Generic decoder-only transformer with a slot-indexed KV cache.

This single implementation replaces the reference's per-family torch modules
(reference: server/.../models/custom_modeling/flash_llama_modeling.py:240-497
and siblings): family differences — RoPE vs ALiBi vs learned positions,
RMSNorm vs LayerNorm, GLU vs plain MLP, parallel vs sequential residuals,
MQA/GQA head counts, biases — are all data in `DecoderSpec`.

TPU-first design notes:
  * layer parameters are stacked along a leading axis and the layer loop is a
    `lax.scan`, so compile time is O(1) in depth;
  * the KV cache is a pair of `[L, S, K, T, D]` arrays (S = batch slots,
    T = max sequence length); prefill and decode write into it with
    dynamic-update-slice, and callers donate the cache buffers so XLA
    updates them in place;
  * every shape is static: prefill is compiled per (num_seqs, bucket_len),
    decode is compiled once for the full slot batch, with inactive slots
    masked. This is the whole replacement for the reference's
    prune/concatenate batch churn (reference: causal_lm.py:218-545).
  * attention currently uses plain XLA einsum + masked softmax; the Pallas
    flash/ragged kernels in ops/pallas plug in behind the same interface.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear as linops
from ..ops import attention as attn_ops


@dataclasses.dataclass(frozen=True)
class DecoderSpec:
    """Static architecture description of a decoder-only model family."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    # position encoding: "rope" | "alibi" | "learned"
    pos: str = "rope"
    rope_theta: float = 10000.0
    rope_scaling: float = 1.0     # linear position-interpolation factor
    rotary_pct: float = 1.0       # fraction of head_dim that rotates (neox)
    # True: GPT-J/CodeGen "rotate_every_two" pairing (even/odd lanes);
    # False: GPT-NeoX/Llama "rotate_half" (first/second half)
    rope_interleaved: bool = False
    pos_offset: int = 0           # learned-position lookup offset (OPT: 2)
    alibi_impl: str = "bloom"     # slope formula: "bloom" | "mpt"
    max_position_embeddings: int = 2048
    # attend only to the last `sliding_window` positions (mistral). The KV
    # cache stays max_seq-sized (no rolling eviction); masking alone
    # preserves exact HF semantics.
    sliding_window: Optional[int] = None
    # norms
    norm: str = "rmsnorm"         # "rmsnorm" | "layernorm"
    norm_eps: float = 1e-5
    embed_norm: bool = False      # extra LayerNorm after embedding (bloom)
    # mlp
    activation: str = "silu_glu"  # "silu_glu" | "gelu_glu" | "gelu" | "gelu_tanh"
    # structure
    parallel_residual: bool = False  # attn and mlp share the input (neox/falcon)
    embed_scale: float = 1.0      # multiply token embeddings (gemma: sqrt(D))
    qkv_clip: Optional[float] = None  # clamp q/k/v to [-clip, clip] (mpt)
    qkv_bias: bool = False
    attn_out_bias: bool = False
    mlp_bias: bool = False
    norm_bias: bool = False       # LayerNorm has bias (always true for layernorm)
    tie_word_embeddings: bool = False
    attn_softmax_in_f32: bool = True
    # gpt2-style scaling of attention scores already folded in via head_dim

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def rotary_dim(self) -> int:
        d = int(self.head_dim * self.rotary_pct)
        return d - d % 2


class KVCache(NamedTuple):
    """Slot-indexed KV cache: k/v are [num_layers, slots, kv_heads, max_seq, head_dim].

    With dtype int8 the cache is symmetric per-token-per-head quantized:
    k_scale/v_scale are [L, S, K, T] f32 absmax/127 factors (3-6% extra
    bytes at head_dim 64-128; decode attention reads half the KV bytes —
    the HBM-bandwidth term that dominates long-context decode). Dequant is
    folded into the score/value einsums per position, not per element (the
    scale factors out of the head_dim contraction)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, spec: DecoderSpec, num_slots: int, max_seq: int, dtype) -> "KVCache":
        shape = (spec.num_layers, num_slots, spec.num_kv_heads, max_seq, spec.head_dim)
        if jnp.dtype(dtype) == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(shape[:-1], jnp.float32),
                       v_scale=jnp.zeros(shape[:-1], jnp.float32))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def num_slots(self) -> int:
        return self.k.shape[1]


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] float -> ([..., D] int8, [...] f32 scale); symmetric absmax
    over the head dim (per token per head — near-lossless for KV)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sc[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, sc


# ---------------------------------------------------------------------------
# parameter initialization (random weights; real checkpoints come from
# utils/weights.py via models/families.py name mapping)
# ---------------------------------------------------------------------------


def init_params(spec: DecoderSpec, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree (layer-stacked). Used for tests/benches."""
    counter = [0]

    def dense(shape, scale=None):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    L, D, F = spec.num_layers, spec.hidden_size, spec.intermediate_size
    H, K, Dh = spec.num_heads, spec.num_kv_heads, spec.head_dim

    def stack(fn):
        return jnp.stack([fn() for _ in range(L)])

    def norm_params(with_bias):
        p = {"scale": jnp.ones((L, D), dtype)}
        if with_bias:
            p["bias"] = jnp.zeros((L, D), dtype)
        return p

    norm_has_bias = spec.norm == "layernorm" or spec.norm_bias
    glu = spec.activation.endswith("_glu")

    layers = {
        "ln1": norm_params(norm_has_bias),
        "ln2": norm_params(norm_has_bias),
        "wq": stack(lambda: dense((D, H * Dh))),
        "wk": stack(lambda: dense((D, K * Dh))),
        "wv": stack(lambda: dense((D, K * Dh))),
        "wo": stack(lambda: dense((H * Dh, D))),
        "w_up": stack(lambda: dense((D, F))),
        "w_down": stack(lambda: dense((F, D))),
    }
    if glu:
        layers["w_gate"] = stack(lambda: dense((D, F)))
    if spec.qkv_bias:
        layers["bq"] = jnp.zeros((L, H * Dh), dtype)
        layers["bk"] = jnp.zeros((L, K * Dh), dtype)
        layers["bv"] = jnp.zeros((L, K * Dh), dtype)
    if spec.attn_out_bias:
        layers["bo"] = jnp.zeros((L, D), dtype)
    if spec.mlp_bias:
        layers["b_up"] = jnp.zeros((L, F), dtype)
        layers["b_down"] = jnp.zeros((L, D), dtype)
        if glu:
            layers["b_gate"] = jnp.zeros((L, F), dtype)

    params = {
        "embed_tokens": dense((spec.vocab_size, D), scale=0.02),
        "layers": layers,
        "final_norm": {
            "scale": jnp.ones((D,), dtype),
            **({"bias": jnp.zeros((D,), dtype)} if norm_has_bias else {}),
        },
    }
    if spec.pos == "learned":
        params["embed_positions"] = dense((spec.max_position_embeddings, D), scale=0.02)
    if spec.embed_norm:
        params["embed_ln"] = {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}
    if not spec.tie_word_embeddings:
        params["lm_head"] = dense((D, spec.vocab_size))
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _norm(spec: DecoderSpec, p: dict, x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    if spec.norm == "rmsnorm":
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + spec.norm_eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + spec.norm_eps)
    out = out * p["scale"].astype(jnp.float32)
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _activate(spec: DecoderSpec, up: jax.Array, gate: Optional[jax.Array]) -> jax.Array:
    act = spec.activation
    if act == "silu_glu":
        return jax.nn.silu(gate) * up
    if act == "gelu_glu":
        return jax.nn.gelu(gate, approximate=False) * up
    if act == "gelu_tanh_glu":
        return jax.nn.gelu(gate, approximate=True) * up
    if act == "gelu":
        return jax.nn.gelu(up, approximate=False)
    if act == "gelu_tanh":
        return jax.nn.gelu(up, approximate=True)
    if act == "relu":
        return jax.nn.relu(up)
    raise ValueError(f"unknown activation {act}")


def _rope_freqs(spec: DecoderSpec, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for rotate-half RoPE at the given positions.

    Linear scaling divides positions by the scaling factor (reference:
    flash_llama_modeling.py LinearScaling rotary).
    """
    rd = spec.rotary_dim
    inv_freq = 1.0 / (
        spec.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    pos = positions.astype(jnp.float32) / spec.rope_scaling
    freqs = jnp.einsum("...,f->...f", pos, inv_freq)
    if spec.rope_interleaved:
        # GPT-J pairing: each frequency drives an adjacent (even, odd) lane
        # pair, so the table repeats per-element instead of per-half
        emb = jnp.repeat(freqs, 2, axis=-1)
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(spec: DecoderSpec, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., heads, head_dim]; cos/sin: [..., rotary_dim] (no head axis)."""
    rd = spec.rotary_dim
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    if spec.rope_interleaved:
        # rotate_every_two: (x0, x1) -> (-x1, x0) per adjacent lane pair
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    else:
        half = rd // 2
        x1, x2 = x_rot[..., :half], x_rot[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    x_rot = (x_rot.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)
    return jnp.concatenate([x_rot, x_pass], axis=-1) if rd < x.shape[-1] else x_rot


def alibi_slopes(num_heads: int, impl: str = "bloom") -> np.ndarray:
    """ALiBi head slopes (reference: custom_modeling/bloom_modeling.py:104).

    impl="mpt" uses MPT's ceil-power-of-two formula with the even/odd
    reorder (HF MptModel.build_mpt_alibi_tensor, alibi_bias_max=8); for
    power-of-two head counts the two formulas coincide, otherwise the
    slope assignment differs per head.
    """
    if impl == "mpt":
        pow2 = 2 ** math.ceil(math.log2(num_heads))
        base = np.arange(1, pow2 + 1, dtype=np.float64) * (8.0 / pow2)
        slopes = 1.0 / np.exp2(base)
        if pow2 != num_heads:
            slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
        return slopes.astype(np.float32)
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest < num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [extra_base ** i for i in range(1, 2 * (num_heads - closest), 2)]
    return np.asarray(slopes, np.float32)


def _embed(spec: DecoderSpec, params: dict, ids: jax.Array, positions: jax.Array) -> jax.Array:
    x = jnp.take(params["embed_tokens"], ids, axis=0)
    if "project_in" in params:
        # OPT word_embed_proj_dim != hidden_size (opt-350m): tokens embed in
        # the word dim and project up before positions are added
        x = jnp.dot(x, params["project_in"])
    if spec.embed_scale != 1.0:
        x = (x.astype(jnp.float32) * spec.embed_scale).astype(x.dtype)
    if spec.pos == "learned":
        x = x + jnp.take(params["embed_positions"],
                         positions + spec.pos_offset, axis=0)
    if spec.embed_norm:
        p = params["embed_ln"]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + spec.norm_eps)
        x = (xf * p["scale"] + p["bias"]).astype(x.dtype)
    return x


def _layer_scan(layer_fn, x, layers, other_xs):
    """`lax.scan` over the layer-stacked params. When layer-stacked s4
    INT4 weights are present (post-prepare_params, TPU), they are lifted
    OUT of the scan xs and indexed per layer inside the Pallas kernel via
    scalar prefetch (linops.split_stacked_quant): a scan-xs dynamic-slice
    feeding a custom call is materialized by XLA — slice read + slice
    write + kernel read ≈ 3x the weight traffic of the decode floor
    (measured: scripts/probe_int4.py scanstack vs scanidx). Everything
    else (dense weights, KV slabs) rides the scan unchanged."""
    split = linops.split_stacked_quant(
        layers, rows=int(np.prod(x.shape[:-1])))
    if split is None:
        return jax.lax.scan(layer_fn, x, (layers, *other_xs))
    dense_layers, num_layers, rebuild = split

    def body(carry, inputs):
        li, dlp, *rest = inputs
        return layer_fn(carry, (rebuild(dlp, li), *rest))

    return jax.lax.scan(
        body, x, (jnp.arange(num_layers, dtype=jnp.int32), dense_layers,
                  *other_xs))


def verify_chunk(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S, C] i32: candidate tokens per slot
    start_pos: jax.Array,    # [S] i32: position of ids[:, 0]
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Speculative-verification forward: C candidate positions per slot in
    one pass (the model-side half of the reference's speculative decoding,
    reference: server/.../utils/paged.py:253-326). Attention for candidate
    j covers the slot's prefix (< start_pos) plus candidates 0..j (causal
    within the chunk). KV for all candidates is written into the cache; the
    caller rewinds rejected positions by simply not advancing context_len —
    later writes overwrite the garbage.

    Returns ([S, C, V] f32 logits, cache).
    """
    s, c = ids.shape
    t_max = cache.max_seq
    positions = start_pos[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    x = _embed(spec, params, ids, positions)            # [S, C, D]

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)         # [S, C, rd]
    else:
        cos = sin = None

    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    # mask [S, C, Tmax]: key visible to candidate j iff key_pos <= pos_j
    mask = key_pos[None, None, :] <= positions[:, :, None]
    if spec.sliding_window is not None:
        mask = mask & (key_pos[None, None, :]
                       > positions[:, :, None] - spec.sliding_window)
    if spec.pos == "alibi":
        slopes = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl))
        bias = slopes[None, :, None, None] * key_pos.astype(jnp.float32)[None, None, None, :]
    else:
        bias = None

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)

    def layer(x, inputs):
        lp, ck, cv = inputs
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)                     # q [S, C, H, Dh]
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        # scatter C new positions per slot into the cache
        k_t = k.transpose(0, 2, 1, 3).astype(ck.dtype)  # [S, K, C, Dh]
        v_t = v.transpose(0, 2, 1, 3).astype(cv.dtype)
        pos_idx = positions[:, None, :].astype(jnp.int32)
        ck = ck.at[rows[:, None, None],
                   jnp.arange(spec.num_kv_heads)[None, :, None],
                   pos_idx, :].set(k_t, mode="drop")
        cv = cv.at[rows[:, None, None],
                   jnp.arange(spec.num_kv_heads)[None, :, None],
                   pos_idx, :].set(v_t, mode="drop")

        qg = q.reshape(s, c, spec.num_kv_heads, group, spec.head_dim)
        scores = jnp.einsum("sckgd,sktd->skgct", qg, ck,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            b = bias.reshape(1, spec.num_kv_heads, group, 1, t_max)
            scores = scores + b
        scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
        attn = jnp.einsum("skgct,sktd->sckgd", probs, cv)
        attn = attn.reshape(s, c, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (ck, cv)

    x, (new_k, new_v) = _layer_scan(layer, x, params["layers"],
                                    (cache.k, cache.v))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, x, KVCache(k=new_k, v=new_v)


def _unembed(spec: DecoderSpec, params: dict, x: jax.Array) -> jax.Array:
    if "project_out" in params:
        x = jnp.dot(x, params["project_out"])
    if spec.tie_word_embeddings:
        logits = jnp.dot(x, params["embed_tokens"].T,
                         preferred_element_type=jnp.float32)
    else:
        w = params["lm_head"]
        if linops.is_quantized(w):
            logits = linops.matmul(x, w).astype(jnp.float32)
        else:
            logits = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "lm_head_bias" in params:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    return logits


def _qkv(spec: DecoderSpec, lp: dict, x: jax.Array):
    """x: [..., D] -> q [..., H, Dh], k/v [..., K, Dh]."""
    if "w_qkv" in lp:
        qkv = linops.matmul(x, lp["w_qkv"])
        if "b_qkv" in lp:
            qkv = qkv + lp["b_qkv"]
        qs, ks = spec.q_size, spec.kv_size
        q = qkv[..., :qs]
        k = qkv[..., qs:qs + ks]
        v = qkv[..., qs + ks:]
    else:
        q = linops.matmul(x, lp["wq"])
        k = linops.matmul(x, lp["wk"])
        v = linops.matmul(x, lp["wv"])
        if spec.qkv_bias:
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
    if spec.qkv_clip is not None:
        q = jnp.clip(q, -spec.qkv_clip, spec.qkv_clip)
        k = jnp.clip(k, -spec.qkv_clip, spec.qkv_clip)
        v = jnp.clip(v, -spec.qkv_clip, spec.qkv_clip)
    q = q.reshape(*x.shape[:-1], spec.num_heads, spec.head_dim)
    k = k.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    v = v.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    return q, k, v


def _attn_out(spec: DecoderSpec, lp: dict, attn: jax.Array) -> jax.Array:
    out = linops.matmul(attn.reshape(*attn.shape[:-2], spec.q_size), lp["wo"])
    if spec.attn_out_bias:
        out = out + lp["bo"]
    return out


def _mlp(spec: DecoderSpec, lp: dict, x: jax.Array) -> jax.Array:
    if "w_gu" in lp:
        if "b_gu" not in lp and not spec.mlp_bias and linops.can_fuse_mlp(
                lp["w_gu"], lp["w_down"], spec.activation,
                int(np.prod(x.shape[:-1]))):
            # decode INT4 fast path: gu GEMM + activation + down GEMM as
            # ONE Pallas launch (no [S, 2I] HBM round-trip, one pipeline
            # ramp instead of two) — ops/pallas/int4_matmul.py
            return linops.mlp_fused(x, lp["w_gu"], lp["w_down"],
                                    spec.activation)
        gu = linops.matmul(x, lp["w_gu"])
        if "b_gu" in lp:
            gu = gu + lp["b_gu"]
        f = spec.intermediate_size
        gate, up = gu[..., :f], gu[..., f:]
    else:
        up = linops.matmul(x, lp["w_up"])
        if spec.mlp_bias:
            up = up + lp["b_up"]
        gate = None
        if spec.activation.endswith("_glu"):
            gate = linops.matmul(x, lp["w_gate"])
            if spec.mlp_bias:
                gate = gate + lp["b_gate"]
    h = _activate(spec, up, gate)
    out = linops.matmul(h, lp["w_down"])
    if spec.mlp_bias:
        out = out + lp["b_down"]
    return out


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------


def prefill(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,        # [N, T] i32, right-padded to the bucket length
    lengths: jax.Array,    # [N] i32 true lengths
    slots: jax.Array,      # [N] i32 target cache slots
    cache: KVCache,
    prefix_embeds: Optional[jax.Array] = None,  # [N, T, D] override (soft prompts)
    prefix_len: Optional[jax.Array] = None,     # [N] i32 prefix positions per row
    return_hidden: bool = False,
):
    """Full causal forward over a padded bucket; writes KV into `cache` slots.

    Returns ([N, T, V] f32 logits at every position, updated cache) — plus
    the final-norm hidden states [N, T, D] when `return_hidden` (used to
    seed the speculator). Garbage beyond each row's true length is never
    read back: decode masks on context length, and the caller gathers
    logits at length-1.
    """
    n, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
    x = _embed(spec, params, ids, positions)
    if prefix_embeds is not None:
        # soft-prompt injection: rows with prefix_len > 0 take their first
        # prefix_len vectors from prefix_embeds instead of token embeddings
        # (reference: causal_lm.py:175-191)
        use_prefix = positions < prefix_len[:, None]
        x = jnp.where(use_prefix[..., None], prefix_embeds.astype(x.dtype), x)

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)     # [N, T, rd]
    else:
        cos = sin = None

    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    key_valid = positions < lengths[:, None]        # [N, T] mask padded keys
    mask = causal[None, :, :] & key_valid[:, None, :]
    if spec.sliding_window is not None:
        # window applies to REAL query rows only: a padded row past a short
        # sequence could see zero in-window valid keys, and its all-masked
        # softmax would mint NaNs that poison later layers' k/v through
        # 0 * NaN. Padded rows keep the plain causal mask (their output is
        # garbage either way, but stays finite).
        qi = jnp.arange(t, dtype=jnp.int32)
        in_window = (qi[:, None] - qi[None, :]) < spec.sliding_window
        q_real = positions < lengths[:, None]       # [N, T]
        mask = mask & (in_window[None, :, :] | ~q_real[:, :, None])
    if spec.pos == "alibi":
        slopes = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl))
        alibi = slopes[:, None] * jnp.arange(t, dtype=jnp.float32)[None, :]
        bias = alibi[None, :, None, :]              # [1, H, 1, T]
    else:
        bias = None

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads

    quant = cache.quantized

    def layer(x, inputs):
        if quant:
            lp, ck, cv, csk, csv = inputs
        else:
            lp, ck, cv = inputs
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        # [N, T, H, Dh] -> grouped [N, T, K, G, Dh]
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

        # write this layer's K/V into the cache slots: ck/cv are [S, K, Tmax, D]
        k_t = k.transpose(0, 2, 1, 3)                    # [N, K, T, D]
        v_t = v.transpose(0, 2, 1, 3)
        if quant:
            k_t, k_sc = quantize_kv(k_t)
            v_t, v_sc = quantize_kv(v_t)
            csk = csk.at[slots, :, :t].set(k_sc)
            csv = csv.at[slots, :, :t].set(v_sc)
        ck = ck.at[slots, :, :t, :].set(k_t.astype(ck.dtype))
        cv = cv.at[slots, :, :t, :].set(v_t.astype(cv.dtype))
        return x, ((ck, cv, csk, csv) if quant else (ck, cv))

    if quant:
        x, (new_k, new_v, new_sk, new_sv) = _layer_scan(
            layer, x, params["layers"], (cache.k, cache.v,
                                         cache.k_scale, cache.v_scale))
        new_cache = KVCache(k=new_k, v=new_v, k_scale=new_sk, v_scale=new_sv)
    else:
        x, (new_k, new_v) = _layer_scan(
            layer, x, params["layers"], (cache.k, cache.v))
        new_cache = KVCache(k=new_k, v=new_v)
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    if return_hidden:
        return logits, x, new_cache
    return logits, new_cache


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_ring_step(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S] i32: last token per slot
    positions: jax.Array,    # [S] i32: position ids[s] will occupy
    cache: KVCache,          # read-only this chunk (holds pos < chunk_start)
    kbuf: jax.Array,         # [L, S, K, C, D] in-chunk keys (cols < step_idx valid)
    vbuf: jax.Array,         # [L, S, K, C, D]
    step_idx: jax.Array,     # scalar i32: step within the chunk
    chunk_start: jax.Array,  # [S] i32: positions[s] at chunk entry
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step of the RING-BUFFER chunk scheme (the fastest decode
    path, see ROADMAP): within a decode chunk the KV cache is never
    written — attention reads the (read-only) cache for pre-chunk context,
    a small per-chunk ring buffer for in-chunk tokens, and the current
    token's k/v directly. The caller scatters the ring into the cache ONCE
    per chunk, so XLA never copies the full cache slabs to preserve
    read-before-write semantics (the per-step scatter of the "post" mode
    costs a full dual-slab copy: ~5.4ms/step on TinyLlama/v5e vs ~0.1ms
    amortized here).

    Buffer col c of slot s holds the token at position chunk_start[s] + c;
    cols >= step_idx are invalid. Returns (logits [S, V] f32,
    k_all [L, S, K, D], v_all [L, S, K, D]) — the current token's per-layer
    k/v for the caller to write into the ring.
    """
    s = ids.shape[0]
    t_max = cache.max_seq
    n_buf = kbuf.shape[3]
    x = _embed(spec, params, ids, positions)        # [S, D]
    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None

    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    cache_mask = key_pos[None, :] < chunk_start[:, None]     # [S, Tmax]
    buf_mask = jnp.arange(n_buf, dtype=jnp.int32)[None, :] < step_idx
    if spec.sliding_window is not None:
        lo = positions[:, None] - spec.sliding_window        # exclusive
        cache_mask = cache_mask & (key_pos[None, :] > lo)
        buf_pos_sw = (chunk_start[:, None]
                      + jnp.arange(n_buf, dtype=jnp.int32)[None, :])
        buf_mask = buf_mask & (buf_pos_sw > lo)              # [S, C]
    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads

    if spec.pos == "alibi":
        slopes_kg = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl)).reshape(
            spec.num_kv_heads, group)
        cache_bias = (slopes_kg[None, :, :, None]
                      * key_pos.astype(jnp.float32)[None, None, None, :])
        buf_pos = (chunk_start[:, None]
                   + jnp.arange(n_buf, dtype=jnp.int32)[None, :])  # [S, C]
        buf_bias = (slopes_kg[None, :, :, None]
                    * buf_pos.astype(jnp.float32)[:, None, None, :])
        new_bias = (slopes_kg[None]
                    * positions[:, None, None].astype(jnp.float32))
    else:
        cache_bias = buf_bias = new_bias = None

    quant = cache.quantized

    def layer(x, inputs):
        if quant:
            lp, ck, cv, csk, csv, kb, vb = inputs  # READ-ONLY cache slabs
        else:
            lp, ck, cv, kb, vb = inputs            # kb/vb [S, K, C, D]
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
        # int8 cache: the per-position scale factors out of the head_dim
        # contraction — apply it to the [S,K,G,T] scores / [S,K,G,T] probs
        # (D x fewer multiplies than dequantizing k/v in place; the int8->
        # compute convert fuses into the einsum read)
        scores = jnp.einsum("skgd,sktd->skgt", qg, ck.astype(qg.dtype),
                            preferred_element_type=jnp.float32) * scale
        if quant:
            scores = scores * csk[:, :, None, :]
        if cache_bias is not None:
            scores = scores + cache_bias
        scores = jnp.where(cache_mask[:, None, None, :], scores, -jnp.inf)
        bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                             preferred_element_type=jnp.float32) * scale
        if buf_bias is not None:
            bscores = bscores + buf_bias
        bscores = jnp.where(buf_mask[:, None, None, :], bscores, -jnp.inf)
        score_new = jnp.sum(
            qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
            axis=-1) * scale                                # [S, K, G]
        if new_bias is not None:
            score_new = score_new + new_bias
        all_scores = jnp.concatenate(
            [scores, bscores, score_new[..., None]], axis=-1)
        probs = jax.nn.softmax(all_scores, axis=-1).astype(v.dtype)
        pc = probs[..., :t_max]
        if quant:
            pc = pc * csv[:, :, None, :].astype(pc.dtype)
        attn = jnp.einsum("skgt,sktd->skgd", pc, cv.astype(pc.dtype)) \
            + jnp.einsum("skgc,skcd->skgd",
                         probs[..., t_max:t_max + n_buf], vb) \
            + probs[..., t_max + n_buf:] * v[:, :, None, :]
        attn = attn.reshape(s, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (k, v)

    xs = ((cache.k, cache.v, cache.k_scale, cache.v_scale,
           kbuf, vbuf) if quant
          else (cache.k, cache.v, kbuf, vbuf))
    x, (k_all, v_all) = _layer_scan(layer, x, params["layers"], xs)
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, k_all, v_all


def ring_flush(cache: KVCache, kbuf: jax.Array, vbuf: jax.Array,
               chunk_start: jax.Array) -> KVCache:
    """Scatter a chunk's ring buffers into the cache: buffer col c of slot
    s lands at position chunk_start[s] + c. Out-of-range positions are
    dropped (requests never legitimately reach them — validation caps
    input + max_new within max_seq). ONE scatter per chunk; with donation
    it runs in place."""
    n_buf = kbuf.shape[3]
    s = kbuf.shape[1]
    t_max = cache.max_seq
    rows = jnp.arange(s)
    wpos = chunk_start[None, :] + jnp.arange(n_buf, dtype=jnp.int32)[:, None]
    wpos = jnp.where(wpos < t_max, wpos, t_max)                  # drop OOB
    idx_rows = jnp.broadcast_to(rows[None, :], (n_buf, s))
    kq, vq = kbuf, vbuf
    k_sc = v_sc = None
    if cache.quantized:
        # in-chunk ring buffers stay full precision; quantize once at flush
        kq, k_sc = quantize_kv(kbuf)
        vq, v_sc = quantize_kv(vbuf)
    # advanced indices (C, S) at axes 1 and 3 move to the front: the
    # updated region is [C, S, L, K, D]
    new_k = cache.k.at[:, idx_rows, :, wpos, :].set(
        kq.transpose(3, 1, 0, 2, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, idx_rows, :, wpos, :].set(
        vq.transpose(3, 1, 0, 2, 4).astype(cache.v.dtype), mode="drop")
    if cache.quantized:
        new_sk = cache.k_scale.at[:, idx_rows, :, wpos].set(
            k_sc.transpose(3, 1, 0, 2), mode="drop")
        new_sv = cache.v_scale.at[:, idx_rows, :, wpos].set(
            v_sc.transpose(3, 1, 0, 2), mode="drop")
        return KVCache(k=new_k, v=new_v, k_scale=new_sk, v_scale=new_sv)
    return KVCache(k=new_k, v=new_v)


def decode(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S] i32: last token per slot
    positions: jax.Array,    # [S] i32: position of that token (= context_len - 1 + 1 write pos)
    cache: KVCache,
    context_len: jax.Array,  # [S] i32: valid tokens in cache per slot AFTER this step's write
    write_mode: str = "post",
) -> tuple[jax.Array, KVCache]:
    """One decode step over every slot. Returns ([S, V] f32 logits, cache).

    `positions[s]` is the position at which `ids[s]` is written into the
    cache (i.e. the current sequence length before the step), and
    `context_len[s]` must equal `positions[s] + 1` for active slots; inactive
    slots just recompute garbage into their own slot, which is later
    overwritten by the next prefill.

    `write_mode` (static; flows from ServingConfig.decode_write_mode):
      * "post" (default) — the layer scan carries only the current token's
        per-layer k/v and ONE batched scatter updates all layers afterwards;
        attention is an explicit einsum over the read-only cache plus the
        new column. Fastest at short/medium max_seq (+17% on v5e, see
        ROADMAP), but bypasses ops.attention's length-aware Pallas kernel,
        so dead-KV DMA is not skipped.
      * "scan" — k/v written into the cache inside each layer; attention
        goes through ops.attention.decode_attention, whose Pallas kernel
        skips dead-KV reads at T >= 2048. Prefer for long max_seq.
    """
    s = ids.shape[0]
    t_max = cache.max_seq
    x = _embed(spec, params, ids, positions)        # [S, D]

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)     # [S, rd]
    else:
        cos = sin = None

    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    mask = key_pos[None, :] < context_len[:, None]  # [S, Tmax]
    if spec.sliding_window is not None:
        mask = mask & (key_pos[None, :]
                       >= context_len[:, None] - spec.sliding_window)
    if spec.pos == "alibi":
        slopes = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl))
        bias = slopes[:, None] * key_pos.astype(jnp.float32)[None, :]  # [H, Tmax]
    else:
        bias = None

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    rows = jnp.arange(s)

    if write_mode == "post":
        # POST-SCAN WRITE VARIANT: the scan carries only the tiny per-layer
        # k/v (the current token), attending over the read-only cache plus
        # the new column explicitly; ONE scatter updates all layers after
        # the scan. Avoids threading full cache slabs through scan ys.
        old_mask = key_pos[None, :] < positions[:, None]    # exclude current
        if spec.sliding_window is not None:
            old_mask = old_mask & (
                key_pos[None, :] > positions[:, None] - spec.sliding_window)

        def layer(x, inputs):
            lp, ck, cv = inputs
            h = _norm(spec, lp["ln1"], x)
            q, k, v = _qkv(spec, lp, h)
            if cos is not None:
                q = _apply_rope(spec, q, cos, sin)
                k = _apply_rope(spec, k, cos, sin)
            qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
            scores = jnp.einsum("skgd,sktd->skgt", qg, ck,
                                preferred_element_type=jnp.float32) * scale
            if bias is not None:
                scores = scores + bias.reshape(
                    1, spec.num_kv_heads, group, t_max)
            scores = jnp.where(old_mask[:, None, None, :], scores, -jnp.inf)
            score_new = jnp.sum(
                qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
                axis=-1) * scale                            # [S, K, G]
            if bias is not None:
                slopes_kg = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl)).reshape(
                    spec.num_kv_heads, group)
                score_new = score_new + slopes_kg[None]                     * positions[:, None, None].astype(jnp.float32)
            all_scores = jnp.concatenate(
                [scores, score_new[..., None]], axis=-1)    # [S, K, G, T+1]
            probs = jax.nn.softmax(all_scores, axis=-1).astype(cv.dtype)
            attn = jnp.einsum("skgt,sktd->skgd", probs[..., :t_max], cv)                 + probs[..., t_max:] * v[:, :, None, :]
            attn = attn.reshape(s, spec.num_heads, spec.head_dim)
            attn = _attn_out(spec, lp, attn)

            if spec.parallel_residual:
                h2 = _norm(spec, lp["ln2"], x)
                x = x + attn + _mlp(spec, lp, h2)
            else:
                x = x + attn
                h2 = _norm(spec, lp["ln2"], x)
                x = x + _mlp(spec, lp, h2)
            return x, (k, v)

        x, (k_all, v_all) = _layer_scan(
            layer, x, params["layers"], (cache.k, cache.v))
        # advanced indices separated by slices move to the FRONT of the
        # result: the updated region is [S, L, K, D]
        new_k = cache.k.at[:, rows, :, positions, :].set(
            k_all.transpose(1, 0, 2, 3).astype(cache.k.dtype))
        new_v = cache.v.at[:, rows, :, positions, :].set(
            v_all.transpose(1, 0, 2, 3).astype(cache.v.dtype))
        x = _norm(spec, params["final_norm"], x)
        logits = _unembed(spec, params, x)
        return logits, KVCache(k=new_k, v=new_v)

    def layer(x, inputs):
        lp, ck, cv = inputs
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)                 # q [S, H, Dh]; k/v [S, K, Dh]
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)

        # write new k/v at each slot's current position
        ck = ck.at[rows, :, positions, :].set(k.astype(ck.dtype))
        cv = cv.at[rows, :, positions, :].set(v.astype(cv.dtype))

        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
        b = (bias.reshape(spec.num_kv_heads, group, t_max)[None]
             if bias is not None else None)
        attn = attn_ops.decode_attention(qg, ck, cv, context_len, b, mask, scale)
        attn = attn.reshape(s, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (ck, cv)

    x, (new_k, new_v) = _layer_scan(layer, x, params["layers"],
                                    (cache.k, cache.v))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, KVCache(k=new_k, v=new_v)
