"""T5-family encoder-decoder (t5, t5 v1.1, mt5/mt0, flan-t5) in pure JAX.

Counterpart of the reference's TP T5 implementation and Seq2SeqLM batch
state machine (reference:
server/.../models/custom_modeling/t5_modeling.py,
server/.../models/seq2seq_lm.py). Architecture notes:

  * T5LayerNorm is RMS-style (no mean subtraction, no bias), computed f32;
  * attention has NO 1/sqrt(d) scaling (folded into initialization);
  * relative position bias: bucketed distances, embedded per head, computed
    from layer 0's table and shared by all layers (encoder bidirectional,
    decoder causal);
  * cross-attention has no position bias; its K/V are computed once from the
    encoder output at prefill and reused every decode step;
  * v1.1/mT5 use gated-GELU MLP and an untied lm_head; v1.0 ties the head to
    the shared embedding and scales hidden by d_model^-0.5 before unembed.

Layer parameters are stacked and scanned exactly like the decoder-only core.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Spec:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_heads: int
    num_encoder_layers: int
    num_decoder_layers: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    norm_eps: float = 1e-6
    gated_act: bool = True            # v1.1/mT5: gated-gelu; v1.0: relu
    tie_word_embeddings: bool = False
    decoder_start_token_id: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def spec_from_hf_config(c: dict) -> T5Spec:
    act = c.get("feed_forward_proj", "relu")
    return T5Spec(
        vocab_size=c["vocab_size"],
        d_model=c["d_model"],
        d_kv=c["d_kv"],
        d_ff=c["d_ff"],
        num_heads=c["num_heads"],
        num_encoder_layers=c["num_layers"],
        num_decoder_layers=c.get("num_decoder_layers", c["num_layers"]),
        rel_buckets=c.get("relative_attention_num_buckets", 32),
        rel_max_distance=c.get("relative_attention_max_distance", 128),
        norm_eps=c.get("layer_norm_epsilon", 1e-6),
        gated_act=act.startswith("gated"),
        tie_word_embeddings=c.get("tie_word_embeddings", True),
        decoder_start_token_id=c.get("decoder_start_token_id", 0),
    )


class T5DecodeState(NamedTuple):
    """Per-slot device state for incremental decoding."""

    self_k: jax.Array   # [L, S, H, T_dec, Dkv]
    self_v: jax.Array
    cross_k: jax.Array  # [L, S, H, T_enc, Dkv]
    cross_v: jax.Array
    enc_len: jax.Array  # [S]

    @classmethod
    def create(cls, spec: T5Spec, num_slots: int, max_dec: int, max_enc: int,
               dtype) -> "T5DecodeState":
        L, H, Dkv = spec.num_decoder_layers, spec.num_heads, spec.d_kv
        return cls(
            self_k=jnp.zeros((L, num_slots, H, max_dec, Dkv), dtype),
            self_v=jnp.zeros((L, num_slots, H, max_dec, Dkv), dtype),
            cross_k=jnp.zeros((L, num_slots, H, max_enc, Dkv), dtype),
            cross_v=jnp.zeros((L, num_slots, H, max_enc, Dkv), dtype),
            enc_len=jnp.zeros((num_slots,), jnp.int32),
        )


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _t5_norm(p: dict, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"]


def _relative_bucket(rel_pos: jax.Array, bidirectional: bool,
                     num_buckets: int, max_distance: int) -> jax.Array:
    """HF T5 _relative_position_bucket, vectorized."""
    ret = jnp.zeros_like(rel_pos)
    n = num_buckets
    if bidirectional:
        n = n // 2
        ret = ret + (rel_pos > 0).astype(jnp.int32) * n
        rel = jnp.abs(rel_pos)
    else:
        rel = -jnp.minimum(rel_pos, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    log_ratio = jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9) / \
        np.log(max_distance / max_exact)
    large = max_exact + (log_ratio * (n - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return ret + jnp.where(is_small, rel, large)


def _position_bias(table: jax.Array, q_pos: jax.Array, k_pos: jax.Array,
                   bidirectional: bool, num_buckets: int,
                   max_distance: int) -> jax.Array:
    """[..., H, Q, K] bias from the layer-0 relative embedding table [B, H]."""
    rel = k_pos[..., None, :] - q_pos[..., :, None]       # [..., Q, K]
    buckets = _relative_bucket(rel, bidirectional, num_buckets, max_distance)
    bias = jnp.take(table, buckets, axis=0)               # [..., Q, K, H]
    return jnp.moveaxis(bias, -1, -3)                     # [..., H, Q, K]


def _attention(q, k, v, bias, mask):
    """q [..., Q, H, D]; k/v [..., K, H, D]; no sqrt scaling (T5)."""
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def _mlp(spec: T5Spec, lp: dict, x: jax.Array) -> jax.Array:
    if spec.gated_act:
        h = jax.nn.gelu(jnp.dot(x, lp["wi0"]), approximate=True) * \
            jnp.dot(x, lp["wi1"])
    else:
        h = jax.nn.relu(jnp.dot(x, lp["wi0"]))
    return jnp.dot(h, lp["wo"])


def _proj_qkv(lp, x, h, dkv, prefix):
    out_shape = (*x.shape[:-1], h, dkv)
    q = jnp.dot(x, lp[f"{prefix}_q"]).reshape(out_shape)
    k = jnp.dot(x, lp[f"{prefix}_k"]).reshape(out_shape)
    v = jnp.dot(x, lp[f"{prefix}_v"]).reshape(out_shape)
    return q, k, v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode(spec: T5Spec, params: dict, ids: jax.Array,
           lengths: jax.Array,
           prefix_embeds: Optional[jax.Array] = None,
           prefix_len: Optional[jax.Array] = None) -> jax.Array:
    """ids [N, T_enc] right-padded; returns [N, T_enc, D] encoder states.
    With a tuned prompt, the first prefix_len positions take their
    embeddings from prefix_embeds (reference: seq2seq_lm.py encoder prefix
    injection)."""
    n, t = ids.shape
    x = jnp.take(params["shared_embed"], ids, axis=0)
    if prefix_embeds is not None:
        posn = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
        use = posn < prefix_len[:, None]
        x = jnp.where(use[..., None], prefix_embeds.astype(x.dtype), x)
    pos = jnp.arange(t, dtype=jnp.int32)
    bias = _position_bias(
        params["enc_rel_bias"], pos, pos, True,
        spec.rel_buckets, spec.rel_max_distance)          # [H, T, T]
    key_valid = pos[None, :] < lengths[:, None]           # [N, T]
    mask = key_valid[:, None, None, :]                    # [N, 1, 1, T]
    bias = bias[None]

    def layer(x, lp):
        h = _t5_norm(lp["ln1"], x, spec.norm_eps)
        q, k, v = _proj_qkv(lp, h, spec.num_heads, spec.d_kv, "sa")
        attn = _attention(q, k, v, bias, mask)
        x = x + jnp.dot(attn.reshape(n, t, spec.inner_dim), lp["sa_o"])
        h = _t5_norm(lp["ln2"], x, spec.norm_eps)
        x = x + _mlp(spec, lp, h)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["encoder_layers"])
    x = _t5_norm(params["enc_final_norm"], x, spec.norm_eps)
    return x


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decoder_prefill(
    spec: T5Spec, params: dict,
    dec_ids: jax.Array,       # [N, T_dec] right-padded decoder input ids
    dec_lengths: jax.Array,   # [N]
    enc_states: jax.Array,    # [N, T_enc, D]
    enc_lengths: jax.Array,   # [N]
    slots: jax.Array,         # [N]
    state: T5DecodeState,
    dec_prefix_embeds: Optional[jax.Array] = None,  # [N, T_dec, D]
    dec_prefix_len: Optional[jax.Array] = None,
    dec_prefix_start: Optional[jax.Array] = None,   # [N]; default 0
) -> tuple[jax.Array, T5DecodeState]:
    """Run the decoder over its prompt (usually just the start token),
    building self- and cross-KV caches. Returns ([N, T_dec, V] logits, state)."""
    n, t = dec_ids.shape
    t_enc = enc_states.shape[1]
    x = jnp.take(params["shared_embed"], dec_ids, axis=0)
    if dec_prefix_embeds is not None:
        posn = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
        start = (dec_prefix_start if dec_prefix_start is not None
                 else jnp.zeros((n,), jnp.int32))
        use = (posn >= start[:, None]) & \
              (posn < (start + dec_prefix_len)[:, None])
        x = jnp.where(use[..., None], dec_prefix_embeds.astype(x.dtype), x)
    pos = jnp.arange(t, dtype=jnp.int32)
    bias = _position_bias(
        params["dec_rel_bias"], pos, pos, False,
        spec.rel_buckets, spec.rel_max_distance)[None]    # [1, H, T, T]
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    self_valid = pos[None, :] < dec_lengths[:, None]
    self_mask = (causal[None] & self_valid[:, None, :])[:, None, :, :]
    enc_pos = jnp.arange(t_enc, dtype=jnp.int32)
    cross_mask = (enc_pos[None, :] < enc_lengths[:, None])[:, None, None, :]

    def layer(x, inputs):
        lp, sk, sv, ck, cv = inputs
        # self attention
        h = _t5_norm(lp["ln1"], x, spec.norm_eps)
        q, k, v = _proj_qkv(lp, h, spec.num_heads, spec.d_kv, "sa")
        attn = _attention(q, k, v, bias, self_mask)
        x = x + jnp.dot(attn.reshape(n, t, spec.inner_dim), lp["sa_o"])
        # cross attention (K/V from encoder states, cached for decode)
        h = _t5_norm(lp["ln_x"], x, spec.norm_eps)
        qx = jnp.dot(h, lp["xa_q"]).reshape(n, t, spec.num_heads, spec.d_kv)
        kx = jnp.dot(enc_states, lp["xa_k"]).reshape(
            n, t_enc, spec.num_heads, spec.d_kv)
        vx = jnp.dot(enc_states, lp["xa_v"]).reshape(
            n, t_enc, spec.num_heads, spec.d_kv)
        attn = _attention(qx, kx, vx, None, cross_mask)
        x = x + jnp.dot(attn.reshape(n, t, spec.inner_dim), lp["xa_o"])
        # mlp
        h = _t5_norm(lp["ln2"], x, spec.norm_eps)
        x = x + _mlp(spec, lp, h)

        # cache writes at the target slots
        sk = sk.at[slots, :, :t, :].set(k.transpose(0, 2, 1, 3).astype(sk.dtype))
        sv = sv.at[slots, :, :t, :].set(v.transpose(0, 2, 1, 3).astype(sv.dtype))
        ck = ck.at[slots, :, :t_enc, :].set(kx.transpose(0, 2, 1, 3).astype(ck.dtype))
        cv = cv.at[slots, :, :t_enc, :].set(vx.transpose(0, 2, 1, 3).astype(cv.dtype))
        return x, (sk, sv, ck, cv)

    x, (nsk, nsv, nck, ncv) = jax.lax.scan(
        layer, x,
        (params["decoder_layers"], state.self_k, state.self_v,
         state.cross_k, state.cross_v))
    x = _t5_norm(params["dec_final_norm"], x, spec.norm_eps)
    logits = _unembed(spec, params, x)
    state = state._replace(
        self_k=nsk, self_v=nsv, cross_k=nck, cross_v=ncv,
        enc_len=state.enc_len.at[slots].set(enc_lengths))
    return logits, state


def decoder_step(
    spec: T5Spec, params: dict,
    ids: jax.Array,        # [S] last decoder token per slot
    positions: jax.Array,  # [S] decoder position to write
    state: T5DecodeState,
) -> tuple[jax.Array, T5DecodeState]:
    """One incremental decoder step across all slots. Returns [S, V] logits."""
    s = ids.shape[0]
    t_dec = state.self_k.shape[3]
    t_enc = state.cross_k.shape[3]
    x = jnp.take(params["shared_embed"], ids, axis=0)     # [S, D]

    dec_pos = jnp.arange(t_dec, dtype=jnp.int32)
    bias = _position_bias(
        params["dec_rel_bias"], positions[:, None], dec_pos[None, :],
        False, spec.rel_buckets, spec.rel_max_distance)   # [S, H, 1, Tdec]
    self_mask = (dec_pos[None, :] <= positions[:, None])[:, None, None, :]
    enc_pos = jnp.arange(t_enc, dtype=jnp.int32)
    cross_mask = (enc_pos[None, :] < state.enc_len[:, None])[:, None, None, :]
    rows = jnp.arange(s)

    def layer(x, inputs):
        lp, sk, sv, ck, cv = inputs
        h = _t5_norm(lp["ln1"], x, spec.norm_eps)
        q, k, v = _proj_qkv(lp, h, spec.num_heads, spec.d_kv, "sa")  # [S, H, D]
        sk = sk.at[rows, :, positions, :].set(k.astype(sk.dtype))
        sv = sv.at[rows, :, positions, :].set(v.astype(sv.dtype))
        attn = _attention(q[:, None], sk.transpose(0, 2, 1, 3),
                          sv.transpose(0, 2, 1, 3), bias, self_mask)
        x = x + jnp.dot(attn.reshape(s, spec.inner_dim), lp["sa_o"])

        h = _t5_norm(lp["ln_x"], x, spec.norm_eps)
        qx = jnp.dot(h, lp["xa_q"]).reshape(s, 1, spec.num_heads, spec.d_kv)
        attn = _attention(qx, ck.transpose(0, 2, 1, 3),
                          cv.transpose(0, 2, 1, 3), None, cross_mask)
        x = x + jnp.dot(attn.reshape(s, spec.inner_dim), lp["xa_o"])

        h = _t5_norm(lp["ln2"], x, spec.norm_eps)
        x = x + _mlp(spec, lp, h)
        return x, (sk, sv)

    x, (nsk, nsv) = jax.lax.scan(
        layer, x,
        (params["decoder_layers"], state.self_k, state.self_v,
         state.cross_k, state.cross_v))
    x = _t5_norm(params["dec_final_norm"], x, spec.norm_eps)
    logits = _unembed(spec, params, x)
    return logits, state._replace(self_k=nsk, self_v=nsv)


def decoder_ring_step(
    spec: T5Spec, params: dict,
    ids: jax.Array,          # [S] last decoder token per slot
    positions: jax.Array,    # [S] decoder position ids[s] will occupy
    state: T5DecodeState,    # self-KV READ-ONLY this chunk
    kbuf: jax.Array,         # [L, S, H, C, Dkv] in-chunk keys (cols < step_idx)
    vbuf: jax.Array,         # [L, S, H, C, Dkv]
    step_idx: jax.Array,     # scalar i32
    chunk_start: jax.Array,  # [S] positions at chunk entry
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Ring-buffer decoder step (the seq2seq counterpart of
    core.decode_ring_step): self-KV slabs are never written inside a decode
    chunk — in-chunk tokens live in ring buffers, ONE scatter per chunk
    (Seq2SeqEngine) replaces the per-step full-slab copy. Cross-KV is
    naturally read-only (written once at prefill).

    Returns (logits [S, V] f32, k_all [L, S, H, Dkv], v_all likewise).
    """
    s = ids.shape[0]
    t_dec = state.self_k.shape[3]
    t_enc = state.cross_k.shape[3]
    n_buf = kbuf.shape[3]
    x = jnp.take(params["shared_embed"], ids, axis=0)     # [S, D]

    dec_pos = jnp.arange(t_dec, dtype=jnp.int32)
    # cache part: only pre-chunk positions are valid
    cache_mask = (dec_pos[None, :] < chunk_start[:, None])[:, None, :]
    cache_bias = _position_bias(
        params["dec_rel_bias"], positions[:, None], dec_pos[None, :],
        False, spec.rel_buckets, spec.rel_max_distance)[:, :, 0, :]  # [S,H,T]
    # ring part: col c holds position chunk_start + c
    buf_pos = chunk_start[:, None] + jnp.arange(n_buf, dtype=jnp.int32)[None]
    buf_mask = (jnp.arange(n_buf, dtype=jnp.int32)[None, :]
                < step_idx)[:, None, :]                                # [1,1,C]
    buf_bias = _position_bias(
        params["dec_rel_bias"], positions[:, None], buf_pos,
        False, spec.rel_buckets, spec.rel_max_distance)[:, :, 0, :]  # [S,H,C]
    # current token: relative distance 0
    new_bias = _position_bias(
        params["dec_rel_bias"], positions[:, None], positions[:, None],
        False, spec.rel_buckets, spec.rel_max_distance)[:, :, 0, :]  # [S,H,1]

    enc_pos = jnp.arange(t_enc, dtype=jnp.int32)
    cross_mask = (enc_pos[None, :] < state.enc_len[:, None])[:, None, None, :]

    def layer(x, inputs):
        lp, sk, sv, ck, cv, kb, vb = inputs   # sk/sv/kb/vb READ-ONLY
        h = _t5_norm(lp["ln1"], x, spec.norm_eps)
        q, k, v = _proj_qkv(lp, h, spec.num_heads, spec.d_kv, "sa")  # [S,H,D]
        # cache scores [S, H, Tdec]
        scores = jnp.einsum("shd,shtd->sht", q, sk,
                            preferred_element_type=jnp.float32) + cache_bias
        scores = jnp.where(cache_mask, scores, -jnp.inf)
        # ring scores [S, H, C]
        bscores = jnp.einsum("shd,shcd->shc", q, kb,
                             preferred_element_type=jnp.float32) + buf_bias
        bscores = jnp.where(buf_mask, bscores, -jnp.inf)
        # current token [S, H, 1]
        score_new = jnp.sum(
            q.astype(jnp.float32) * k.astype(jnp.float32), axis=-1,
            keepdims=True) + new_bias
        all_scores = jnp.concatenate([scores, bscores, score_new], axis=-1)
        probs = jax.nn.softmax(all_scores, axis=-1).astype(sv.dtype)
        attn = jnp.einsum("sht,shtd->shd", probs[..., :t_dec], sv)             + jnp.einsum("shc,shcd->shd",
                         probs[..., t_dec:t_dec + n_buf], vb)             + probs[..., t_dec + n_buf:] * v
        x = x + jnp.dot(attn.reshape(s, spec.inner_dim), lp["sa_o"])

        h = _t5_norm(lp["ln_x"], x, spec.norm_eps)
        qx = jnp.dot(h, lp["xa_q"]).reshape(s, 1, spec.num_heads, spec.d_kv)
        xattn = _attention(qx, ck.transpose(0, 2, 1, 3),
                           cv.transpose(0, 2, 1, 3), None, cross_mask)
        x = x + jnp.dot(xattn.reshape(s, spec.inner_dim), lp["xa_o"])

        h = _t5_norm(lp["ln2"], x, spec.norm_eps)
        x = x + _mlp(spec, lp, h)
        return x, (k, v)

    x, (k_all, v_all) = jax.lax.scan(
        layer, x,
        (params["decoder_layers"], state.self_k, state.self_v,
         state.cross_k, state.cross_v, kbuf, vbuf))
    x = _t5_norm(params["dec_final_norm"], x, spec.norm_eps)
    logits = _unembed(spec, params, x)
    return logits, k_all, v_all


def ring_flush_self_kv(state: T5DecodeState, kbuf: jax.Array,
                       vbuf: jax.Array, chunk_start: jax.Array
                       ) -> T5DecodeState:
    """Scatter a chunk's decoder self-KV ring into the slabs: col c of slot
    s lands at position chunk_start[s] + c (OOB dropped). Slot rows are
    private, so no active-masking is needed (cf. paged_ring_flush)."""
    n_buf = kbuf.shape[3]
    s = kbuf.shape[1]
    t_dec = state.self_k.shape[3]
    rows = jnp.arange(s)
    wpos = chunk_start[None, :] + jnp.arange(n_buf, dtype=jnp.int32)[:, None]
    wpos = jnp.where(wpos < t_dec, wpos, t_dec)                  # drop OOB
    idx_rows = jnp.broadcast_to(rows[None, :], (n_buf, s))
    # slabs [L, S, H, T, D]; advanced (C, S) at axes 1, 3 -> front:
    # update region [C, S, L, H, D]
    new_k = state.self_k.at[:, idx_rows, :, wpos, :].set(
        kbuf.transpose(3, 1, 0, 2, 4).astype(state.self_k.dtype), mode="drop")
    new_v = state.self_v.at[:, idx_rows, :, wpos, :].set(
        vbuf.transpose(3, 1, 0, 2, 4).astype(state.self_v.dtype), mode="drop")
    return state._replace(self_k=new_k, self_v=new_v)


def _unembed(spec: T5Spec, params: dict, x: jax.Array) -> jax.Array:
    if spec.tie_word_embeddings:
        x = x * (spec.d_model ** -0.5)
        w = params["shared_embed"].T
    else:
        w = params["lm_head"]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------


def load_params(weights, spec: T5Spec, dtype) -> dict:
    """Map HF T5 checkpoint names to the stacked pytree."""

    def lin(name):
        return weights.get(name).T

    def enc_layer(i, kind, sub):
        return f"encoder.block.{i}.layer.{kind}.{sub}"

    def dec_layer(i, kind, sub):
        return f"decoder.block.{i}.layer.{kind}.{sub}"

    Le, Ld = spec.num_encoder_layers, spec.num_decoder_layers

    def stack(fn, n):
        return jnp.asarray(np.stack([fn(i) for i in range(n)]), dtype)

    enc_layers = {
        "ln1": {"scale": stack(lambda i: weights.get(enc_layer(i, 0, "layer_norm.weight")), Le)},
        "sa_q": stack(lambda i: lin(enc_layer(i, 0, "SelfAttention.q.weight")), Le),
        "sa_k": stack(lambda i: lin(enc_layer(i, 0, "SelfAttention.k.weight")), Le),
        "sa_v": stack(lambda i: lin(enc_layer(i, 0, "SelfAttention.v.weight")), Le),
        "sa_o": stack(lambda i: lin(enc_layer(i, 0, "SelfAttention.o.weight")), Le),
        "ln2": {"scale": stack(lambda i: weights.get(enc_layer(i, 1, "layer_norm.weight")), Le)},
        "wo": stack(lambda i: lin(enc_layer(i, 1, "DenseReluDense.wo.weight")), Le),
    }
    if spec.gated_act:
        enc_layers["wi0"] = stack(lambda i: lin(enc_layer(i, 1, "DenseReluDense.wi_0.weight")), Le)
        enc_layers["wi1"] = stack(lambda i: lin(enc_layer(i, 1, "DenseReluDense.wi_1.weight")), Le)
    else:
        enc_layers["wi0"] = stack(lambda i: lin(enc_layer(i, 1, "DenseReluDense.wi.weight")), Le)

    dec_layers = {
        "ln1": {"scale": stack(lambda i: weights.get(dec_layer(i, 0, "layer_norm.weight")), Ld)},
        "sa_q": stack(lambda i: lin(dec_layer(i, 0, "SelfAttention.q.weight")), Ld),
        "sa_k": stack(lambda i: lin(dec_layer(i, 0, "SelfAttention.k.weight")), Ld),
        "sa_v": stack(lambda i: lin(dec_layer(i, 0, "SelfAttention.v.weight")), Ld),
        "sa_o": stack(lambda i: lin(dec_layer(i, 0, "SelfAttention.o.weight")), Ld),
        "ln_x": {"scale": stack(lambda i: weights.get(dec_layer(i, 1, "layer_norm.weight")), Ld)},
        "xa_q": stack(lambda i: lin(dec_layer(i, 1, "EncDecAttention.q.weight")), Ld),
        "xa_k": stack(lambda i: lin(dec_layer(i, 1, "EncDecAttention.k.weight")), Ld),
        "xa_v": stack(lambda i: lin(dec_layer(i, 1, "EncDecAttention.v.weight")), Ld),
        "xa_o": stack(lambda i: lin(dec_layer(i, 1, "EncDecAttention.o.weight")), Ld),
        "ln2": {"scale": stack(lambda i: weights.get(dec_layer(i, 2, "layer_norm.weight")), Ld)},
        "wo": stack(lambda i: lin(dec_layer(i, 2, "DenseReluDense.wo.weight")), Ld),
    }
    if spec.gated_act:
        dec_layers["wi0"] = stack(lambda i: lin(dec_layer(i, 2, "DenseReluDense.wi_0.weight")), Ld)
        dec_layers["wi1"] = stack(lambda i: lin(dec_layer(i, 2, "DenseReluDense.wi_1.weight")), Ld)
    else:
        dec_layers["wi0"] = stack(lambda i: lin(dec_layer(i, 2, "DenseReluDense.wi.weight")), Ld)

    params = {
        "shared_embed": jnp.asarray(weights.get("shared.weight"), dtype),
        "enc_rel_bias": jnp.asarray(
            weights.get("encoder.block.0.layer.0.SelfAttention"
                        ".relative_attention_bias.weight"), jnp.float32),
        "dec_rel_bias": jnp.asarray(
            weights.get("decoder.block.0.layer.0.SelfAttention"
                        ".relative_attention_bias.weight"), jnp.float32),
        "encoder_layers": enc_layers,
        "decoder_layers": dec_layers,
        "enc_final_norm": {"scale": jnp.asarray(
            weights.get("encoder.final_layer_norm.weight"), dtype)},
        "dec_final_norm": {"scale": jnp.asarray(
            weights.get("decoder.final_layer_norm.weight"), dtype)},
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(weights.get("lm_head.weight").T, dtype)
    return params
