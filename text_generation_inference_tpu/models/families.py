"""HF model-family registry: config.json → DecoderSpec, checkpoint → params.

Replaces the reference's per-architecture custom_modeling modules and the
engine's model-class dispatch (reference:
server/.../inference_engine/tgis_native.py:60-114,
models/__init__.py:48-136). Each family contributes two small functions:
a spec builder and a tensor-name mapping; the compute graph itself is the
shared generic decoder in models/core.py.

Layout conventions: our linear weights are [in, out] (activations are row
vectors, `x @ W`), HF torch Linear stores [out, in] (transposed on load);
HF GPT-2 Conv1D already stores [in, out].
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .core import DecoderSpec
from ..utils.weights import Weights


def load_hf_config(model_dir: str) -> dict:
    return json.loads((Path(model_dir) / "config.json").read_text())


# ---------------------------------------------------------------------------
# spec builders
# ---------------------------------------------------------------------------


def _llama_spec(c: dict) -> DecoderSpec:
    heads = c["num_attention_heads"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=c.get("num_key_value_heads") or heads,
        head_dim=c.get("head_dim") or c["hidden_size"] // heads,
        intermediate_size=c["intermediate_size"],
        pos="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        rope_scaling=(c.get("rope_scaling") or {}).get("factor", 1.0),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm="rmsnorm",
        norm_eps=c.get("rms_norm_eps", 1e-6),
        activation="silu_glu",
        tie_word_embeddings=c.get("tie_word_embeddings", False),
    )


def _gpt2_spec(c: dict) -> DecoderSpec:
    d = c["n_embd"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["n_layer"],
        num_heads=c["n_head"],
        num_kv_heads=c["n_head"],
        head_dim=d // c["n_head"],
        intermediate_size=c.get("n_inner") or 4 * d,
        pos="learned",
        max_position_embeddings=c["n_positions"],
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        activation="gelu_tanh",
        qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


def _bloom_spec(c: dict) -> DecoderSpec:
    d = c.get("hidden_size") or c["n_embed"]
    h = c.get("n_head") or c["num_attention_heads"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c.get("n_layer") or c["num_hidden_layers"],
        num_heads=h,
        num_kv_heads=h,
        head_dim=d // h,
        intermediate_size=4 * d,
        pos="alibi",
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        embed_norm=True,
        activation="gelu_tanh",
        qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


def _neox_spec(c: dict) -> DecoderSpec:
    d = c["hidden_size"]
    h = c["num_attention_heads"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["num_hidden_layers"],
        num_heads=h,
        num_kv_heads=h,
        head_dim=d // h,
        intermediate_size=c["intermediate_size"],
        pos="rope",
        rope_theta=c.get("rotary_emb_base", 10000.0),
        rotary_pct=c.get("rotary_pct", 1.0),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        activation="gelu_tanh" if c.get("hidden_act", "gelu") in ("gelu_new", "gelu_fast") else "gelu",
        parallel_residual=c.get("use_parallel_residual", True),
        qkv_bias=c.get("attention_bias", True),
        attn_out_bias=c.get("attention_bias", True),
        mlp_bias=True,
        tie_word_embeddings=False,
    )


def _falcon_spec(c: dict) -> DecoderSpec:
    d = c["hidden_size"]
    h = c["num_attention_heads"]
    if c.get("new_decoder_architecture"):
        kv = c.get("num_kv_heads", 8)
    elif c.get("multi_query", True):
        kv = 1
    else:
        kv = h
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["num_hidden_layers"],
        num_heads=h,
        num_kv_heads=kv,
        head_dim=d // h,
        intermediate_size=4 * d,
        pos="alibi" if c.get("alibi") else "rope",
        rope_theta=c.get("rope_theta", 10000.0),
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        activation="gelu",
        parallel_residual=c.get("parallel_attn", True),
        qkv_bias=c.get("bias", False),
        attn_out_bias=c.get("bias", False),
        mlp_bias=c.get("bias", False),
        tie_word_embeddings=True,
    )


def _gptj_spec(c: dict) -> DecoderSpec:
    d = c["n_embd"]
    h = c["n_head"]
    dh = d // h
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["n_layer"],
        num_heads=h,
        num_kv_heads=h,
        head_dim=dh,
        intermediate_size=c.get("n_inner") or 4 * d,
        pos="rope",
        rotary_pct=(c.get("rotary_dim") or dh) / dh,
        rope_interleaved=True,
        max_position_embeddings=c["n_positions"],
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        activation="gelu_tanh",
        parallel_residual=True,      # single shared ln_1 (duplicated at load)
        mlp_bias=True,
        attn_out_bias=False,
        tie_word_embeddings=False,
    )


def _codegen_spec(c: dict) -> DecoderSpec:
    # CodeGen is GPT-J with a fused, mp_num-interleaved qkv projection
    s = _gptj_spec(c)
    return dataclasses.replace(s, rotary_pct=(c.get("rotary_dim") or s.head_dim) / s.head_dim)


def _opt_spec(c: dict) -> DecoderSpec:
    if not c.get("do_layer_norm_before", True):
        raise ValueError(
            "OPT with do_layer_norm_before=False (opt-350m style post-norm) "
            "is not supported")
    d = c["hidden_size"]
    h = c["num_attention_heads"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["num_hidden_layers"],
        num_heads=h,
        num_kv_heads=h,
        head_dim=d // h,
        intermediate_size=c["ffn_dim"],
        pos="learned",
        pos_offset=2,                # OPTLearnedPositionalEmbedding offset
        max_position_embeddings=c["max_position_embeddings"],
        norm="layernorm",
        activation="relu" if c.get("activation_function", "relu") == "relu" else "gelu",
        qkv_bias=c.get("enable_bias", True),
        attn_out_bias=c.get("enable_bias", True),
        mlp_bias=c.get("enable_bias", True),
        tie_word_embeddings=c.get("tie_word_embeddings", True),
    )


def _mpt_spec(c: dict) -> DecoderSpec:
    d = c["d_model"]
    h = c["n_heads"]
    attn = c.get("attn_config") or {}
    if attn.get("softmax_scale") is not None:
        raise ValueError("MPT custom softmax_scale is not supported")
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["n_layers"],
        num_heads=h,
        num_kv_heads=h,
        head_dim=d // h,
        intermediate_size=c.get("expansion_ratio", 4) * d,
        pos="alibi" if attn.get("alibi", True) else "learned",
        alibi_impl="mpt",
        max_position_embeddings=c.get("max_seq_len", 2048),
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        activation="gelu",           # HF MptMLP: nn.GELU(approximate="none")
        qkv_clip=attn.get("clip_qkv"),
        qkv_bias=not c.get("no_bias", True),
        attn_out_bias=not c.get("no_bias", True),
        mlp_bias=False,              # HF MptMLP is always bias-free
        tie_word_embeddings=True,
    )


def _phi_spec(c: dict) -> DecoderSpec:
    if c.get("qk_layernorm"):
        raise ValueError("phi qk_layernorm is not supported")
    d = c["hidden_size"]
    h = c["num_attention_heads"]
    dh = d // h
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["num_hidden_layers"],
        num_heads=h,
        num_kv_heads=c.get("num_key_value_heads") or h,
        head_dim=dh,
        intermediate_size=c["intermediate_size"],
        pos="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        rotary_pct=c.get("partial_rotary_factor", 0.5),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        activation="gelu_tanh" if c.get("hidden_act", "gelu_new") in ("gelu_new", "gelu_fast", "gelu_pytorch_tanh") else "gelu",
        parallel_residual=True,      # shared input_layernorm (duplicated at load)
        qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=False,
    )


def _mistral_spec(c: dict) -> DecoderSpec:
    s = _llama_spec(c)
    return dataclasses.replace(
        s,
        sliding_window=c.get("sliding_window"),
        norm_eps=c.get("rms_norm_eps", 1e-6),
    )


def _qwen2_spec(c: dict) -> DecoderSpec:
    s = _llama_spec(c)
    return dataclasses.replace(
        s,
        qkv_bias=True,               # Qwen2Attention: q/k/v have bias, o does not
        sliding_window=(c.get("sliding_window")
                        if c.get("use_sliding_window") else None),
    )


def _gemma_spec(c: dict) -> DecoderSpec:
    d = c["hidden_size"]
    heads = c["num_attention_heads"]
    act = c.get("hidden_activation") or c.get("hidden_act") or "gelu_pytorch_tanh"
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=c.get("num_key_value_heads") or heads,
        head_dim=c.get("head_dim") or d // heads,
        intermediate_size=c["intermediate_size"],
        pos="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        max_position_embeddings=c.get("max_position_embeddings", 8192),
        norm="rmsnorm",
        norm_eps=c.get("rms_norm_eps", 1e-6),
        activation=("gelu_tanh_glu"
                    if act in ("gelu_pytorch_tanh", "gelu_new", "gelu_fast")
                    else "gelu_glu"),
        embed_scale=d ** 0.5,
        tie_word_embeddings=True,
    )


def _bigcode_spec(c: dict) -> DecoderSpec:
    d = c["n_embd"]
    h = c["n_head"]
    return DecoderSpec(
        vocab_size=c["vocab_size"],
        hidden_size=d,
        num_layers=c["n_layer"],
        num_heads=h,
        num_kv_heads=1 if c.get("multi_query", True) else h,
        head_dim=d // h,
        intermediate_size=c.get("n_inner") or 4 * d,
        pos="learned",
        max_position_embeddings=c["n_positions"],
        norm="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        activation="gelu_tanh",
        qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


# ---------------------------------------------------------------------------
# checkpoint loaders
# ---------------------------------------------------------------------------


def _stack(arrs: list[np.ndarray], dtype) -> jnp.ndarray:
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def _stack_linear(w: Weights, fmt: str, n_layers: int, dtype):
    """Stack one linear across layers: dense `.weight` (transposed to
    [in, out]) or GPTQ `qweight/qzeros/scales/g_idx` → stacked Int4Weight.

    GPTQ tensor layout note: HF/AutoGPTQ checkpoints store qweight as
    [in/8, out] and scales as [groups, out] already in x@W orientation —
    no transpose needed (reference consumes the same format,
    utils/gptq/quant_linear.py:249-268).
    """
    first = fmt.format(i=0)
    if w.has(first + ".qweight"):
        from ..ops.quant.int4 import normalize_act_order

        per_layer = [
            normalize_act_order(
                w.get(fmt.format(i=i) + ".qweight"),
                w.get(fmt.format(i=i) + ".qzeros"),
                w.get(fmt.format(i=i) + ".scales").astype(np.float32),
                w.get(fmt.format(i=i) + ".g_idx"),
            )
            for i in range(n_layers)
        ]
        from ..ops.quant.int4 import Int4Weight

        perms = [p.perm for p in per_layer]
        has_perm = any(p is not None for p in perms)
        if has_perm:
            perm_stack = jnp.stack([
                p.perm if p.perm is not None
                else jnp.arange(p.in_features, dtype=jnp.int32)
                for p in per_layer])
        else:
            perm_stack = None
        return Int4Weight(
            qweight=jnp.stack([p.qweight for p in per_layer]),
            qzeros=jnp.stack([p.qzeros for p in per_layer]),
            scales=jnp.stack([p.scales for p in per_layer]),
            g_idx=jnp.stack([p.g_idx for p in per_layer]),
            perm=perm_stack,
            zbias=jnp.stack([p.zbias for p in per_layer]),
        )
    return _stack([w.get(fmt.format(i=i) + ".weight").T
                   for i in range(n_layers)], dtype)


def _norm_stack(w: Weights, fmt: str, n_layers: int, dtype, bias: bool,
                offset: float = 0.0) -> dict:
    """`offset` is added to the stored weight (gemma rmsnorm computes
    x * (1 + weight); folding the +1 at load keeps core._norm generic)."""
    p = {"scale": _stack([w.get(fmt.format(i=i) + ".weight") + offset
                          for i in range(n_layers)], dtype)}
    if bias:
        p["bias"] = _stack([w.get(fmt.format(i=i) + ".bias") for i in range(n_layers)], dtype)
    return p


def _load_llama(w: Weights, s: DecoderSpec, dtype,
                norm_offset: float = 0.0) -> dict:
    """Llama tensor-name map; also loads mistral/qwen2 (identical names —
    qwen2 adds q/k/v biases, keyed off spec.qkv_bias) and, with
    norm_offset=1, gemma."""
    L = s.num_layers
    pre = "model.layers.{i}"
    layers = {
        "ln1": _norm_stack(w, pre + ".input_layernorm", L, dtype, False,
                           offset=norm_offset),
        "ln2": _norm_stack(w, pre + ".post_attention_layernorm", L, dtype,
                           False, offset=norm_offset),
        "wq": _stack_linear(w, pre + ".self_attn.q_proj", L, dtype),
        "wk": _stack_linear(w, pre + ".self_attn.k_proj", L, dtype),
        "wv": _stack_linear(w, pre + ".self_attn.v_proj", L, dtype),
        "wo": _stack_linear(w, pre + ".self_attn.o_proj", L, dtype),
        "w_gate": _stack_linear(w, pre + ".mlp.gate_proj", L, dtype),
        "w_up": _stack_linear(w, pre + ".mlp.up_proj", L, dtype),
        "w_down": _stack_linear(w, pre + ".mlp.down_proj", L, dtype),
    }
    if s.qkv_bias:
        for name, key in (("q_proj", "bq"), ("k_proj", "bk"), ("v_proj", "bv")):
            layers[key] = _stack(
                [w.get(f"model.layers.{i}.self_attn.{name}.bias")
                 for i in range(L)], dtype)
    params = {
        "embed_tokens": jnp.asarray(w.get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": {"scale": jnp.asarray(
            w.get("model.norm.weight") + norm_offset, dtype)},
    }
    if not s.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(w.get("lm_head.weight").T, dtype)
    return params


def _load_gemma(w: Weights, s: DecoderSpec, dtype) -> dict:
    return _load_llama(w, s, dtype, norm_offset=1.0)


def _load_gptj(w: Weights, s: DecoderSpec, dtype) -> dict:
    L = s.num_layers
    pre = "transformer.h.{i}"
    ln1 = _norm_stack(w, pre + ".ln_1", L, dtype, True)
    layers = {
        "ln1": ln1,
        # GPT-J's parallel block shares one layernorm between attn and mlp
        "ln2": {k_: v_.copy() for k_, v_ in ln1.items()},
        "wq": _stack_linear(w, pre + ".attn.q_proj", L, dtype),
        "wk": _stack_linear(w, pre + ".attn.k_proj", L, dtype),
        "wv": _stack_linear(w, pre + ".attn.v_proj", L, dtype),
        "wo": _stack_linear(w, pre + ".attn.out_proj", L, dtype),
        "w_up": _stack_linear(w, pre + ".mlp.fc_in", L, dtype),
        "b_up": _stack([w.get(f"transformer.h.{i}.mlp.fc_in.bias")
                        for i in range(L)], dtype),
        "w_down": _stack_linear(w, pre + ".mlp.fc_out", L, dtype),
        "b_down": _stack([w.get(f"transformer.h.{i}.mlp.fc_out.bias")
                          for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("transformer.wte.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("transformer.ln_f.weight"), dtype),
            "bias": jnp.asarray(w.get("transformer.ln_f.bias"), dtype),
        },
        "lm_head": jnp.asarray(w.get("lm_head.weight").T, dtype),
        "lm_head_bias": jnp.asarray(w.get("lm_head.bias"), dtype),
    }


def _load_codegen(w: Weights, s: DecoderSpec, dtype) -> dict:
    """CodeGen = GPT-J with a fused qkv_proj whose out axis is mp_num=4
    blocks of [q_local | v_local | k_local] (HF CodeGenAttention mp_num
    sharding; heads are block-major so concatenating blocks restores
    natural head order)."""
    L, D = s.num_layers, s.hidden_size
    mp_num = 4
    local = D // mp_num
    qs, ks, vs = [], [], []
    for i in range(L):
        qkv = w.get(f"transformer.h.{i}.attn.qkv_proj.weight")  # [3D, D_in]
        blocks = qkv.reshape(mp_num, 3 * local, -1)
        qs.append(np.concatenate([blocks[m, :local] for m in range(mp_num)], 0).T)
        vs.append(np.concatenate([blocks[m, local:2 * local] for m in range(mp_num)], 0).T)
        ks.append(np.concatenate([blocks[m, 2 * local:] for m in range(mp_num)], 0).T)
    pre = "transformer.h.{i}"
    ln1 = _norm_stack(w, pre + ".ln_1", L, dtype, True)
    layers = {
        "ln1": ln1,
        "ln2": {k_: v_.copy() for k_, v_ in ln1.items()},
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "wo": _stack_linear(w, pre + ".attn.out_proj", L, dtype),
        "w_up": _stack_linear(w, pre + ".mlp.fc_in", L, dtype),
        "b_up": _stack([w.get(f"transformer.h.{i}.mlp.fc_in.bias")
                        for i in range(L)], dtype),
        "w_down": _stack_linear(w, pre + ".mlp.fc_out", L, dtype),
        "b_down": _stack([w.get(f"transformer.h.{i}.mlp.fc_out.bias")
                          for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("transformer.wte.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("transformer.ln_f.weight"), dtype),
            "bias": jnp.asarray(w.get("transformer.ln_f.bias"), dtype),
        },
        "lm_head": jnp.asarray(w.get("lm_head.weight").T, dtype),
        "lm_head_bias": jnp.asarray(w.get("lm_head.bias"), dtype),
    }


def _load_opt(w: Weights, s: DecoderSpec, dtype) -> dict:
    L = s.num_layers
    pre = "model.decoder.layers.{i}"
    layers = {
        "ln1": _norm_stack(w, pre + ".self_attn_layer_norm", L, dtype, True),
        "ln2": _norm_stack(w, pre + ".final_layer_norm", L, dtype, True),
        "wq": _stack_linear(w, pre + ".self_attn.q_proj", L, dtype),
        "wk": _stack_linear(w, pre + ".self_attn.k_proj", L, dtype),
        "wv": _stack_linear(w, pre + ".self_attn.v_proj", L, dtype),
        "wo": _stack_linear(w, pre + ".self_attn.out_proj", L, dtype),
        "w_up": _stack_linear(w, pre + ".fc1", L, dtype),
        "w_down": _stack_linear(w, pre + ".fc2", L, dtype),
    }
    if s.qkv_bias:
        for name, key in (("q_proj", "bq"), ("k_proj", "bk"), ("v_proj", "bv")):
            layers[key] = _stack(
                [w.get(f"model.decoder.layers.{i}.self_attn.{name}.bias")
                 for i in range(L)], dtype)
    if s.attn_out_bias:
        layers["bo"] = _stack(
            [w.get(f"model.decoder.layers.{i}.self_attn.out_proj.bias")
             for i in range(L)], dtype)
    if s.mlp_bias:
        layers["b_up"] = _stack(
            [w.get(f"model.decoder.layers.{i}.fc1.bias") for i in range(L)], dtype)
        layers["b_down"] = _stack(
            [w.get(f"model.decoder.layers.{i}.fc2.bias") for i in range(L)], dtype)
    params = {
        "embed_tokens": jnp.asarray(
            w.get("model.decoder.embed_tokens.weight"), dtype),
        "embed_positions": jnp.asarray(
            w.get("model.decoder.embed_positions.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(
                w.get("model.decoder.final_layer_norm.weight"), dtype),
            "bias": jnp.asarray(
                w.get("model.decoder.final_layer_norm.bias"), dtype),
        },
    }
    if w.has("model.decoder.project_in.weight"):
        params["project_in"] = jnp.asarray(
            w.get("model.decoder.project_in.weight").T, dtype)
        params["project_out"] = jnp.asarray(
            w.get("model.decoder.project_out.weight").T, dtype)
    if not s.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(w.get("lm_head.weight").T, dtype)
    return params


def _load_mpt(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, D = s.num_layers, s.hidden_size
    pre = "transformer.blocks.{i}"
    has_ln_bias = w.has("transformer.blocks.0.norm_1.bias")
    qs, ks, vs = [], [], []
    bqs, bks, bvs = [], [], []
    for i in range(L):
        qkv = w.get(f"transformer.blocks.{i}.attn.Wqkv.weight")  # [3D, D]
        qs.append(qkv[:D].T); ks.append(qkv[D:2 * D].T); vs.append(qkv[2 * D:].T)
        if s.qkv_bias:
            b = w.get(f"transformer.blocks.{i}.attn.Wqkv.bias")
            bqs.append(b[:D]); bks.append(b[D:2 * D]); bvs.append(b[2 * D:])
    layers = {
        "ln1": _norm_stack(w, pre + ".norm_1", L, dtype, has_ln_bias),
        "ln2": _norm_stack(w, pre + ".norm_2", L, dtype, has_ln_bias),
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "wo": _stack_linear(w, pre + ".attn.out_proj", L, dtype),
        "w_up": _stack_linear(w, pre + ".ffn.up_proj", L, dtype),
        "w_down": _stack_linear(w, pre + ".ffn.down_proj", L, dtype),
    }
    if s.qkv_bias:
        layers["bq"] = _stack(bqs, dtype)
        layers["bk"] = _stack(bks, dtype)
        layers["bv"] = _stack(bvs, dtype)
    if s.attn_out_bias:
        layers["bo"] = _stack(
            [w.get(f"transformer.blocks.{i}.attn.out_proj.bias")
             for i in range(L)], dtype)
    if s.mlp_bias:
        layers["b_up"] = _stack(
            [w.get(f"transformer.blocks.{i}.ffn.up_proj.bias")
             for i in range(L)], dtype)
        layers["b_down"] = _stack(
            [w.get(f"transformer.blocks.{i}.ffn.down_proj.bias")
             for i in range(L)], dtype)
    final_norm = {"scale": jnp.asarray(w.get("transformer.norm_f.weight"), dtype)}
    if w.has("transformer.norm_f.bias"):
        final_norm["bias"] = jnp.asarray(w.get("transformer.norm_f.bias"), dtype)
    return {
        "embed_tokens": jnp.asarray(w.get("transformer.wte.weight"), dtype),
        "layers": layers,
        "final_norm": final_norm,
    }


def _load_phi(w: Weights, s: DecoderSpec, dtype) -> dict:
    L = s.num_layers
    pre = "model.layers.{i}"
    ln1 = _norm_stack(w, pre + ".input_layernorm", L, dtype, True)
    layers = {
        "ln1": ln1,
        # phi's parallel block shares input_layernorm between attn and mlp
        "ln2": {k_: v_.copy() for k_, v_ in ln1.items()},
        "wq": _stack_linear(w, pre + ".self_attn.q_proj", L, dtype),
        "wk": _stack_linear(w, pre + ".self_attn.k_proj", L, dtype),
        "wv": _stack_linear(w, pre + ".self_attn.v_proj", L, dtype),
        "wo": _stack_linear(w, pre + ".self_attn.dense", L, dtype),
        "bq": _stack([w.get(f"model.layers.{i}.self_attn.q_proj.bias")
                      for i in range(L)], dtype),
        "bk": _stack([w.get(f"model.layers.{i}.self_attn.k_proj.bias")
                      for i in range(L)], dtype),
        "bv": _stack([w.get(f"model.layers.{i}.self_attn.v_proj.bias")
                      for i in range(L)], dtype),
        "bo": _stack([w.get(f"model.layers.{i}.self_attn.dense.bias")
                      for i in range(L)], dtype),
        "w_up": _stack_linear(w, pre + ".mlp.fc1", L, dtype),
        "b_up": _stack([w.get(f"model.layers.{i}.mlp.fc1.bias")
                        for i in range(L)], dtype),
        "w_down": _stack_linear(w, pre + ".mlp.fc2", L, dtype),
        "b_down": _stack([w.get(f"model.layers.{i}.mlp.fc2.bias")
                          for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("model.final_layernorm.weight"), dtype),
            "bias": jnp.asarray(w.get("model.final_layernorm.bias"), dtype),
        },
        "lm_head": jnp.asarray(w.get("lm_head.weight").T, dtype),
        "lm_head_bias": jnp.asarray(w.get("lm_head.bias"), dtype),
    }


def _split_fused_headmajor(qkv: np.ndarray, h: int, dh: int) -> tuple[np.ndarray, ...]:
    """BLOOM/NeoX fused qkv layout: [(h, 3, dh), d_in] rows (reference:
    bloom_modeling's per-head interleaving). Returns q/k/v as [d_in, h*dh]."""
    d_in = qkv.shape[-1]
    grouped = qkv.reshape(h, 3, dh, d_in)
    return tuple(grouped[:, j].reshape(h * dh, d_in).T for j in range(3))


def _split_fused_bias_headmajor(b: np.ndarray, h: int, dh: int) -> tuple[np.ndarray, ...]:
    grouped = b.reshape(h, 3, dh)
    return tuple(grouped[:, j].reshape(h * dh) for j in range(3))


def _load_bloom(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, H, Dh = s.num_layers, s.num_heads, s.head_dim
    pre = "transformer.h.{i}"
    qs, ks, vs, bqs, bks, bvs = [], [], [], [], [], []
    for i in range(L):
        q, k, v = _split_fused_headmajor(
            w.get(f"transformer.h.{i}.self_attention.query_key_value.weight"), H, Dh)
        bq, bk, bv = _split_fused_bias_headmajor(
            w.get(f"transformer.h.{i}.self_attention.query_key_value.bias"), H, Dh)
        qs.append(q); ks.append(k); vs.append(v)
        bqs.append(bq); bks.append(bk); bvs.append(bv)
    layers = {
        "ln1": _norm_stack(w, pre + ".input_layernorm", L, dtype, True),
        "ln2": _norm_stack(w, pre + ".post_attention_layernorm", L, dtype, True),
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "bq": _stack(bqs, dtype), "bk": _stack(bks, dtype), "bv": _stack(bvs, dtype),
        "wo": _stack([w.get(f"transformer.h.{i}.self_attention.dense.weight").T for i in range(L)], dtype),
        "bo": _stack([w.get(f"transformer.h.{i}.self_attention.dense.bias") for i in range(L)], dtype),
        "w_up": _stack([w.get(f"transformer.h.{i}.mlp.dense_h_to_4h.weight").T for i in range(L)], dtype),
        "b_up": _stack([w.get(f"transformer.h.{i}.mlp.dense_h_to_4h.bias") for i in range(L)], dtype),
        "w_down": _stack([w.get(f"transformer.h.{i}.mlp.dense_4h_to_h.weight").T for i in range(L)], dtype),
        "b_down": _stack([w.get(f"transformer.h.{i}.mlp.dense_4h_to_h.bias") for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("transformer.word_embeddings.weight"), dtype),
        "embed_ln": {
            "scale": jnp.asarray(w.get("transformer.word_embeddings_layernorm.weight"), dtype),
            "bias": jnp.asarray(w.get("transformer.word_embeddings_layernorm.bias"), dtype),
        },
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("transformer.ln_f.weight"), dtype),
            "bias": jnp.asarray(w.get("transformer.ln_f.bias"), dtype),
        },
    }


def _load_neox(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, H, Dh = s.num_layers, s.num_heads, s.head_dim
    pre = "gpt_neox.layers.{i}"
    qs, ks, vs, bqs, bks, bvs = [], [], [], [], [], []
    for i in range(L):
        q, k, v = _split_fused_headmajor(
            w.get(f"gpt_neox.layers.{i}.attention.query_key_value.weight"), H, Dh)
        bq, bk, bv = _split_fused_bias_headmajor(
            w.get(f"gpt_neox.layers.{i}.attention.query_key_value.bias"), H, Dh)
        qs.append(q); ks.append(k); vs.append(v)
        bqs.append(bq); bks.append(bk); bvs.append(bv)
    layers = {
        "ln1": _norm_stack(w, pre + ".input_layernorm", L, dtype, True),
        "ln2": _norm_stack(w, pre + ".post_attention_layernorm", L, dtype, True),
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "bq": _stack(bqs, dtype), "bk": _stack(bks, dtype), "bv": _stack(bvs, dtype),
        "wo": _stack([w.get(f"gpt_neox.layers.{i}.attention.dense.weight").T for i in range(L)], dtype),
        "bo": _stack([w.get(f"gpt_neox.layers.{i}.attention.dense.bias") for i in range(L)], dtype),
        "w_up": _stack([w.get(f"gpt_neox.layers.{i}.mlp.dense_h_to_4h.weight").T for i in range(L)], dtype),
        "b_up": _stack([w.get(f"gpt_neox.layers.{i}.mlp.dense_h_to_4h.bias") for i in range(L)], dtype),
        "w_down": _stack([w.get(f"gpt_neox.layers.{i}.mlp.dense_4h_to_h.weight").T for i in range(L)], dtype),
        "b_down": _stack([w.get(f"gpt_neox.layers.{i}.mlp.dense_4h_to_h.bias") for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("gpt_neox.embed_in.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("gpt_neox.final_layer_norm.weight"), dtype),
            "bias": jnp.asarray(w.get("gpt_neox.final_layer_norm.bias"), dtype),
        },
        "lm_head": jnp.asarray(w.get("embed_out.weight").T, dtype),
    }


def _load_gpt2(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, D = s.num_layers, s.hidden_size
    pre = "h.{i}"
    prefix = "" if w.has("wte.weight") else "transformer."

    def g(name):
        return w.get(prefix + name)

    qs, ks, vs, bqs, bks, bvs = [], [], [], [], [], []
    for i in range(L):
        # Conv1D: [in, out]; q/k/v are contiguous blocks of the out axis
        qkv = g(f"h.{i}.attn.c_attn.weight")
        b = g(f"h.{i}.attn.c_attn.bias")
        qs.append(qkv[:, :D]); ks.append(qkv[:, D:2 * D]); vs.append(qkv[:, 2 * D:])
        bqs.append(b[:D]); bks.append(b[D:2 * D]); bvs.append(b[2 * D:])
    layers = {
        "ln1": {
            "scale": _stack([g(f"h.{i}.ln_1.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"h.{i}.ln_1.bias") for i in range(L)], dtype),
        },
        "ln2": {
            "scale": _stack([g(f"h.{i}.ln_2.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"h.{i}.ln_2.bias") for i in range(L)], dtype),
        },
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "bq": _stack(bqs, dtype), "bk": _stack(bks, dtype), "bv": _stack(bvs, dtype),
        "wo": _stack([g(f"h.{i}.attn.c_proj.weight") for i in range(L)], dtype),
        "bo": _stack([g(f"h.{i}.attn.c_proj.bias") for i in range(L)], dtype),
        "w_up": _stack([g(f"h.{i}.mlp.c_fc.weight") for i in range(L)], dtype),
        "b_up": _stack([g(f"h.{i}.mlp.c_fc.bias") for i in range(L)], dtype),
        "w_down": _stack([g(f"h.{i}.mlp.c_proj.weight") for i in range(L)], dtype),
        "b_down": _stack([g(f"h.{i}.mlp.c_proj.bias") for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(g("wte.weight"), dtype),
        "embed_positions": jnp.asarray(g("wpe.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(g("ln_f.weight"), dtype),
            "bias": jnp.asarray(g("ln_f.bias"), dtype),
        },
    }


def _load_bigcode(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, D, Dh, K = s.num_layers, s.hidden_size, s.head_dim, s.num_kv_heads
    kv = K * Dh
    prefix = "" if w.has("wte.weight") else "transformer."

    def g(name):
        return w.get(prefix + name)

    qs, ks, vs, bqs, bks, bvs = [], [], [], [], [], []
    for i in range(L):
        # nn.Linear [out, in]: rows are [q (D) | k (kv) | v (kv)]
        qkv = g(f"h.{i}.attn.c_attn.weight")
        b = g(f"h.{i}.attn.c_attn.bias")
        qs.append(qkv[:D].T); ks.append(qkv[D:D + kv].T); vs.append(qkv[D + kv:].T)
        bqs.append(b[:D]); bks.append(b[D:D + kv]); bvs.append(b[D + kv:])
    layers = {
        "ln1": {
            "scale": _stack([g(f"h.{i}.ln_1.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"h.{i}.ln_1.bias") for i in range(L)], dtype),
        },
        "ln2": {
            "scale": _stack([g(f"h.{i}.ln_2.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"h.{i}.ln_2.bias") for i in range(L)], dtype),
        },
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "bq": _stack(bqs, dtype), "bk": _stack(bks, dtype), "bv": _stack(bvs, dtype),
        "wo": _stack([g(f"h.{i}.attn.c_proj.weight").T for i in range(L)], dtype),
        "bo": _stack([g(f"h.{i}.attn.c_proj.bias") for i in range(L)], dtype),
        "w_up": _stack([g(f"h.{i}.mlp.c_fc.weight").T for i in range(L)], dtype),
        "b_up": _stack([g(f"h.{i}.mlp.c_fc.bias") for i in range(L)], dtype),
        "w_down": _stack([g(f"h.{i}.mlp.c_proj.weight").T for i in range(L)], dtype),
        "b_down": _stack([g(f"h.{i}.mlp.c_proj.bias") for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(g("wte.weight"), dtype),
        "embed_positions": jnp.asarray(g("wpe.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(g("ln_f.weight"), dtype),
            "bias": jnp.asarray(g("ln_f.bias"), dtype),
        },
    }


def _load_falcon(w: Weights, s: DecoderSpec, dtype) -> dict:
    L, H, K, Dh = s.num_layers, s.num_heads, s.num_kv_heads, s.head_dim
    qs, ks, vs = [], [], []
    for i in range(L):
        qkv = w.get(f"transformer.h.{i}.self_attention.query_key_value.weight")
        d_in = qkv.shape[-1]
        if K == 1:
            # multi_query: rows are [q (H*Dh) | k (Dh) | v (Dh)]
            qs.append(qkv[: H * Dh].T)
            ks.append(qkv[H * Dh: (H + 1) * Dh].T)
            vs.append(qkv[(H + 1) * Dh:].T)
        elif K == H:
            q, k, v = _split_fused_headmajor(qkv, H, Dh)
            qs.append(q); ks.append(k); vs.append(v)
        else:
            # new_decoder_architecture: [K groups of (H/K q heads + 1 k + 1 v)]
            grouped = qkv.reshape(K, H // K + 2, Dh, d_in)
            qs.append(grouped[:, :-2].reshape(H * Dh, d_in).T)
            ks.append(grouped[:, -2].reshape(K * Dh, d_in).T)
            vs.append(grouped[:, -1].reshape(K * Dh, d_in).T)
    # falcon's parallel_attn shares one layernorm between attn and mlp
    ln1 = _norm_stack(w, "transformer.h.{i}.input_layernorm", L, dtype, True)
    layers = {
        "ln1": ln1,
        "ln2": {k_: v_.copy() for k_, v_ in ln1.items()},
        "wq": _stack(qs, dtype), "wk": _stack(ks, dtype), "wv": _stack(vs, dtype),
        "wo": _stack([w.get(f"transformer.h.{i}.self_attention.dense.weight").T for i in range(L)], dtype),
        "w_up": _stack([w.get(f"transformer.h.{i}.mlp.dense_h_to_4h.weight").T for i in range(L)], dtype),
        "w_down": _stack([w.get(f"transformer.h.{i}.mlp.dense_4h_to_h.weight").T for i in range(L)], dtype),
    }
    return {
        "embed_tokens": jnp.asarray(w.get("transformer.word_embeddings.weight"), dtype),
        "layers": layers,
        "final_norm": {
            "scale": jnp.asarray(w.get("transformer.ln_f.weight"), dtype),
            "bias": jnp.asarray(w.get("transformer.ln_f.bias"), dtype),
        },
    }


FAMILIES: dict[str, tuple[Callable[[dict], DecoderSpec], Callable]] = {
    "llama": (_llama_spec, _load_llama),
    "gpt2": (_gpt2_spec, _load_gpt2),
    "bloom": (_bloom_spec, _load_bloom),
    "gpt_neox": (_neox_spec, _load_neox),
    "falcon": (_falcon_spec, _load_falcon),
    "RefinedWeb": (_falcon_spec, _load_falcon),
    "RefinedWebModel": (_falcon_spec, _load_falcon),
    "gpt_bigcode": (_bigcode_spec, _load_bigcode),
    "gptj": (_gptj_spec, _load_gptj),
    "codegen": (_codegen_spec, _load_codegen),
    "opt": (_opt_spec, _load_opt),
    "mpt": (_mpt_spec, _load_mpt),
    "phi": (_phi_spec, _load_phi),
    "mistral": (_mistral_spec, _load_llama),
    "qwen2": (_qwen2_spec, _load_llama),
    "gemma": (_gemma_spec, _load_gemma),
}


# Default LLM.int8 calibration corpus: short natural-language + code
# snippets. The threshold-6.0 outlier statistics are defined over real-text
# activations (LLM.int8 paper; the reference gets this implicitly because
# bitsandbytes selects outliers on the live batch) — uniform random token
# ids activate the wrong feature dims. CALIBRATION_TEXT_PATH supplies a
# deployment-specific corpus (one prompt per line) instead.
_CALIBRATION_TEXTS = [
    "The quick brown fox jumps over the lazy dog. Machine learning systems "
    "transform natural language into dense vector representations, and the "
    "resulting activations exhibit systematic outlier feature dimensions.",
    "def tokenize(text):\n    return [vocab[t] for t in text.split()]\n\n"
    "class Server:\n    def __init__(self, port=8033):\n        self.port "
    "= port",
    "In 1969, the Apollo 11 mission landed the first humans on the Moon; "
    "the guidance computer had 2048 words of RAM and ran at 0.043 MHz.",
    "Les mots étrangers, die Umlaute, and 漢字 exercise the multilingual "
    "token space; punctuation — em-dashes, ellipses… and “smart quotes” — "
    "exercises the byte fallback.",
]


def _calibration_token_ids(model_dir: str, spec: DecoderSpec,
                           calib_t: int) -> "np.ndarray":
    """Tokenizer-encoded calibration prompts for the LLM.int8 outlier
    statistics; falls back to uniform random ids only when no tokenizer is
    available (e.g. bare-tensor test fixtures)."""
    import logging

    logger = logging.getLogger(__name__)
    texts = None
    path = __import__("os").getenv("CALIBRATION_TEXT_PATH")
    if path:
        texts = [ln for ln in Path(path).read_text().splitlines()
                 if ln.strip()]
    try:
        from ..utils.tokenization import ServingTokenizer

        tok = ServingTokenizer.load(model_dir)
        rows = []
        for text in texts or _CALIBRATION_TEXTS:
            ids = [i for i in tok.encode(text, add_special_tokens=True)
                   if i < spec.vocab_size]
            if ids:
                rows.append(ids[:calib_t])
        if rows:
            t = max(len(r) for r in rows)
            out = np.zeros((len(rows), t), np.int64)
            for i, r in enumerate(rows):
                out[i, : len(r)] = r
                out[i, len(r):] = r[-1]   # repeat-pad: stats stay on-text
            logger.info("int8-outlier calibration: %d tokenized prompts "
                        "(%s)", len(rows),
                        "CALIBRATION_TEXT_PATH" if texts else "built-in")
            return out
    except Exception:
        logger.warning(
            "int8-outlier calibration: tokenizer unavailable for %s; "
            "falling back to random token ids (outlier selection may be "
            "inaccurate — provide tokenizer files or CALIBRATION_TEXT_PATH)",
            model_dir, exc_info=True)
    rng = np.random.default_rng(0)
    return rng.integers(0, spec.vocab_size, size=(4, calib_t))


def _log_outlier_selection(params: dict) -> None:
    """Log which features the static LLM.int8 decomposition kept bf16."""
    import logging

    from ..ops.quant.int8 import Int8OutlierWeight

    logger = logging.getLogger(__name__)
    for k, w in params["layers"].items():
        if isinstance(w, Int8OutlierWeight):
            idx = np.asarray(w.outlier_idx)
            logger.info(
                "int8-outliers %s: %d/%d features bf16 (layer-0 dims: %s)",
                k, idx.shape[1], w.in_features,
                np.sort(idx[0])[:16].tolist())


# Signature tensors per family: if a checkpoint carries this tensor, its
# layer naming follows that family's convention. Ordered by how common the
# convention is among fine-tunes/clones. Used only for unknown model_types.
_FALLBACK_SIGNATURES = [
    ("llama", "model.layers.0.self_attn.q_proj.weight"),
    ("gpt_neox", "gpt_neox.layers.0.attention.query_key_value.weight"),
    ("gptj", "transformer.h.0.attn.q_proj.weight"),
    ("gpt_bigcode", "transformer.h.0.attn.c_attn.weight"),
    ("gpt2", "transformer.h.0.attn.c_attn.weight"),
    ("opt", "model.decoder.layers.0.self_attn.q_proj.weight"),
    ("bloom", "transformer.h.0.self_attention.query_key_value.weight"),
    ("falcon", "transformer.h.0.self_attention.query_key_value.weight"),
    ("mpt", "transformer.blocks.0.attn.Wqkv.weight"),
]


def _load_fallback(model_dir: str, config: dict, model_type: str | None,
                   dtype) -> tuple[DecoderSpec, dict]:
    """Structural fallback for model_types outside FAMILIES.

    The reference serves ANY HF model by falling back to the generic
    CausalLM over plain transformers (reference:
    models/__init__.py:48-136, inference_engine/hf_transformers.py:43-64).
    The TPU equivalent: sniff which family's tensor-naming convention the
    checkpoint follows (signature tensor present + spec builds from the
    config attributes) and serve it through that family's loader — most
    unknown model_types are renamed clones of a known architecture.

    FALLBACK_FAMILY=auto (default) tries signatures in order;
    =<family> forces one family's loader; =off restores the hard error.
    """
    import logging
    import os

    logger = logging.getLogger(__name__)
    mode = os.getenv("FALLBACK_FAMILY", "auto").strip()
    matrix = (f"unsupported model_type {model_type!r}; supported: "
              f"{sorted(FAMILIES)}. Unknown types are served via the "
              "structural fallback (FALLBACK_FAMILY=auto|<family>; "
              "currently: " + mode + ")")
    if mode.lower() in ("off", "0", "false"):
        raise ValueError(matrix)
    weights = Weights(model_dir)
    if mode.lower() != "auto":
        if mode not in FAMILIES:
            raise ValueError(
                f"FALLBACK_FAMILY={mode!r} is not a known family; "
                f"choose one of {sorted(FAMILIES)} or auto/off")
        candidates = [mode]
    else:
        seen = set()
        candidates = []
        for fam, sig in _FALLBACK_SIGNATURES:
            if fam not in seen and weights.has(sig):
                seen.add(fam)
                candidates.append(fam)
    errors = []
    for fam in candidates:
        spec_fn, load_fn = FAMILIES[fam]
        try:
            spec = spec_fn(config)
            params = load_fn(weights, spec, dtype)
        except Exception as e:  # noqa: BLE001 - try the next convention
            errors.append(f"{fam}: {type(e).__name__}: {e}")
            continue
        logger.warning(
            "model_type %r is not natively supported; serving via the %r "
            "family's structural fallback (set FALLBACK_FAMILY=off to "
            "require native support)", model_type, fam)
        return spec, params
    raise ValueError(
        matrix + (f"; fallback attempts failed: {errors}" if errors
                  else "; no family signature tensor matched the checkpoint"))


def load_model(model_dir: str, dtype=jnp.bfloat16,
               quantize: str | None = None) -> tuple[DecoderSpec, dict]:
    """Load (spec, params) for any supported decoder-only HF checkpoint.

    quantize="int8" quantizes every layer linear at load time (per-output
    -channel absmax, the reference's bitsandbytes-int8 slot — no offline
    artifact needed). GPTQ checkpoints are detected from their tensors and
    need no flag.
    """
    config = load_hf_config(model_dir)
    model_type = config.get("model_type")
    if model_type in FAMILIES:
        spec_fn, load_fn = FAMILIES[model_type]
        spec = spec_fn(config)
        weights = Weights(model_dir)
        params = load_fn(weights, spec, dtype)
    else:
        spec, params = _load_fallback(model_dir, config, model_type, dtype)
    if quantize == "int8":
        from ..ops.quant.int8 import quantize_layer_params

        params = quantize_layer_params(params)
    elif quantize in ("int8-outliers", "bitsandbytes"):
        # the reference's LLM.int8 slot (its flag name accepted as an
        # alias): calibrate activation absmax per linear input feature,
        # then mixed-precision-quantize — outlier feature rows bf16, rest
        # int8 (static decomposition; see ops/quant/int8.py docstring)
        from ..ops.quant.calibrate import collect_linear_input_absmax
        from ..ops.quant.int8 import quantize_layer_params

        calib_t = min(128, int(config.get("max_position_embeddings", 128)))
        calib_ids = _calibration_token_ids(model_dir, spec, calib_t)
        stats = collect_linear_input_absmax(spec, params, calib_ids)
        params = quantize_layer_params(params, outlier_stats=stats)
        _log_outlier_selection(params)
    elif quantize == "gptq":
        # GPTQ has no load-time quantization path (it needs calibration,
        # done offline via `cli.py quantize`); the flag is a *requirement*
        # that the checkpoint already carries GPTQ tensors. Erroring here
        # closes the trap where QUANTIZE=gptq on an fp checkpoint would
        # silently serve full-precision weights.
        from ..ops.quant.int4 import Int4Weight

        if not any(isinstance(leaf, Int4Weight)
                   for leaf in jax.tree_util.tree_leaves(
                       params, is_leaf=lambda x: isinstance(x, Int4Weight))):
            raise ValueError(
                "QUANTIZE=gptq but the checkpoint has no GPTQ tensors "
                "(qweight/qzeros/scales); quantize it offline first "
                "(`text-generation-inference-tpu quantize`) or unset "
                "QUANTIZE")
    elif quantize is not None:
        raise ValueError(f"unsupported quantize mode {quantize!r}; expected "
                         "'int8', 'int8-outliers', 'bitsandbytes' or 'gptq'")
    return spec, params
