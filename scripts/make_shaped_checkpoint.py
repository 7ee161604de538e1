#!/usr/bin/env python
"""Synthesize a llama-architecture checkpoint of an arbitrary shape.

The environment has no real pretrained checkpoints (offline build), but
request-level measurements (TTFT under load, prefill latency) are only
meaningful against a real-size model: weight streaming, prefill FLOPs and
KV growth must cost what they cost in production. This writes a
random-weight HF-layout llama checkpoint (safetensors + config.json +
the byte-level fixture tokenizer) that the serving stack loads exactly
like a downloaded model — the TPU counterpart of the reference's
integration habit of serving real *tiny* models (reference:
integration_tests/test_server.py:48-64), scaled up instead of down.

Usage:
  python scripts/make_shaped_checkpoint.py /tmp/tinyllama_shaped \
      --preset tinyllama            # 1.1B: 2048h x 22L, 32 heads / 4 kv
  python scripts/make_shaped_checkpoint.py OUT --preset llama7b
  python scripts/make_shaped_checkpoint.py OUT --preset llama7b \
      --quantize gptq               # GPTQ-INT4 tensors (north-star config)

--quantize gptq writes qweight/qzeros/scales/g_idx in the HF/AutoGPTQ
layout the loader consumes (models/families.py::_stack_linear; same
format the reference reads, server/.../utils/weights.py:203-229) plus
quantize_config.json — serve with QUANTIZE=gptq.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    # tiny smoke shape (CI-runnable GPTQ serving tests)
    "mini": dict(hidden=256, layers=4, heads=8, kv_heads=4,
                 head_dim=32, intermediate=512, vocab=2048),
    # TinyLlama-1.1B geometry
    "tinyllama": dict(hidden=2048, layers=22, heads=32, kv_heads=4,
                      head_dim=64, intermediate=5632, vocab=32000),
    # Llama-2-7B geometry
    "llama7b": dict(hidden=4096, layers=32, heads=32, kv_heads=32,
                    head_dim=128, intermediate=11008, vocab=32000),
}


def _pack_rows_np(q: np.ndarray) -> np.ndarray:
    """[in, out] 4-bit values -> [in/8, out] int32, little-endian nibbles
    (the AutoGPTQ qweight packing; ops/quant/int4.py::unpack_rows)."""
    n, m = q.shape
    q = q.reshape(n // 8, 8, m).astype(np.uint32)
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, :, None]
    return (q << shifts).sum(axis=1).astype(np.int64).astype(
        np.uint32).view(np.int32)


def _pack_cols_np(z: np.ndarray) -> np.ndarray:
    """[groups, out] 4-bit values -> [groups, out/8] int32 (qzeros)."""
    g, m = z.shape
    z = z.reshape(g, m // 8, 8).astype(np.uint32)
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, None, :]
    return (z << shifts).sum(axis=2).astype(np.int64).astype(
        np.uint32).view(np.int32)


def _gptq_tensors(rng, in_f: int, out_f: int, groupsize: int = 128):
    """Random GPTQ-INT4 tensors with llama-like dequant magnitudes:
    w = (q - zero - 1) * scale, zero stored = 7 so effective zero is 8
    (symmetric); scale sized so std(w) ~ 0.6/sqrt(in)."""
    import ml_dtypes

    groupsize = min(groupsize, in_f)
    groups = in_f // groupsize
    q = rng.integers(0, 16, size=(in_f, out_f), dtype=np.int32)
    # std of uniform(0..15) - 8 is ~4.6
    scale_val = 0.6 / (np.sqrt(in_f) * 4.6)
    scales = np.full((groups, out_f),  scale_val, np.float32) \
        * rng.uniform(0.5, 1.5, size=(groups, out_f)).astype(np.float32)
    zeros = np.full((groups, out_f), 8, np.int32)
    return {
        "qweight": _pack_rows_np(q),
        "qzeros": _pack_cols_np(zeros - 1),
        "scales": scales.astype(ml_dtypes.bfloat16),
        "g_idx": (np.arange(in_f, dtype=np.int32) // groupsize),
    }


def write_checkpoint(out_dir: str, shape: dict, seed: int = 0,
                     max_position: int = 2048, quantize: str = "") -> None:
    import ml_dtypes
    from safetensors.numpy import save_file

    h, l = shape["hidden"], shape["layers"]
    nh, kv, hd = shape["heads"], shape["kv_heads"], shape["head_dim"]
    inter, vocab = shape["intermediate"], shape["vocab"]
    rng = np.random.default_rng(seed)

    def w(*dims):
        # small init keeps logits sane so generation doesn't degenerate
        # into a single repeated token (bad for detokenizer/stop paths)
        a = rng.standard_normal(dims, dtype=np.float32) * (0.6 / np.sqrt(dims[-1]))
        return a.astype(ml_dtypes.bfloat16)

    tensors = {
        "model.embed_tokens.weight": w(vocab, h),
        "model.norm.weight": np.ones((h,), ml_dtypes.bfloat16),
        "lm_head.weight": w(vocab, h),
    }
    groupsize = 128

    def linear(name: str, out_f: int, in_f: int):
        # GPTQ tensors are stored [in-major] (x @ W orientation); dense
        # HF .weight is [out, in]
        if quantize == "gptq":
            for suffix, t in _gptq_tensors(rng, in_f, out_f,
                                           groupsize).items():
                tensors[name + "." + suffix] = t
        else:
            tensors[name + ".weight"] = w(out_f, in_f)

    for i in range(l):
        p = f"model.layers.{i}."
        linear(p + "self_attn.q_proj", nh * hd, h)
        linear(p + "self_attn.k_proj", kv * hd, h)
        linear(p + "self_attn.v_proj", kv * hd, h)
        linear(p + "self_attn.o_proj", h, nh * hd)
        linear(p + "mlp.gate_proj", inter, h)
        linear(p + "mlp.up_proj", inter, h)
        linear(p + "mlp.down_proj", h, inter)
        tensors[p + "input_layernorm.weight"] = np.ones((h,), ml_dtypes.bfloat16)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            (h,), ml_dtypes.bfloat16)

    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    if quantize == "gptq":
        with open(os.path.join(out_dir, "quantize_config.json"), "w") as f:
            json.dump({"bits": 4, "group_size": groupsize,
                       "desc_act": False, "sym": False}, f, indent=2)
    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": h,
        "num_hidden_layers": l,
        "num_attention_heads": nh,
        "num_key_value_heads": kv,
        "head_dim": hd,
        "intermediate_size": inter,
        "vocab_size": vocab,
        "max_position_embeddings": max_position,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "hidden_act": "silu",
        "tie_word_embeddings": False,
        "bos_token_id": 1,
        "eos_token_id": 2,
        "torch_dtype": "bfloat16",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    # byte-level fixture tokenizer: ids < 256 << vocab, so any prompt works
    from tests.fixtures import tiny_tokenizer_file
    import shutil

    shutil.copy(tiny_tokenizer_file(), os.path.join(out_dir, "tokenizer.json"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="tinyllama")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-position", type=int, default=2048)
    ap.add_argument("--quantize", choices=["", "gptq"], default="")
    args = ap.parse_args()
    write_checkpoint(args.out_dir, PRESETS[args.preset], seed=args.seed,
                     max_position=args.max_position, quantize=args.quantize)
    size = sum(os.path.getsize(os.path.join(args.out_dir, f))
               for f in os.listdir(args.out_dir))
    print(f"wrote {args.out_dir} preset={args.preset} "
          f"quantize={args.quantize or 'none'} ({size / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
