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
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    # TinyLlama-1.1B geometry
    "tinyllama": dict(hidden=2048, layers=22, heads=32, kv_heads=4,
                      head_dim=64, intermediate=5632, vocab=32000),
    # Llama-2-7B geometry
    "llama7b": dict(hidden=4096, layers=32, heads=32, kv_heads=32,
                    head_dim=128, intermediate=11008, vocab=32000),
}


def write_checkpoint(out_dir: str, shape: dict, seed: int = 0,
                     max_position: int = 2048) -> None:
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
    for i in range(l):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = w(nh * hd, h)
        tensors[p + "self_attn.k_proj.weight"] = w(kv * hd, h)
        tensors[p + "self_attn.v_proj.weight"] = w(kv * hd, h)
        tensors[p + "self_attn.o_proj.weight"] = w(h, nh * hd)
        tensors[p + "mlp.gate_proj.weight"] = w(inter, h)
        tensors[p + "mlp.up_proj.weight"] = w(inter, h)
        tensors[p + "mlp.down_proj.weight"] = w(h, inter)
        tensors[p + "input_layernorm.weight"] = np.ones((h,), ml_dtypes.bfloat16)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            (h,), ml_dtypes.bfloat16)

    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
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
    args = ap.parse_args()
    write_checkpoint(args.out_dir, PRESETS[args.preset], seed=args.seed,
                     max_position=args.max_position)
    size = sum(os.path.getsize(os.path.join(args.out_dir, f))
               for f in os.listdir(args.out_dir))
    print(f"wrote {args.out_dir} preset={args.preset} "
          f"({size / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
