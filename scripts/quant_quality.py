"""Quantization-quality report for a real checkpoint.

Measures teacher-forced perplexity and token-level KL(fp || quantized) for
the INT8 and GPTQ/RTN INT4 paths of a checkpoint on a token corpus, and
prints one JSON report. Counterpart of the external perplexity evals the
reference relies on for its CUDA quantization paths (BASELINE.md: "GPTQ-
INT4 perplexity matching the reference CUDA ExLlamaV2 path within its
stated 4-bit delta").

Usage:
  python scripts/quant_quality.py <model_dir> [--corpus tokens.json]
      [--groupsize 128] [--act-order] [--rows 8] [--len 512]

The corpus file is a JSON list of token-id lists; without it a
deterministic random corpus is generated (fidelity KL is meaningful on any
input distribution; perplexity numbers then measure only the quantization
delta, not language quality).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--groupsize", type=int, default=128)
    ap.add_argument("--act-order", action="store_true")
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--len", dest="length", type=int, default=512)
    ap.add_argument("--skip-gptq", action="store_true",
                    help="RTN + INT8 only (GPTQ Hessian pass is slow)")
    args = ap.parse_args()

    from text_generation_inference_tpu.models import families
    from text_generation_inference_tpu.ops.quant import quality
    from text_generation_inference_tpu.ops.quant.int4 import (
        quantize_layer_params_int4)
    from text_generation_inference_tpu.ops.quant.int8 import (
        quantize_layer_params)

    spec, params = families.load_model(args.model_dir, dtype=jnp.float32)
    if args.corpus:
        corpus = json.load(open(args.corpus))
    else:
        rng = np.random.default_rng(7)
        corpus = [rng.integers(1, spec.vocab_size,
                               size=args.length).tolist()
                  for _ in range(args.rows)]

    report = {"model": args.model_dir,
              "ppl_fp": quality.perplexity(spec, params, corpus),
              # decode-path int8 KV-cache fidelity (KV_CACHE_DTYPE=int8)
              "int8_kv": {"decode_kl": quality.kv_cache_kl(
                  spec, params, corpus)}}
    q8 = quantize_layer_params(params)
    report["int8"] = {
        "ppl": quality.perplexity(spec, q8, corpus),
        "kl": quality.mean_token_kl(spec, params, q8, corpus)}
    del q8
    rtn = quantize_layer_params_int4(params, groupsize=args.groupsize)
    report["rtn_int4"] = {
        "ppl": quality.perplexity(spec, rtn, corpus),
        "kl": quality.mean_token_kl(spec, params, rtn, corpus)}
    del rtn
    if not args.skip_gptq:
        qg = quality.gptq_quantize_params(
            spec, params, corpus, groupsize=args.groupsize,
            act_order=args.act_order)
        report["gptq_int4"] = {
            "act_order": args.act_order,
            "ppl": quality.perplexity(spec, qg, corpus),
            "kl": quality.mean_token_kl(spec, params, qg, corpus)}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
