"""Offline GPTQ quantization CLI backend.

From-scratch implementation of the GPTQ algorithm (Frantar et al. 2022) with
the same artifact format as the reference's quantizer (reference:
server/.../utils/gptq/quantize.py:152-359, 591-862): per-layer Hessian
accumulation from calibration activations, column-wise quantization with
error feedback through the inverse-Hessian Cholesky factor, optional
act-order, packed qweight/qzeros/scales/g_idx tensors plus
quantize_config.json.

Calibration: the reference downloads wikitext2/ptb/c4; this environment is
offline, so calibration text comes from a local file (one sample per line)
or, failing that, synthetic random token sequences (documented degradation —
GPTQ with random calibration still beats RTN on most layers).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .int4 import pack_cols, pack_rows


def gptq_quantize_weight(
    weight: np.ndarray,        # [out, in] f32 (torch layout)
    hessian: np.ndarray,       # [in, in] f32: 2 * sum x x^T
    bits: int = 4,
    groupsize: int = 128,
    act_order: bool = False,
    percdamp: float = 0.01,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run GPTQ on one linear layer.

    Returns (qweight_packed [in/8, out], qzeros_packed [groups, out/8],
    scales [groups, out], g_idx [in]).
    """
    out_f, in_f = weight.shape
    maxq = (1 << bits) - 1
    W = weight.astype(np.float64).copy()
    H = hessian.astype(np.float64).copy()

    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W[:, dead] = 0.0

    perm = None
    if act_order:
        perm = np.argsort(-np.diag(H), kind="stable")
        W = W[:, perm]
        H = H[perm][:, perm]

    damp = percdamp * np.mean(np.diag(H))
    H[np.diag_indices(in_f)] += damp
    # Hinv upper Cholesky of H^-1 (as in the paper's implementation)
    Hinv = np.linalg.cholesky(np.linalg.inv(H)).T

    groups = in_f // groupsize
    scales = np.zeros((groups, out_f), np.float32)
    zeros = np.zeros((groups, out_f), np.int32)
    Q = np.zeros_like(W)

    for g in range(groups):
        s, e = g * groupsize, (g + 1) * groupsize
        block = W[:, s:e]
        # per-group asymmetric scale/zero from the (error-updated) block
        wmax = np.maximum(block.max(axis=1), 0)
        wmin = np.minimum(block.min(axis=1), 0)
        scale = np.maximum((wmax - wmin) / maxq, 1e-8)
        zero = np.clip(np.round(-wmin / scale), 0, maxq)
        scales[g] = scale.astype(np.float32)
        zeros[g] = zero.astype(np.int32)

        err_block = np.zeros_like(block)
        for j in range(groupsize):
            col = s + j
            w = W[:, col]
            d = Hinv[col, col]
            q = np.clip(np.round(w / scale) + zero, 0, maxq)
            Q[:, col] = q
            dq = (q - zero) * scale
            err = (w - dq) / d
            # error feedback into the remaining columns of this group
            W[:, col + 1:e] -= np.outer(err, Hinv[col, col + 1:e])
            err_block[:, j] = err
        # propagate the accumulated block error to later groups
        if e < in_f:
            W[:, e:] -= err_block @ Hinv[s:e, e:]

    g_idx = (np.arange(in_f) // groupsize).astype(np.int32)
    if act_order:
        # map quantized columns back to original order; g_idx records the
        # group of each ORIGINAL input row (reference checkpoint convention)
        inv = np.argsort(perm)
        Q = Q[:, inv]
        g_idx = g_idx[inv]

    qweight = pack_rows(Q.T.astype(np.int32))            # [in/8, out]
    qzeros = pack_cols(zeros - 1)                        # [groups, out/8]
    return qweight, qzeros, scales, g_idx


def collect_hessians(model, samples: list[list[int]], target_names: list[str]):
    """Accumulate H = 2 Σ x xᵀ for each target linear layer over the
    calibration samples (runs the full model on torch CPU)."""
    import torch

    hessians: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}
    hooks = []

    def make_hook(name):
        def hook(mod, inputs, output):
            x = inputs[0].detach().reshape(-1, inputs[0].shape[-1]).float()
            h = 2.0 * (x.T @ x)
            if name in hessians:
                hessians[name] += h.numpy()
            else:
                hessians[name] = h.numpy()
            counts[name] = counts.get(name, 0) + x.shape[0]
        return hook

    mods = dict(model.named_modules())
    for name in target_names:
        hooks.append(mods[name].register_forward_hook(make_hook(name)))
    with torch.no_grad():
        for ids in samples:
            model(torch.tensor([ids], dtype=torch.long))
    for h in hooks:
        h.remove()
    return hessians


def quantize_model(model_path: str, output_dir: str, bits: int = 4,
                   groupsize: int = 128, calibration: str = "synthetic",
                   num_samples: int = 16, seq_len: int = 512,
                   act_order: bool = False) -> None:
    """Quantize every decoder linear layer of an HF causal LM to GPTQ INT4
    and save a checkpoint loadable by this framework (and by AutoGPTQ)."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoModelForCausalLM, AutoTokenizer

    model = AutoModelForCausalLM.from_pretrained(
        model_path, torch_dtype=torch.float32).eval()
    cfg = model.config

    # calibration samples
    rng = np.random.default_rng(0)
    cal_path = Path(calibration)
    samples: list[list[int]] = []
    if cal_path.is_file():
        tok = AutoTokenizer.from_pretrained(model_path)
        for line in cal_path.read_text().splitlines()[:num_samples]:
            ids = tok.encode(line)[:seq_len]
            if len(ids) >= 8:
                samples.append(ids)
    if not samples:
        samples = [rng.integers(0, cfg.vocab_size, size=seq_len).tolist()
                   for _ in range(num_samples)]

    target_names = [
        name for name, mod in model.named_modules()
        if isinstance(mod, torch.nn.Linear) and "lm_head" not in name
        and mod.in_features % groupsize == 0 and mod.in_features % 8 == 0
        and mod.out_features % 8 == 0
    ]
    hessians = collect_hessians(model, samples, target_names)

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    state: dict = {}
    mods = dict(model.named_modules())
    # non-quantized tensors pass through unchanged
    quant_prefixes = set(target_names)
    for name, tensor in model.state_dict().items():
        owner = name.rsplit(".", 1)[0]
        if owner in quant_prefixes and name.endswith(".weight"):
            continue
        state[name] = tensor.contiguous()

    for name in target_names:
        w = mods[name].weight.detach().numpy()
        qweight, qzeros, scales, g_idx = gptq_quantize_weight(
            w, hessians[name], bits=bits, groupsize=groupsize,
            act_order=act_order)
        state[f"{name}.qweight"] = torch.tensor(qweight)
        state[f"{name}.qzeros"] = torch.tensor(qzeros)
        state[f"{name}.scales"] = torch.tensor(scales)
        state[f"{name}.g_idx"] = torch.tensor(g_idx)
        print(f"quantized {name}: {w.shape}")

    save_file(state, out / "model.safetensors")
    (out / "quantize_config.json").write_text(json.dumps({
        "bits": bits, "group_size": groupsize, "desc_act": act_order,
        "quant_method": "gptq", "sym": False,
    }, indent=2))
    # copy config + tokenizer files
    src = Path(model_path)
    for f in ("config.json", "tokenizer.json", "tokenizer_config.json",
              "special_tokens_map.json"):
        if (src / f).exists():
            (out / f).write_bytes((src / f).read_bytes())
    print(f"wrote GPTQ checkpoint to {out}")
