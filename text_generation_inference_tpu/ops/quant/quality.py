"""Quantization-quality metrics: perplexity + token-level KL vs the fp model.

The reference inherits quality from its CUDA kernels (ExLlamaV2 GPTQ-INT4,
bitsandbytes LLM.int8) and ships no in-repo quality harness; BASELINE.md's
target is "GPTQ-INT4 perplexity matching the reference CUDA path within its
stated 4-bit delta". This module provides the measurement:

  * `perplexity(spec, params, corpus)` — exp(mean NLL) of the corpus under
    the model (teacher-forced, all positions in one prefill pass);
  * `mean_token_kl(spec, params_fp, params_q, corpus)` — mean over
    positions of KL(fp || quantized) between next-token distributions,
    a checkpoint-independent fidelity measure (meaningful even for tiny
    random-init CI fixtures, unlike raw perplexity).

Used by `tests/test_quant_quality.py` (CI thresholds for GPTQ-INT4
act-order on/off, RTN-INT4, and INT8) and `scripts/quant_quality.py`
(real checkpoints).

INT8 note: plain `quantize=int8` is weight-only per-channel absmax with no
activation-outlier handling; `quantize=bitsandbytes` adds the LLM.int8
equivalent — a static activation-outlier decomposition that keeps calibrated
outlier feature rows in bf16 (ops/quant/int8.py::Int8OutlierWeight,
reference mechanism: utils/layers.py:114-169). The CI test asserts plain
INT8's KL sits below INT4's and that the outlier decomposition strictly
improves on plain INT8 on an outlier-planted model
(tests/test_quant_quality.py). On >6.7B real checkpoints with severe
activation outliers prefer quantize=bitsandbytes; measure with
scripts/quant_quality.py before shipping either mode on a new model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...models import core
from ...models.core import DecoderSpec, KVCache


def _all_logits(spec: DecoderSpec, params: dict,
                corpus: list[list[int]]) -> tuple[jax.Array, np.ndarray]:
    """Teacher-forced logits for every corpus row in one padded prefill.

    Returns ([N, T, V] f32 logits, lengths [N])."""
    n = len(corpus)
    t = max(len(c) for c in corpus)
    ids = np.zeros((n, t), np.int32)
    lengths = np.zeros((n,), np.int32)
    for i, c in enumerate(corpus):
        ids[i, : len(c)] = c
        lengths[i] = len(c)
    cache = KVCache.create(spec, n, t, jnp.float32)
    logits, _ = core.prefill(
        spec, params, jnp.asarray(ids), jnp.asarray(lengths),
        jnp.arange(n, dtype=jnp.int32), cache)
    return logits, lengths


def perplexity(spec: DecoderSpec, params: dict,
               corpus: list[list[int]]) -> float:
    """exp(mean NLL) of next-token prediction over the corpus."""
    logits, lengths = _all_logits(spec, params, corpus)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    total, count = 0.0, 0
    logp = np.asarray(logp)
    for i, c in enumerate(corpus):
        for j in range(len(c) - 1):
            total += -logp[i, j, c[j + 1]]
            count += 1
    return float(np.exp(total / max(count, 1)))


def mean_token_kl(spec: DecoderSpec, params_fp: dict, params_q: dict,
                  corpus: list[list[int]]) -> float:
    """Mean KL(fp || quantized) between next-token distributions, over all
    positions of the corpus."""
    lg_fp, lengths = _all_logits(spec, params_fp, corpus)
    lg_q, _ = _all_logits(spec, params_q, corpus)
    lp_fp = jax.nn.log_softmax(lg_fp.astype(jnp.float32), axis=-1)
    lp_q = jax.nn.log_softmax(lg_q.astype(jnp.float32), axis=-1)
    p_fp = jnp.exp(lp_fp)
    kl = jnp.sum(p_fp * (lp_fp - lp_q), axis=-1)        # [N, T]
    mask = (jnp.arange(kl.shape[1])[None, :]
            < jnp.asarray(lengths)[:, None] - 1)
    return float(jnp.sum(jnp.where(mask, kl, 0.0)) / jnp.sum(mask))


def kv_cache_kl(spec: DecoderSpec, params: dict,
                corpus: list[list[int]], split: float = 0.75) -> float:
    """Decode-path fidelity of the int8 KV cache: mean KL(fp-cache ||
    int8-cache) over teacher-forced decode logits.

    Each corpus row's first `split` fraction is prefilled (an int8 cache
    quantizes those K/V at write), then the remaining tokens are decoded
    teacher-forced through the ring-decode step — the production int8 read
    path (scale folded into the score/value einsums) — against the same run
    over an fp32 cache. Measures exactly what serving with KV_CACHE_DTYPE=
    int8 changes, which teacher-forced prefill perplexity cannot see."""
    n = len(corpus)
    t = max(len(c) for c in corpus)
    shortest = min(len(c) for c in corpus)
    cut = max(2, int(shortest * split))
    cut = min(cut, shortest - 1)     # always leave >=1 teacher-forced step
    m = shortest - cut               # teacher-forced steps
    if m < 1:
        raise ValueError(
            f"kv_cache_kl: shortest corpus row ({shortest} tokens) leaves no "
            f"teacher-forced steps after the prefill split (cut={cut}); "
            "need rows of >= 3 tokens")
    ids = np.zeros((n, t), np.int32)
    for i, c in enumerate(corpus):
        ids[i, : len(c)] = c
    ids_j = jnp.asarray(ids)
    slots = jnp.arange(n, dtype=jnp.int32)
    lengths = jnp.full((n,), cut, jnp.int32)

    def run(cache_dtype):
        cache = KVCache.create(spec, n, t, cache_dtype)
        _, cache = core.prefill(spec, params, ids_j[:, :cut], lengths,
                                slots, cache)
        chunk_start = jnp.full((n,), cut, jnp.int32)
        buf_dtype = jnp.float32
        kbuf = jnp.zeros((spec.num_layers, n, spec.num_kv_heads, m,
                          spec.head_dim), buf_dtype)
        vbuf = jnp.zeros_like(kbuf)

        @jax.jit
        def steps(cache, kbuf, vbuf):
            def body(carry, i):
                kbuf, vbuf = carry
                pos = cut + i     # teacher token at pos; ring col i holds it
                logits, k_all, v_all = core.decode_ring_step(
                    spec, params, ids_j[:, pos], jnp.full((n,), pos),
                    cache, kbuf, vbuf, i, chunk_start)
                kbuf = jax.lax.dynamic_update_slice(
                    kbuf, k_all[:, :, :, None, :].astype(buf_dtype),
                    (0, 0, 0, i, 0))
                vbuf = jax.lax.dynamic_update_slice(
                    vbuf, v_all[:, :, :, None, :].astype(buf_dtype),
                    (0, 0, 0, i, 0))
                return (kbuf, vbuf), logits
            _, ls = jax.lax.scan(body, (kbuf, vbuf),
                                 jnp.arange(m, dtype=jnp.int32))
            return ls                                   # [m, N, V]
        return steps(cache, kbuf, vbuf)

    lg_fp = run(jnp.float32)
    lg_q = run(jnp.int8)
    lp_fp = jax.nn.log_softmax(lg_fp.astype(jnp.float32), axis=-1)
    lp_q = jax.nn.log_softmax(lg_q.astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(lp_fp) * (lp_fp - lp_q), axis=-1)
    return float(jnp.mean(kl))


def gptq_quantize_params(spec: DecoderSpec, params: dict,
                         corpus: list[list[int]], groupsize: int = 128,
                         act_order: bool = False) -> dict:
    """GPTQ-quantize every stacked linear of a params tree using Hessians
    collected from the corpus activations (model-level counterpart of
    gptq_quantize.quantize_model, operating on the in-memory tree; the CLI
    path covers on-disk checkpoints)."""
    from ..quant import int4 as q4
    from .gptq_quantize import gptq_quantize_weight
    from .int8 import LINEAR_KEYS

    lp = dict(params["layers"])
    n_layers = spec.num_layers
    # collect per-linear input activations by running the fp model with
    # captured intermediates: cheapest correct route on the generic core is
    # finite sampling of x via a forward hook — here we use the inputs'
    # hidden states from a dedicated capture pass
    acts = _capture_linear_inputs(spec, params, corpus)

    for name in list(lp):
        if name not in LINEAR_KEYS or not isinstance(lp[name], jax.Array):
            continue
        w = np.asarray(lp[name], np.float32)             # [L, in, out]
        per = []
        for li in range(n_layers):
            x = acts[name][li]                           # [tokens, in]
            h = 2.0 * (x.T @ x).astype(np.float64)
            qw, qz, sc, gi = gptq_quantize_weight(
                w[li].T.copy(), h, bits=4, groupsize=groupsize,
                act_order=act_order)
            per.append(q4.normalize_act_order(qw, qz, sc, gi))
        lp[name] = q4.Int4Weight(
            qweight=jnp.stack([p.qweight for p in per]),
            qzeros=jnp.stack([p.qzeros for p in per]),
            scales=jnp.stack([p.scales for p in per]),
            g_idx=jnp.stack([p.g_idx for p in per]),
            perm=(jnp.stack([
                p.perm if p.perm is not None
                else jnp.arange(p.in_features, dtype=jnp.int32)
                for p in per]) if any(p.perm is not None for p in per)
                else None),
            zbias=jnp.stack([p.zbias for p in per]),
        )
    return dict(params, layers=lp)


def _capture_linear_inputs(spec: DecoderSpec, params: dict,
                           corpus: list[list[int]]) -> dict:
    """Per-linear, per-layer input activations [tokens, in] from a
    teacher-forced pass (the Hessian source for GPTQ). Uses the same layer
    math as models/core via a small reimplementation of the residual walk —
    kept here so the serving forward stays capture-free."""
    n = len(corpus)
    t = max(len(c) for c in corpus)
    ids = np.zeros((n, t), np.int32)
    valid = np.zeros((n, t), bool)
    for i, c in enumerate(corpus):
        ids[i, : len(c)] = c
        valid[i, : len(c)] = True
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
    x = core._embed(spec, params, jnp.asarray(ids), positions)

    cos = sin = None
    if spec.pos == "rope":
        cos, sin = core._rope_freqs(spec, positions)
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    lengths = jnp.asarray([len(c) for c in corpus], jnp.int32)
    key_valid = positions < lengths[:, None]
    mask = causal[None] & key_valid[:, None, :]

    import math as _math

    scale = 1.0 / _math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    acts: dict[str, list[np.ndarray]] = {}

    def rec(name, li, h):
        arr = np.asarray(h)[valid]                     # [tokens, dim]
        acts.setdefault(name, [None] * spec.num_layers)
        acts[name][li] = arr

    lp_all = params["layers"]
    for li in range(spec.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[li], lp_all)
        h = core._norm(spec, lp["ln1"], x)
        for nm in ("wq", "wk", "wv"):
            rec(nm, li, h)
        q, k, v = core._qkv(spec, lp, h)
        if cos is not None:
            q = core._apply_rope(spec, q, cos, sin)
            k = core._apply_rope(spec, k, cos, sin)
        qg = q.reshape(n, t, spec.num_kv_heads, group, spec.head_dim)
        scores = jnp.einsum("nqkgd,ntkd->nkgqt", qg, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("nkgqt,ntkd->nqkgd", probs, v)
        attn = attn.reshape(n, t, spec.num_heads * spec.head_dim)
        rec("wo", li, attn)
        attn = core._attn_out(spec, lp, attn.reshape(
            n, t, spec.num_heads, spec.head_dim))
        if spec.parallel_residual:
            h2 = core._norm(spec, lp["ln2"], x)
            for nm in ("w_gate", "w_up"):
                rec(nm, li, h2)
            up = core.linops.matmul(h2, lp["w_up"]) if "w_up" in lp else None
            gate = core.linops.matmul(h2, lp["w_gate"]) \
                if "w_gate" in lp else None
            act = core._activate(spec, up, gate)
            rec("w_down", li, act)
            x = x + attn + core.linops.matmul(act, lp["w_down"])
        else:
            x = x + attn
            h2 = core._norm(spec, lp["ln2"], x)
            for nm in ("w_gate", "w_up"):
                if nm in lp:
                    rec(nm, li, h2)
            if "w_up" in lp:
                up = core.linops.matmul(h2, lp["w_up"])
            else:
                up = None
            gate = core.linops.matmul(h2, lp["w_gate"]) \
                if "w_gate" in lp else None
            if "wi" in lp:
                rec("wi", li, h2)
                up = core.linops.matmul(h2, lp["wi"])
            act = core._activate(spec, up, gate)
            rec("w_down", li, act)
            x = x + core.linops.matmul(act, lp["w_down"])
    return acts
