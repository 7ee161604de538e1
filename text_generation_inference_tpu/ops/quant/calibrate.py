"""Activation calibration for mixed-precision quantization.

LLM.int8 (the reference's bitsandbytes path, reference:
server/.../utils/layers.py:114-169) preserves quality on large models by
computing the matmul columns whose *activation* magnitude exceeds a
threshold (6.0) in fp16 and the rest in int8. bitsandbytes selects those
columns dynamically per batch — data-dependent shapes that XLA cannot
compile. The TPU-native equivalent is a STATIC decomposition: a short
calibration forward records each linear's per-input-feature activation
absmax, the outlier features are fixed at load time (the LLM.int8 paper's
own observation — outlier feature dims are systematic, consistent across
tokens and layers — is what makes the static pick sound), and the weight
rows for those features stay bf16 while the rest quantize to int8
(ops/quant/int8.py::Int8OutlierWeight).

The collection runs the decoder layer-by-layer in eager mode with
`linops.matmul` tapped, so every linear's true input (post-norm residual
stream, attention output, activated MLP hidden) is observed — the same
coverage bitsandbytes gets from wrapping each nn.Linear.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import linear as linops
from .int8 import LINEAR_KEYS


def collect_linear_input_absmax(spec, params: dict, ids,
                                lengths=None) -> dict[str, np.ndarray]:
    """Run a calibration forward (eager, full attention) and record, for
    every stacked linear key in params['layers'], the per-input-feature
    activation absmax.

    ids: [N, T] int32 calibration prompts (right-padded; padding positions
    are included in the stats, matching bitsandbytes' whole-batch view).
    Returns {linear_key: [L, in_features] float32}.
    """
    from ...models import core
    from .. import attention as attn_ops

    ids = jnp.asarray(ids, jnp.int32)
    n, t = ids.shape
    if lengths is None:
        lengths = jnp.full((n,), t, jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
    x = core._embed(spec, params, ids, positions)
    if spec.pos == "rope":
        cos, sin = core._rope_freqs(spec, positions)
    else:
        cos = sin = None
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    key_valid = positions < lengths[:, None]
    mask = causal[None, :, :] & key_valid[:, None, :]
    if spec.pos == "alibi":
        slopes = jnp.asarray(core.alibi_slopes(spec.num_heads,
                                               spec.alibi_impl))
        alibi = slopes[:, None] * jnp.arange(t, dtype=jnp.float32)[None, :]
        bias = alibi[None, :, None, :].reshape(
            1, spec.num_kv_heads, spec.num_heads // spec.num_kv_heads, 1, t)
    else:
        bias = None

    import math

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    stats: dict[str, np.ndarray] = {}
    num_layers = spec.num_layers

    # tap: record |x| max per input feature, keyed by which weight object
    # the call used (the per-layer slices below give every weight a unique
    # object identity)
    key_of: dict[int, str] = {}
    layer_stats: dict[str, np.ndarray] = {}
    orig_matmul = linops.matmul

    def tap(xin, w):
        k = key_of.get(id(w))
        if k is not None:
            am = np.max(np.abs(np.asarray(xin, np.float32)).reshape(
                -1, xin.shape[-1]), axis=0)
            prev = layer_stats.get(k)
            layer_stats[k] = am if prev is None else np.maximum(prev, am)
        return orig_matmul(xin, w)

    linops.matmul = tap
    try:
        for li in range(num_layers):
            lp = jax.tree_util.tree_map(lambda a: a[li], params["layers"])
            key_of.clear()
            layer_stats.clear()
            for k in LINEAR_KEYS:
                if k in lp:
                    key_of[id(lp[k])] = k

            h = core._norm(spec, lp["ln1"], x)
            q, k_, v = core._qkv(spec, lp, h)
            if cos is not None:
                q = core._apply_rope(spec, q, cos, sin)
                k_ = core._apply_rope(spec, k_, cos, sin)
            qg = q.reshape(n, t, spec.num_kv_heads, group, spec.head_dim)
            attn = attn_ops.prefill_attention(qg, k_, v, lengths, bias,
                                              mask, scale)
            attn = attn.reshape(n, t, spec.num_heads, spec.head_dim)
            attn = core._attn_out(spec, lp, attn)
            if spec.parallel_residual:
                h2 = core._norm(spec, lp["ln2"], x)
                x = x + attn + core._mlp(spec, lp, h2)
            else:
                x = x + attn
                h2 = core._norm(spec, lp["ln2"], x)
                x = x + core._mlp(spec, lp, h2)

            for k, am in layer_stats.items():
                buf = stats.get(k)
                if buf is None:
                    buf = np.zeros((num_layers, am.shape[0]), np.float32)
                    stats[k] = buf
                buf[li] = am
    finally:
        linops.matmul = orig_matmul
    return stats


def pick_outlier_features(absmax: np.ndarray, threshold: float = 6.0,
                          min_k: int = 0, max_frac: float = 1 / 32,
                          k: Optional[int] = None) -> np.ndarray:
    """Choose each layer's outlier input features from calibration absmax.

    absmax: [L, in]. The reference semantics: a feature is an outlier when
    its activation magnitude exceeds `threshold` (bitsandbytes default
    6.0). Static shapes need one K for the whole stack, so K = the largest
    per-layer outlier count (clamped to [min_k, max_frac * in]); layers
    with fewer threshold-crossers fill the remainder with their
    next-largest features (the decomposition is exact for ANY feature set,
    so padding with real features only ever helps). Returns [L, K] int32;
    K == 0 (no feature crosses the threshold anywhere) means no
    decomposition is needed.
    """
    absmax = np.asarray(absmax, np.float32)
    l, in_f = absmax.shape
    if k is None:
        counts = (absmax > threshold).sum(axis=1)
        k = int(counts.max(initial=0))
        k = max(k, min_k)
        k = min(k, max(1, int(in_f * max_frac)))
    if k <= 0:
        return np.zeros((l, 0), np.int32)
    idx = np.argsort(-absmax, axis=1, kind="stable")[:, :k]
    return np.ascontiguousarray(idx.astype(np.int32))
