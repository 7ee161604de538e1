"""INT8 weight-only quantization (the reference's bitsandbytes-int8 slot).

The reference wraps linear layers in bitsandbytes' Linear8bitLt when
--quantize bitsandbytes is given (reference: server/.../utils/layers.py:
114-169): weights are quantized vector-wise at load time from the fp16
checkpoint; no offline quantization artifact is needed.

Here the same capability is TPU-native: per-output-channel symmetric absmax
scales, int8 storage in HBM (2x less weight traffic than bf16 — decode is
weight-bandwidth-bound), and the matmul runs as x @ q.astype(bf16) * scale,
which XLA fuses into a convert-on-read matmul (measured within ~2.2x of the
4-bit speed-of-light on v5e at 4096x12288 with no custom kernel at all —
the s4 Pallas kernel exists for the 4x path, see pallas/int4_matmul.py).

LLM.int8's mixed-precision outlier decomposition IS replicated, in static
form (Int8OutlierWeight): a calibration forward fixes the activation-outlier
input features at load time (ops/quant/calibrate.py; the LLM.int8 paper's
observation that outlier dims are systematic across tokens/layers is what
makes the static pick sound), their weight rows stay bf16, and the rest
quantizes to int8 — per-channel scales computed on the outlier-free
residual, so one hot feature no longer inflates a whole channel's scale.
bitsandbytes' runtime per-batch column selection (reference:
server/.../utils/layers.py:114-169) is data-dependent shape churn XLA
cannot compile; the static decomposition is the TPU-native equivalent.
Activations always stay bf16 here (weight-only), which strictly dominates
LLM.int8's int8 activation path on quality.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Int8Weight(NamedTuple):
    """Per-output-channel symmetric int8 weight. Shapes carry an optional
    leading layer-stack dim like every other stacked param:
    q [(L,) in, out] int8; scale [(L,) out] f32."""

    q: jax.Array
    scale: jax.Array

    @property
    def in_features(self) -> int:
        return self.q.shape[-2]

    @property
    def out_features(self) -> int:
        return self.q.shape[-1]


def quantize_int8(weight: jax.Array | np.ndarray) -> Int8Weight:
    """[(L,) in, out] float → Int8Weight (per-output-channel absmax)."""
    w = jnp.asarray(weight, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)       # [(L,) 1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return Int8Weight(q=q, scale=scale[..., 0, :])


def dequantize_int8(w: Int8Weight, dtype=jnp.bfloat16) -> jax.Array:
    return (w.q.astype(jnp.float32)
            * w.scale[..., None, :].astype(jnp.float32)).astype(dtype)


def matmul_int8(x: jax.Array, w: Int8Weight) -> jax.Array:
    """x @ dequant(w) with the scale applied on the [.., out] result, so
    the int8 -> compute-dtype convert fuses into the matmul's weight read
    (no dequantized copy is materialized)."""
    y = jnp.dot(x.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return (y * w.scale.astype(jnp.float32)).astype(x.dtype)


class Int8OutlierWeight(NamedTuple):
    """Int8Weight + static mixed-precision outlier decomposition (the
    TPU-native LLM.int8): `outlier_idx` names the input features whose
    weight rows live in `outlier_w` at full precision; those rows are
    ZEROED in `q`, so  x @ W == matmul_int8(x, q·scale) + x[..., idx] @ Wo
    exactly for any feature set. Shapes (optional leading layer stack):
    q [(L,) in, out] int8; scale [(L,) out] f32;
    outlier_idx [(L,) K] i32; outlier_w [(L,) K, out] bf16."""

    q: jax.Array
    scale: jax.Array
    outlier_idx: jax.Array
    outlier_w: jax.Array

    @property
    def in_features(self) -> int:
        return self.q.shape[-2]

    @property
    def out_features(self) -> int:
        return self.q.shape[-1]


def quantize_int8_outliers(weight: jax.Array | np.ndarray,
                           outlier_idx: jax.Array | np.ndarray
                           ) -> Int8OutlierWeight:
    """[(L,) in, out] float + [(L,) K] outlier features → Int8OutlierWeight.

    The per-channel scales are computed AFTER zeroing the outlier rows —
    removing a hot feature's weight row also stops it inflating the
    channel absmax, so the int8 residual gets finer resolution than plain
    quantize_int8 even for the non-outlier features."""
    w = jnp.asarray(weight, jnp.float32)
    idx = jnp.asarray(outlier_idx, jnp.int32)
    stacked = w.ndim == 3
    if not stacked:
        w, idx = w[None], idx[None]
    l = w.shape[0]
    rows = jnp.arange(l, dtype=jnp.int32)[:, None]
    outlier_w = jnp.take_along_axis(w, idx[:, :, None], axis=1)  # [L, K, out]
    base = w.at[rows, idx, :].set(0.0)
    q8 = quantize_int8(base)
    if not stacked:
        q8 = Int8Weight(q=q8.q[0], scale=q8.scale[0])
        idx, outlier_w = idx[0], outlier_w[0]
    return Int8OutlierWeight(q=q8.q, scale=q8.scale, outlier_idx=idx,
                             outlier_w=outlier_w.astype(jnp.bfloat16))


def dequantize_int8_outliers(w: Int8OutlierWeight,
                             dtype=jnp.bfloat16) -> jax.Array:
    base = (w.q.astype(jnp.float32) * w.scale[..., None, :])
    idx = w.outlier_idx
    if base.ndim == 3:
        rows = jnp.arange(base.shape[0], dtype=jnp.int32)[:, None]
        base = base.at[rows, idx, :].set(w.outlier_w.astype(jnp.float32))
    else:
        base = base.at[idx, :].set(w.outlier_w.astype(jnp.float32))
    return base.astype(dtype)


def matmul_int8_outliers(x: jax.Array, w: Int8OutlierWeight) -> jax.Array:
    """x @ dequant(w): int8 part as matmul_int8 (convert fused into the
    weight read) + a thin bf16 matmul over the K outlier features."""
    y = jnp.dot(x.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    y = y * w.scale.astype(jnp.float32)
    if w.outlier_idx.shape[-1]:
        xo = jnp.take(x, w.outlier_idx, axis=-1)          # [..., K]
        y = y + jnp.dot(xo.astype(jnp.bfloat16),
                        w.outlier_w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


LINEAR_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "w_qkv", "w_gu", "wi", "wi_0", "wi_1")


def quantize_layer_params(params: dict,
                          outlier_stats: dict | None = None,
                          threshold: float = 6.0) -> dict:
    """Quantize every stacked linear in params['layers'] to Int8Weight
    (embeddings / lm_head / norms stay full precision, matching the
    reference's Linear8bitLt placement). With `outlier_stats` (linear key
    → [L, in] calibration activation absmax from
    calibrate.collect_linear_input_absmax), linears whose activations
    cross `threshold` get the mixed-precision Int8OutlierWeight instead —
    the reference's bitsandbytes LLM.int8 slot."""
    from .calibrate import pick_outlier_features

    out = dict(params)
    lp = dict(params["layers"])
    for k in list(lp):
        if k in LINEAR_KEYS and isinstance(lp[k], jax.Array):
            stats = (outlier_stats or {}).get(k)
            if stats is not None:
                idx = pick_outlier_features(stats, threshold=threshold)
                if idx.shape[1] > 0:
                    lp[k] = quantize_int8_outliers(lp[k], idx)
                    continue
            lp[k] = quantize_int8(lp[k])
    out["layers"] = lp
    return out
