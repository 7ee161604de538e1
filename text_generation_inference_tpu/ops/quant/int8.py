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

LLM.int8's mixed-precision outlier decomposition is deliberately not
replicated: it exists to preserve quality on >6.7B models under *activation*
outliers; weight-only per-channel int8 has no activation quantization, so
there is no outlier pathway to decompose. (Divergence documented in
README/PARITY.)
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


LINEAR_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "w_qkv", "w_gu", "wi", "wi_0", "wi_1")


def quantize_layer_params(params: dict) -> dict:
    """Quantize every stacked linear in params['layers'] to Int8Weight
    (embeddings / lm_head / norms stay full precision, matching the
    reference's Linear8bitLt placement)."""
    out = dict(params)
    lp = dict(params["layers"])
    for k in list(lp):
        if k in LINEAR_KEYS and isinstance(lp[k], jax.Array):
            lp[k] = quantize_int8(lp[k])
    out["layers"] = lp
    return out
