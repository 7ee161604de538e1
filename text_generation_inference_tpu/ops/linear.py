"""Linear-layer dispatch: dense jnp arrays or quantized Int4Weight.

The model core calls `matmul(x, w)` for every weight; quantized leaves route
to the fused Pallas INT4 kernel on TPU (ops/pallas/int4_matmul.py) or the
XLA dequant fallback elsewhere — the same role as the reference's
`get_linear` dispatch (reference: server/.../utils/layers.py:172-203 picking
exllama/triton/bnb implementations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant.int4 import Int4Weight, matmul_dequant


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for dense or quantized w. x: [..., in] → [..., out]."""
    if isinstance(w, Int4Weight):
        if w.perm is not None:
            x = jnp.take(x, w.perm, axis=-1)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if _use_pallas() and w.zbias is not None:
            from .pallas.int4_matmul import int4_matmul

            y = int4_matmul(x2, w)
        else:
            y = matmul_dequant(x2, w)
        return y.reshape(*lead, w.out_features)
    return jnp.dot(x, w)


def is_quantized(w) -> bool:
    return isinstance(w, Int4Weight)
