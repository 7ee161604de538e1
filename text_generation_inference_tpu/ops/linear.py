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

import os

from .quant.int4 import Int4Weight, matmul_dequant, populate_q4
from .quant.int8 import Int8Weight, matmul_int8


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _native_s4() -> bool:
    return os.getenv("INT4_NATIVE", "1").lower() not in ("0", "false")


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for dense or quantized w. x: [..., in] → [..., out]."""
    if isinstance(w, Int8Weight):
        return matmul_int8(x, w)
    if isinstance(w, Int4Weight):
        if w.perm is not None:
            x = jnp.take(x, w.perm, axis=-1)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        impl = os.getenv("INT4_IMPL", "")     # perf A/B: force an impl
        if impl == "dequant":
            y = matmul_dequant(x2, w)
        elif _use_pallas() and w.q4 is not None and impl != "packed":
            from .pallas.int4_matmul import int4_matmul_s4

            y = int4_matmul_s4(x2, w)
        elif _use_pallas() and w.zbias is not None:
            from .pallas.int4_matmul import int4_matmul

            y = int4_matmul(x2, w)
        else:
            y = matmul_dequant(x2, w)
        return y.reshape(*lead, w.out_features)
    return jnp.dot(x, w)


def prepare_params(params):
    """Called INSIDE an engine step jit, before the layer scan: converts
    packed Int4Weight leaves to the native-s4 representation consumed by
    int4_matmul_s4 (~12x faster than the packed kernel). The unpack
    relayout runs once per dispatch — amortized over the whole decode
    chunk — instead of once per matmul. Persistent storage stays 4-bit
    packed: s4 arrays cannot cross jit boundaries on every backend."""
    if not (_use_pallas() and _native_s4()) \
            or os.getenv("INT4_IMPL", "") == "packed":
        return params

    def conv(leaf):
        if isinstance(leaf, Int4Weight) and leaf.qweight is not None                 and leaf.zbias is not None:
            return populate_q4(leaf)
        return leaf

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, Int4Weight))


def is_quantized(w) -> bool:
    return isinstance(w, (Int4Weight, Int8Weight))
