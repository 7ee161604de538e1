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

from .quant.int4 import Int4Weight, matmul_dequant, populate_q4, to_lane
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
        if _use_pallas() and w.q4 is None and w.qlane is not None:
            # defensive: lane storage without a prior prepare_params —
            # converts inside this trace (engines prepare once per
            # dispatch instead, amortizing over all matmuls)
            w = populate_q4(w)
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
        if isinstance(leaf, Int4Weight) and leaf.zbias is not None \
                and (leaf.qweight is not None or leaf.qlane is not None):
            return populate_q4(leaf)
        return leaf

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, Int4Weight))


def prepare_storage(params):
    """One-time at engine load: convert Int4Weight persistence to
    lane-major packed (qlane), making every subsequent in-jit q4
    conversion relayout-free (~8x cheaper on v5e). No-op off-TPU, under
    INT4_NATIVE=0, or for INT4_IMPL=packed/dequant A-B runs."""
    # default OFF: measured on v5e 7B (chunk 64) lane storage decodes at
    # 794 tok/s vs 805 row-major — the relayout-free qlane unpack did not
    # beat XLA's row-major conversion end-to-end, and the lane-built q4
    # feeds the kernel no faster. Kept as an A/B lever (INT4_LANE=1).
    if not (_use_pallas() and _native_s4()) \
            or os.getenv("INT4_IMPL", "") in ("packed", "dequant") \
            or os.getenv("INT4_LANE", "0").lower() in ("0", "false"):
        return params

    from .quant.int4 import pack_lane, unpack_rows

    # one jit call PER LAYER: a single traced conversion of a stacked
    # [L, in/8, out] leaf gives XLA license to schedule every layer's
    # unpacked int32 intermediate concurrently (~6 GB of temps on 7B),
    # fragmenting HBM before serving even starts
    one = jax.jit(lambda qw: pack_lane(unpack_rows(qw)))

    def conv(leaf):
        if isinstance(leaf, Int4Weight) and leaf.qweight is not None \
                and leaf.zbias is not None:
            if leaf.qweight.ndim == 3:
                qlane = jnp.stack([one(leaf.qweight[i])
                                   for i in range(leaf.qweight.shape[0])])
            else:
                qlane = one(leaf.qweight)
            return leaf._replace(qlane=qlane, qweight=None, qzeros=None)
        return leaf

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, Int4Weight))


def is_quantized(w) -> bool:
    return isinstance(w, (Int4Weight, Int8Weight))
