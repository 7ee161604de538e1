"""Linear-layer dispatch: dense jnp arrays or quantized Int4Weight.

The model core calls `matmul(x, w)` for every weight; quantized leaves route
to the fused Pallas INT4 kernel on TPU (ops/pallas/int4_matmul.py) or the
XLA dequant fallback elsewhere — the same role as the reference's
`get_linear` dispatch (reference: server/.../utils/layers.py:172-203 picking
exllama/triton/bnb implementations).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

import os

from .quant.int4 import Int4Weight, matmul_dequant, populate_q4, to_lane
from .quant.int8 import (Int8OutlierWeight, Int8Weight, matmul_int8,
                         matmul_int8_outliers)


class Int4Stacked(NamedTuple):
    """A single layer's view into a layer-STACKED s4 weight, resolved by a
    traced layer index instead of a slice. Inside a `lax.scan` over layers,
    feeding per-layer weight slices (scan xs) to a Pallas call forces XLA
    to MATERIALIZE each slice in HBM (slice read + slice write + kernel
    read ≈ 3x the weight traffic decode should pay). This ref keeps the
    stacked arrays whole — closed over the scan — and the kernel reads the
    layer's blocks directly via scalar-prefetch indexing
    (ops/pallas/int4_matmul.py::int4_matmul_s4_stacked).

    Not a jit-boundary type: constructed inside a trace by
    core._layer_scan via split_stacked_quant()'s rebuild fn."""
    q4: jax.Array            # [L, in, out] s4 (whole stack)
    sc_b: jax.Array          # [L, ni, gpb_pad, out] blocked scales
    zb_b: jax.Array          # [L, ni, gpb_pad, out] blocked zbias (s4-shifted)
    perm: Optional[jax.Array]  # [L, in] i32 act-order input perm, or None
    layer: jax.Array         # scalar i32 (traced) layer index
    groupsize: int
    out_features: int
    # natural [L, groups, out] scales/zbias (unblocked) — consumed by the
    # fused MLP kernel for the gu projection, whose whole-contraction
    # blocks need no gpb padding
    sc: Optional[jax.Array] = None
    zb: Optional[jax.Array] = None
    # MLP-blocked down-projection scales (Int4Weight.mlp_sc_b passthrough)
    mlp_sc_b: Optional[jax.Array] = None
    mlp_zb_b: Optional[jax.Array] = None


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _native_s4() -> bool:
    return os.getenv("INT4_NATIVE", "1").lower() not in ("0", "false")


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for dense or quantized w. x: [..., in] → [..., out]."""
    if isinstance(w, Int4Stacked):
        if w.perm is not None:
            p = jax.lax.dynamic_index_in_dim(w.perm, w.layer, 0,
                                             keepdims=False)
            x = jnp.take(x, p, axis=-1)
        from .pallas.int4_matmul import int4_matmul_s4_stacked

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        y = int4_matmul_s4_stacked(x2, w.q4, w.sc_b, w.zb_b, w.layer,
                                   groupsize=w.groupsize)
        return y.reshape(*lead, w.out_features)
    if isinstance(w, Int8Weight):
        return matmul_int8(x, w)
    if isinstance(w, Int8OutlierWeight):
        return matmul_int8_outliers(x, w)
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


_MLP_FUSE_MAX_ROWS = 64


def can_fuse_mlp(w_gu, w_down, activation: str, rows: int) -> bool:
    """True when the decode MLP pair can run as ONE Pallas kernel
    (int4_mlp_s4_stacked): both weights stacked s4, the down projection
    carrying MLP-blocked scales (prepare_params attached them for this
    row count), a GLU activation, no act-order perms, and a decode-size
    row count (the kernel holds x and the [S, H] accumulator in VMEM —
    prefill row counts would blow it, and prefill is MXU-bound anyway)."""
    if not (isinstance(w_gu, Int4Stacked) and isinstance(w_down, Int4Stacked)
            and w_gu.sc is not None and w_down.mlp_sc_b is not None
            and w_gu.perm is None and w_down.perm is None
            and activation in ("silu_glu", "gelu_glu")
            and rows <= _MLP_FUSE_MAX_ROWS
            and w_gu.out_features == 2 * w_down.q4.shape[1]):
        return False
    # the blocked layout must match the block pick for THIS row count
    # (a different caller, e.g. speculative verify, may see other rows)
    from .pallas.int4_matmul import _GPB_PAD, mlp_block_i

    L, inter, h = w_down.q4.shape
    s_pad = max(8, -(-rows // 8) * 8)
    bi = mlp_block_i(inter, h, w_down.groupsize, s_pad)
    gpb_pad = -(-(bi // w_down.groupsize) // _GPB_PAD) * _GPB_PAD
    return w_down.mlp_sc_b.shape == (L, inter // bi, gpb_pad, h)


def mlp_fused(x: jax.Array, w_gu: Int4Stacked, w_down: Int4Stacked,
              activation: str) -> jax.Array:
    """down(act(gate) * up) in one Pallas launch — see
    ops/pallas/int4_matmul.py::int4_mlp_s4_stacked."""
    from .pallas.int4_matmul import int4_mlp_s4_stacked

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    inter = w_down.q4.shape[1]
    y = int4_mlp_s4_stacked(
        x2, w_gu.q4, w_gu.sc, w_gu.zb, w_down.q4,
        w_down.mlp_sc_b, w_down.mlp_zb_b,
        w_gu.layer, inter=inter, groupsize_down=w_down.groupsize,
        activation=activation)
    return y.reshape(*lead, w_down.out_features)


def prepare_params(params, rows: Optional[int] = None):
    """Called INSIDE an engine step jit, before the layer scan: converts
    packed Int4Weight leaves to the native-s4 representation consumed by
    int4_matmul_s4 (~12x faster than the packed kernel). The unpack
    relayout runs once per dispatch — amortized over the whole decode
    chunk — instead of once per matmul. Persistent storage stays 4-bit
    packed: s4 arrays cannot cross jit boundaries on every backend.

    `rows` (the matmul row count of the step about to run, e.g. the slot
    count for decode) additionally precomputes the BLOCKED scale/zbias
    views the stacked scalar-prefetch kernel reads (Int4Weight.sc_b/zb_b)
    — once per dispatch here, instead of once per layer-scan iteration
    inside split_stacked_quant."""
    if not (_use_pallas() and _native_s4()) \
            or os.getenv("INT4_IMPL", "") == "packed":
        return params

    block_scales = rows is not None and _stacked_enabled()
    if block_scales:
        from .pallas.int4_matmul import prep_stacked_scales, stacked_blocks

    def conv(leaf):
        if isinstance(leaf, Int4Weight) and leaf.zbias is not None \
                and (leaf.qweight is not None or leaf.qlane is not None):
            leaf = populate_q4(leaf)
            if block_scales and leaf.q4 is not None and leaf.q4.ndim == 3:
                _, in_f, out_f = leaf.q4.shape
                gs = in_f // leaf.scales.shape[-2]
                bi, _bo = stacked_blocks(in_f, out_f, gs, rows)
                sc_b, zb_b = prep_stacked_scales(
                    leaf.scales, leaf.zbias, in_f, bi, gs)
                leaf = leaf._replace(sc_b=sc_b, zb_b=zb_b)
            return leaf
        return leaf

    out = jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, Int4Weight))
    if block_scales:
        out = _prepare_mlp_pair(out, rows)
    return out


def _prepare_mlp_pair(params, rows: int):
    """Attach MLP-fusion blocked down scales (Int4Weight.mlp_sc_b) when
    the layers dict holds a fusable stacked w_gu/w_down pair — once per
    dispatch, hoisted out of the layer scan like sc_b/zb_b.

    Default OFF: measured on v5e at the 7B decode shape (S=16), the fused
    kernel runs the MLP in 0.242 ms vs 0.238 for the two stacked GEMMs —
    the saved pipeline ramp does not pay for the narrower (block_i-wide)
    MXU dots, because the stacked GEMM kernel is weight-processing-bound,
    not launch-bound (scripts/probe_int4.py + /tmp probe history, r5).
    Kept as an A/B lever (INT4_FUSED_MLP=1)."""
    if os.getenv("INT4_FUSED_MLP", "0").lower() in ("0", "false") \
            or rows > _MLP_FUSE_MAX_ROWS or not isinstance(params, dict):
        return params
    layers = params.get("layers")
    if not isinstance(layers, dict):
        return params
    wgu, wd = layers.get("w_gu"), layers.get("w_down")
    if not (isinstance(wgu, Int4Weight) and isinstance(wd, Int4Weight)
            and wgu.q4 is not None and wgu.q4.ndim == 3
            and wd.q4 is not None and wd.q4.ndim == 3
            and wgu.perm is None and wd.perm is None):
        return params
    from .pallas.int4_matmul import mlp_block_i, prep_stacked_scales

    L, inter, h = wd.q4.shape
    gs_d = inter // wd.scales.shape[-2]
    s_pad = max(8, -(-rows // 8) * 8)
    bi = mlp_block_i(inter, h, gs_d, s_pad)
    sc_b, zb_b = prep_stacked_scales(wd.scales, wd.zbias, inter, bi, gs_d)
    layers = dict(layers)
    layers["w_down"] = wd._replace(mlp_sc_b=sc_b, mlp_zb_b=zb_b)
    out = dict(params)
    out["layers"] = layers
    return out


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
    return isinstance(w, (Int4Weight, Int8Weight, Int8OutlierWeight))


def _stacked_enabled() -> bool:
    return os.getenv("INT4_STACKED", "1").lower() not in ("0", "false")


def split_stacked_quant(layers, rows: int):
    """Prepare a layer-stacked param tree for a layer scan WITHOUT weight
    slices: layer-stacked s4 Int4Weight leaves are lifted out of the scan
    xs (replaced by a [L] placeholder) and re-presented per layer as
    Int4Stacked refs whose Pallas kernel indexes the whole stack by a
    scalar-prefetched layer id — no per-iteration dynamic-slice
    materialization (see Int4Stacked).

    `rows` must be the row count x will have at matmul time (the kernel's
    block pick keys on it). Returns None when nothing qualifies (no
    stacked q4 leaves, CPU backend, or INT4_STACKED=0) — callers then run
    the plain scan. Otherwise returns (dense_layers, num_layers, rebuild)
    where rebuild(sliced_dense_lp, layer_idx) -> the per-layer param tree
    to hand the layer body."""
    if not (_use_pallas() and _stacked_enabled()):
        return None

    def is_q(leaf):
        return isinstance(leaf, Int4Weight)

    leaves, treedef = jax.tree_util.tree_flatten(layers, is_leaf=is_q)
    refs = {}
    num_layers = None
    from .pallas.int4_matmul import prep_stacked_scales, stacked_blocks

    for i, leaf in enumerate(leaves):
        if not (is_q(leaf) and leaf.q4 is not None and leaf.q4.ndim == 3):
            continue
        lcount, in_f, out_f = leaf.q4.shape
        gs = in_f // leaf.scales.shape[-2]
        if leaf.sc_b is not None:
            # pre-blocked by prepare_params(rows=...) once per dispatch;
            # verify the block pick matches this call site's row count
            bi, _bo = stacked_blocks(in_f, out_f, gs, rows)
            if leaf.sc_b.shape[1] != in_f // bi:
                return None      # row-count mismatch: fall back to scan xs
            sc_b, zb_b = leaf.sc_b, leaf.zb_b
        else:
            # not pre-blocked: computed here, INSIDE the caller's trace —
            # loop-invariant but only hoisted out of a surrounding step
            # scan if XLA's LICM fires; engines should pass rows to
            # prepare_params instead
            bi, _bo = stacked_blocks(in_f, out_f, gs, rows)
            sc_b, zb_b = prep_stacked_scales(leaf.scales, leaf.zbias, in_f,
                                             bi, gs)
        refs[i] = (leaf.q4, sc_b, zb_b, leaf.perm, gs, out_f,
                   leaf.scales, leaf.zbias, leaf.mlp_sc_b, leaf.mlp_zb_b)
        num_layers = lcount
    if not refs:
        return None

    placeholder = jnp.zeros((num_layers,), jnp.int8)
    dense_leaves = [placeholder if i in refs else leaf
                    for i, leaf in enumerate(leaves)]
    dense_layers = jax.tree_util.tree_unflatten(treedef, dense_leaves)

    def rebuild(dlp, layer_idx):
        dl, td = jax.tree_util.tree_flatten(dlp, is_leaf=is_q)
        out = list(dl)
        for i, (q4, sc_b, zb_b, perm, gs, out_f, sc, zb,
                mlp_sc_b, mlp_zb_b) in refs.items():
            out[i] = Int4Stacked(q4=q4, sc_b=sc_b, zb_b=zb_b, perm=perm,
                                 layer=layer_idx, groupsize=gs,
                                 out_features=out_f, sc=sc, zb=zb,
                                 mlp_sc_b=mlp_sc_b, mlp_zb_b=mlp_zb_b)
        return jax.tree_util.tree_unflatten(td, out)

    return dense_layers, num_layers, rebuild
