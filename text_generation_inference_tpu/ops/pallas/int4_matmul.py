"""Pallas TPU kernel: fused INT4 (GPTQ) dequant + matmul.

TPU equivalent of the reference's exllama v2 / triton GPTQ GEMMs
(reference: server/.../utils/gptq/exllamav2.py, utils/gptq/quant_linear.py:
104-246). Decode matmuls are HBM-bandwidth-bound on the weights, so keeping
them packed 4-bit in HBM and dequantizing in VMEM right before the MXU cuts
weight traffic 4x vs bf16 — the speed-of-light lever for quantized serving
(BASELINE.md north-star).

Dequant formulation: w = q * scale - zbias where zbias = (zero+1) * scale is
precomputed at load time (Int4Weight.zbias). This keeps the packed zeros out
of the kernel entirely — their natural block shapes violate TPU (8, 128)
tiling — and scale/zbias ride in as group-blocked operands padded to the
8-sublane minimum.

Supported layout: sequential group ids (g_idx[i] == i // groupsize). For
act-order checkpoints (shuffled g_idx) callers fall back to the XLA dequant
path, the same rule the reference applies to its exllama kernels under
act-order + TP (reference: utils/weights.py:150-156).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.int4 import Int4Weight, unpack_cols

_GPB_PAD = 8   # sublane minimum for the scale/zbias blocks


def _kernel(x_ref,        # [S, BI]
            qw_ref,       # [BI/8, BO] int32
            sc_ref,       # [1, GPB_PAD, BO] compute dtype
            zb_ref,       # [1, GPB_PAD, BO] compute dtype
            o_ref,        # [S, BO]
            acc_ref,      # VMEM [S, BO] f32
            *, block_in: int, groupsize: int, compute_dtype):
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qw = qw_ref[...]                                   # [BI/8, BO]
    bi8, bo = qw.shape
    shifts = (4 * jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1))
    q = ((qw[:, None, :] >> shifts) & 0xF)             # [BI/8, 8, BO]
    # group-dot formulation: y = sum_g scale_g * (x_g @ q_g) - xsum @ zbias.
    # The per-weight work is only unpack+convert; the scale FMA moves to the
    # [S, BO] partials and the zero term to one tiny [S, GPB] @ [GPB, BO]
    # matmul — ~40% fewer VPU ops than dequantizing w in place.
    qg = q.reshape(gpb, groupsize, bo).astype(compute_dtype)

    sc = sc_ref[0, :gpb, :]                            # [GPB, BO] (static slice)
    zb = zb_ref[0, :gpb, :]
    x = x_ref[...].astype(compute_dtype)               # [S, BI]
    xg = x.reshape(x.shape[0], gpb, groupsize)
    acc = jnp.zeros_like(acc_ref)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], qg[g],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, BO]
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)     # [S, GPB]
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_s4(x_ref,        # [S, BI]
               q4_ref,       # [BI, BO] int4 (q - 8, signed)
               sc_ref,       # [1, GPB_PAD, BO]
               zb_ref,       # [1, GPB_PAD, BO]  (zbias - 8*scale)
               o_ref,        # [S, BO]
               acc_ref,      # VMEM [S, BO] f32
               *, block_in: int, groupsize: int, compute_dtype,
               prescale: bool = True):
    """Native-s4 fused dequant+matmul: Mosaic reads the int4 array with no
    manual nibble unpack (the packed-int32 kernel's [BI/8, 8, BO] ->
    [BI, BO] reshape crosses sublanes and costs a full vector relayout —
    measured ~12x slower than this on v5e at the 4096x12288 shape).

    prescale=True multiplies the dequantized block by its per-group scales
    on the VPU and contracts the full BI depth in ONE MXU dot; False keeps
    one dot per 128-row group with the scale FMA on the [S, BO] partials
    (fewer VPU ops, but gpb small dots are MXU-latency-bound at decode
    batch sizes)."""
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q4_ref[...].astype(compute_dtype)              # [BI, BO]
    bo = w.shape[1]
    sc = sc_ref[0, :gpb, :]
    zb = zb_ref[0, :gpb, :]
    x = x_ref[...].astype(compute_dtype)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    if prescale:
        ws = (w.reshape(gpb, groupsize, bo)
              * sc[:, None, :].astype(compute_dtype)
              ).reshape(block_in, bo)
        acc = jax.lax.dot_general(
            x, ws, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, BO]
    else:
        wg = w.reshape(gpb, groupsize, bo)
        acc = jnp.zeros_like(acc_ref)
        for g in range(gpb):
            partial = jax.lax.dot_general(
                xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [S, BO]
            acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)     # [S, GPB]
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_s4_stacked(li_ref,       # scalar prefetch: [1] int32 layer id
                       x_ref,        # [S, BI]
                       q4_ref,       # [1, BI, BO] int4 (selected layer)
                       sc_ref,       # [1, 1, GPB_PAD, BO]
                       zb_ref,       # [1, 1, GPB_PAD, BO]
                       o_ref,        # [S, BO]
                       acc_ref,      # VMEM [S, BO] f32
                       *, block_in: int, groupsize: int, compute_dtype):
    """Stacked-weight variant of _kernel_s4: the whole [L, in, out] tensor
    rides in as one operand and the layer index arrives via scalar
    prefetch, so the per-layer block DMA reads HBM at the right offset
    directly. Motivation: inside a `lax.scan` over layers, per-iteration
    weight slices (scan xs) are dynamic-slices that XLA must MATERIALIZE
    before a custom call — tripling decode weight traffic (slice read +
    slice write + kernel read). Scalar-prefetch indexing removes the
    copy, which is the difference between ~3x and ~1x of the weight-read
    floor on the 7B INT4 chain (scripts/probe_int4.py scanstack/scanidx)."""
    del li_ref
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q4_ref[0].astype(compute_dtype)                # [BI, BO]
    bo = w.shape[1]
    sc = sc_ref[0, 0, :gpb, :]
    zb = zb_ref[0, 0, :gpb, :]
    x = x_ref[...].astype(compute_dtype)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    wg = w.reshape(gpb, groupsize, bo)
    acc = jnp.zeros_like(acc_ref)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, BO]
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)     # [S, GPB]
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _group_dot_s4(x, w4, sc, zb, groupsize, compute_dtype):
    """y = x @ dequant(w4) with per-group scales along the contraction dim:
    x [S, BI] (compute dtype), w4 [BI, BO] s4, sc/zb [BI/gs, BO] with the
    s4 zero-shift already folded (zb4 = zbias - 8*scale). Returns f32
    [S, BO] — the group-dot formulation of _kernel_s4 (one small MXU dot
    per 128-row group, scale FMA on the partials)."""
    bi, bo = w4.shape
    gpb = bi // groupsize
    w = w4.astype(compute_dtype)
    wg = w.reshape(gpb, groupsize, bo)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    acc = jnp.zeros((x.shape[0], bo), jnp.float32)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, BO]
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)     # [S, gpb]
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc


def _kernel_mlp_s4_stacked(li_ref,
                           x_ref,       # [S, H]
                           g4_ref,      # [1, H, BI] gate cols of gu stack
                           u4_ref,      # [1, H, BI] up cols of gu stack
                           gsc_ref,     # [1, GH, BI] gate scales
                           gzb_ref,     # [1, GH, BI] gate zbias
                           usc_ref,     # [1, GH, BI] up scales
                           uzb_ref,     # [1, GH, BI] up zbias
                           d4_ref,      # [1, BI, H] down rows
                           dsc_ref,     # [1, 1, GPB_PAD, H] down scales,
                                        #   pre-blocked + 8-sublane-padded
                                        #   (prep_stacked_scales; a raw
                                        #   gpb_d-row block would violate
                                        #   the 8-sublane block rule)
                           dzb_ref,     # [1, 1, GPB_PAD, H] (s4-shifted)
                           o_ref,       # [S, H]
                           acc_ref,     # VMEM [S, H] f32
                           *, gs_gu: int, gs_down: int, compute_dtype,
                           activation: str):
    """Whole GLU MLP — down(act(x@Wg) * (x@Wu)) — in ONE kernel: the grid
    walks blocks of the INTERMEDIATE dim; each iteration streams the
    block's gate/up columns and down rows, computes the activation in
    VMEM, and accumulates the down partial into the [S, H] accumulator.
    vs the 2-kernel path (gu GEMM + down GEMM) this saves one pipeline
    ramp per layer AND never materializes the [S, 2I] intermediate in HBM.
    Scales/zbias ride in their NATURAL [L, G, out] layout (blocks are
    whole-contraction here, so no gpb padding needed); the s4 zero-shift
    zb4 = zbias - 8*scale folds in on the VPU."""
    del li_ref
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(compute_dtype)               # [S, H]
    gsc = gsc_ref[0]
    gzb4 = gzb_ref[0] - 8.0 * gsc
    g = _group_dot_s4(x, g4_ref[0], gsc, gzb4, gs_gu, compute_dtype)
    usc = usc_ref[0]
    uzb4 = uzb_ref[0] - 8.0 * usc
    u = _group_dot_s4(x, u4_ref[0], usc, uzb4, gs_gu, compute_dtype)
    if activation == "silu_glu":
        a = g * jax.lax.logistic(g) * u                # silu(g) * u, f32
    else:                                              # gelu_glu
        a = jax.nn.gelu(g, approximate=True) * u
    gpb_d = d4_ref.shape[1] // gs_down
    dsc = dsc_ref[0, 0, :gpb_d, :]                     # static slice
    dzb4 = dzb_ref[0, 0, :gpb_d, :]                    # already s4-shifted
    acc_ref[...] += _group_dot_s4(a.astype(compute_dtype), d4_ref[0],
                                  dsc, dzb4, gs_down, compute_dtype)

    @pl.when(j == nj - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def mlp_block_i(inter: int, hidden: int, gs: int, s_pad: int) -> int:
    """Intermediate-dim block for int4_mlp_s4_stacked under the VMEM
    budget: gate + up column blocks ([H, BI] each) + down row block
    ([BI, H]) double-buffered, plus the f32 accumulator."""
    import os

    budget = int(os.getenv("INT4_MLP_BUDGET", str(12 * 1024 * 1024)))

    def vmem_bytes(bi):
        blocks = 3 * hidden * bi          # s4 ~1B/elem conservative
        scales = 2 * (hidden // gs) * bi * 4 * 2 + (bi // gs) * hidden * 4 * 2
        return (2 * blocks                # double-buffered weight blocks
                + scales
                + s_pad * hidden * 4      # accumulator
                + s_pad * hidden * 2      # x
                + 3 * s_pad * bi * 4)     # g/u/act temps
    best = gs
    bi = gs
    while bi <= inter:
        if inter % bi == 0 and vmem_bytes(bi) <= budget:
            best = bi
        bi += gs
    return best


def int4_mlp_s4_stacked(x: jax.Array, gu_q4: jax.Array, gu_sc: jax.Array,
                        gu_zb: jax.Array, d_q4: jax.Array,
                        d_sc_b: jax.Array, d_zb_b: jax.Array,
                        layer: jax.Array, *,
                        inter: int, groupsize_down: int,
                        activation: str = "silu_glu",
                        compute_dtype=jnp.bfloat16,
                        block_i: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """Fused GLU MLP over layer-stacked s4 weights with scalar-prefetch
    layer indexing: y = dequant(d)[act(x@dequant(g)) * (x@dequant(u))]
    where gu_q4 [L, H, 2*inter] holds gate columns [0:inter] and up
    columns [inter:] (models/fuse.py layout), d_q4 [L, inter, H].
    gu_sc/gu_zb [L, H/gs, 2*inter] are the NATURAL (unblocked) layouts
    (the gu blocks span the whole H contraction, so no sublane padding is
    needed); d_sc_b/d_zb_b come from prep_stacked_scales(d_scales,
    d_zbias, inter, mlp_block_i(...), gs) — blocked + 8-sublane-padded,
    s4 shift folded. Sequential g_idx only."""
    s, h = x.shape
    L, h2, i2 = gu_q4.shape
    assert h2 == h and i2 == 2 * inter, (gu_q4.shape, h, inter)
    gh = gu_sc.shape[1]
    gs_gu = h // gh
    gs_down = groupsize_down

    s_pad = max(8, -(-s // 8) * 8)
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    bi = block_i or mlp_block_i(inter, h, gs_down, s_pad)
    nj = inter // bi
    gpb_d = bi // gs_down
    gpb_d_pad = -(-gpb_d // _GPB_PAD) * _GPB_PAD
    assert d_sc_b.shape == (L, nj, gpb_d_pad, h), \
        (d_sc_b.shape, (L, nj, gpb_d_pad, h))
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    def x_index(j, li_ref):
        return (0, 0)

    def gate_index(j, li_ref):
        return (li_ref[0], 0, j)

    def up_index(j, li_ref):
        return (li_ref[0], 0, nj + j)

    def down_index(j, li_ref):
        return (li_ref[0], j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((s_pad, h), x_index),
            pl.BlockSpec((1, h, bi), gate_index),
            pl.BlockSpec((1, h, bi), up_index),
            pl.BlockSpec((1, gh, bi), gate_index),
            pl.BlockSpec((1, gh, bi), gate_index),
            pl.BlockSpec((1, gh, bi), up_index),
            pl.BlockSpec((1, gh, bi), up_index),
            pl.BlockSpec((1, bi, h), down_index),
            pl.BlockSpec((1, 1, gpb_d_pad, h),
                         lambda j, li_ref: (li_ref[0], j, 0, 0)),
            pl.BlockSpec((1, 1, gpb_d_pad, h),
                         lambda j, li_ref: (li_ref[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((s_pad, h), x_index),
        scratch_shapes=[pltpu.VMEM((s_pad, h), jnp.float32)],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel_mlp_s4_stacked, gs_gu=gs_gu,
                          gs_down=gs_down, compute_dtype=compute_dtype,
                          activation=activation),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, h), x.dtype),
        interpret=interpret,
    )
    y = kernel(li, x,
               gu_q4, gu_q4,
               gu_sc, gu_zb, gu_sc, gu_zb,
               d_q4, d_sc_b, d_zb_b)
    return y[:s] if s_pad != s else y


def prep_stacked_scales(scales: jax.Array, zbias: jax.Array, in_f: int,
                        block_in: int, groupsize: int,
                        compute_dtype=jnp.bfloat16) -> tuple[jax.Array,
                                                             jax.Array]:
    """Blocked scale/zbias layout for int4_matmul_s4_stacked: [L, groups,
    out] -> [L, ni, GPB_PAD, out] with the s4 zero-shift folded in
    (zb4 = zbias - 8*scale). Hoist this OUT of the layer scan (engines do
    it once per decode-chunk dispatch) so the reshape isn't re-traced per
    layer."""
    L, groups, out_f = scales.shape
    ni = in_f // block_in
    gpb = block_in // groupsize
    gpb_pad = -(-gpb // _GPB_PAD) * _GPB_PAD
    sc = scales.astype(compute_dtype).reshape(L, ni, gpb, out_f)
    zb4 = (zbias.astype(jnp.float32)
           - 8.0 * scales.astype(jnp.float32)).astype(compute_dtype)
    zb = zb4.reshape(L, ni, gpb, out_f)
    if gpb < gpb_pad:
        pad = ((0, 0), (0, 0), (0, gpb_pad - gpb), (0, 0))
        sc = jnp.pad(sc, pad)
        zb = jnp.pad(zb, pad)
    return sc, zb


def stacked_blocks(in_f: int, out_f: int, groupsize: int,
                   s: int) -> tuple[int, int]:
    """The (block_in, block_out) int4_matmul_s4_stacked will use for this
    shape — callers need it to prep scales via prep_stacked_scales."""
    return _auto_blocks(in_f, out_f, groupsize, max(8, -(-s // 8) * 8))


def int4_matmul_s4_stacked(x: jax.Array, q4: jax.Array, sc_blocked: jax.Array,
                           zb_blocked: jax.Array, layer: jax.Array, *,
                           groupsize: int,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jax.Array:
    """y = x @ dequant(q4[layer]) reading the layer's blocks directly from
    the stacked [L, in, out] s4 tensor (scalar-prefetch index; NO per-layer
    slice materialization — see _kernel_s4_stacked). sc/zb come
    pre-blocked from prep_stacked_scales. Sequential g_idx only."""
    s, in_f = x.shape
    L, in_q, out_f = q4.shape
    assert in_q == in_f
    block_in, block_out = stacked_blocks(in_f, out_f, groupsize, s)
    gpb = block_in // groupsize
    gpb_pad = -(-gpb // _GPB_PAD) * _GPB_PAD
    assert sc_blocked.shape == (L, in_f // block_in, gpb_pad, out_f), \
        (sc_blocked.shape, (L, in_f // block_in, gpb_pad, out_f))

    s_pad = max(8, -(-s // 8) * 8)
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    ni = in_f // block_in
    no = out_f // block_out

    li = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s_pad, block_in), lambda oi, ii, li: (0, ii)),
            pl.BlockSpec((1, block_in, block_out),
                         lambda oi, ii, li: (li[0], ii, oi)),
            pl.BlockSpec((1, 1, gpb_pad, block_out),
                         lambda oi, ii, li: (li[0], ii, 0, oi)),
            pl.BlockSpec((1, 1, gpb_pad, block_out),
                         lambda oi, ii, li: (li[0], ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s_pad, block_out),
                               lambda oi, ii, li: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s_pad, block_out), jnp.float32)],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel_s4_stacked, block_in=block_in,
                          groupsize=groupsize, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, out_f), x.dtype),
        interpret=interpret,
    )
    y = kernel(li, x, q4, sc_blocked, zb_blocked)
    return y[:s] if s_pad != s else y


def _auto_blocks(in_f: int, out_f: int, groupsize: int,
                 s_pad: int) -> tuple[int, int]:
    """Pick (block_in, block_out) minimizing the grid-iteration count under
    a VMEM working-set budget. Per-iteration fixed cost dominates decode
    matmuls at small batch (S=16 rows): the legacy 512x1024 blocking ran a
    7B decode step in ~15k grid iterations (~15 ms of pure overhead);
    budget-capped maximal blocks cut that ~15x. Divisor-constrained: both
    blocks must divide their axes (block_in a multiple of groupsize). The
    estimate covers double-buffered q4/x/out/scale blocks plus the f32
    accumulator, so large-row (prefill) dispatches shrink blocks instead
    of blowing the ~16 MB scoped-vmem stack limit."""
    import os

    budget = int(os.getenv("INT4_BLOCK_BUDGET", str(12 * 1024 * 1024)))
    cap_out = int(os.getenv("INT4_BLOCK_OUT", "8192"))

    def vmem_bytes(bi, bo):
        gpb_pad = -(-(bi // groupsize) // _GPB_PAD) * _GPB_PAD
        return (bi * bo                      # q4 nibbles, double-buffered
                + bi * bo * 2                # dequantized bf16 block temp
                + 2 * s_pad * bi * 2         # x blocks (bf16, dbl)
                + 2 * s_pad * bo * 2         # out blocks (dbl)
                + s_pad * bo * 4             # f32 accumulator
                + 4 * gpb_pad * bo * 2)      # sc + zb (bf16, dbl)

    if out_f % 128 != 0:
        bo_candidates = [out_f]
    else:
        bo_candidates = [d for d in range(128, min(cap_out, out_f) + 1, 128)
                         if out_f % d == 0]
    best = None
    for bo in bo_candidates:
        bi = groupsize
        d = groupsize
        while d <= in_f:
            if in_f % d == 0 and vmem_bytes(d, bo) <= budget:
                bi = d
            d += groupsize
        if vmem_bytes(bi, bo) > budget:
            continue
        iters = (in_f // bi) * (out_f // bo)
        key = (iters, -bo)
        if best is None or key < best[0]:
            best = (key, bi, bo)
    if best is None:                         # tiny budget: smallest blocks
        return groupsize, (128 if out_f % 128 == 0 else out_f)
    return best[1], best[2]


def int4_matmul_s4(x: jax.Array, w: Int4Weight, *,
                   block_in: int | None = None,
                   block_out: int | None = None,
                   compute_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w) via the native-s4 representation (w.q4 set by
    quant.int4.populate_q4, typically inside the consuming jit so the
    relayout is paid once per decode chunk). Sequential g_idx only.
    Blocks default to the VMEM-budget auto-pick (_auto_blocks)."""
    assert w.q4 is not None and w.zbias is not None
    s, in_f = x.shape
    out_f = w.out_features
    groups = w.scales.shape[0]
    groupsize = in_f // groups
    if block_in is None and block_out is None:
        block_in, block_out = _auto_blocks(in_f, out_f, groupsize,
                                           max(8, -(-s // 8) * 8))
    else:
        block_in = _largest_divisor(in_f, groupsize,
                                    min(block_in or 512, in_f))
        block_out = _largest_divisor(out_f, 128,
                                     min(block_out or 1024, out_f)) \
            if out_f % 128 == 0 else out_f
    gpb = block_in // groupsize
    gpb_pad = -(-gpb // _GPB_PAD) * _GPB_PAD

    s_pad = max(8, -(-s // 8) * 8)
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    ni = in_f // block_in
    no = out_f // block_out

    sc = w.scales.astype(compute_dtype).reshape(ni, gpb, out_f)
    zb4 = (w.zbias.astype(jnp.float32)
           - 8.0 * w.scales.astype(jnp.float32)).astype(compute_dtype)
    zb = zb4.reshape(ni, gpb, out_f)
    if gpb < gpb_pad:
        pad = ((0, 0), (0, gpb_pad - gpb), (0, 0))
        sc = jnp.pad(sc, pad)
        zb = jnp.pad(zb, pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s_pad, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, gpb_pad, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, gpb_pad, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s_pad, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s_pad, block_out), jnp.float32)],
    )
    import os

    # measured on v5e (7B noattn probe): prescale 18.4 vs group-dot
    # 15.7 ms/step — the whole-block VPU scale costs more than the
    # per-group small dots save; default stays group-dot
    prescale = os.getenv("INT4_PRESCALE", "0").lower() not in ("0", "false")
    kernel = pl.pallas_call(
        functools.partial(_kernel_s4, block_in=block_in, groupsize=groupsize,
                          compute_dtype=compute_dtype, prescale=prescale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, out_f), x.dtype),
        interpret=interpret,
    )
    y = kernel(x, w.q4, sc, zb)
    return y[:s] if s_pad != s else y


def _largest_divisor(n: int, multiple: int, cap: int) -> int:
    """Largest divisor of n that is a multiple of `multiple` and <= cap."""
    best = multiple
    d = multiple
    while d <= cap:
        if n % d == 0:
            best = d
        d += multiple
    return best


def int4_matmul(x: jax.Array, w: Int4Weight, *, block_in: int = 512,
                block_out: int = 512, compute_dtype=jnp.float32,
                interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w). x: [S, in] → [S, out]. Sequential g_idx only;
    requires w.zbias (populated by the loaders / quantizers)."""
    assert w.zbias is not None, "int4_matmul requires precomputed zbias"
    s, in_f = x.shape
    out_f = w.out_features
    groups = w.scales.shape[0]
    groupsize = in_f // groups
    block_in = _largest_divisor(in_f, groupsize, min(block_in, in_f))
    block_out = _largest_divisor(out_f, 128, min(block_out, out_f)) \
        if out_f % 128 == 0 else out_f
    gpb = block_in // groupsize
    assert gpb <= _GPB_PAD, f"group rows per block {gpb} > {_GPB_PAD}"

    # row dim must satisfy the (8, 128) sublane tile: pad small batches
    s_pad = max(8, -(-s // 8) * 8)
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    ni = in_f // block_in
    no = out_f // block_out

    # group-blocked scale/zbias: [ni, GPB_PAD, out] (padded rows unused)
    sc = w.scales.astype(compute_dtype).reshape(ni, gpb, out_f)
    zb = w.zbias.astype(compute_dtype).reshape(ni, gpb, out_f)
    if gpb < _GPB_PAD:
        pad = ((0, 0), (0, _GPB_PAD - gpb), (0, 0))
        sc = jnp.pad(sc, pad)
        zb = jnp.pad(zb, pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s_pad, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in // 8, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, _GPB_PAD, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, _GPB_PAD, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s_pad, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s_pad, block_out), jnp.float32)],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, block_in=block_in, groupsize=groupsize,
                          compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, out_f), x.dtype),
        interpret=interpret,
    )
    y = kernel(x, w.qweight, sc, zb)
    return y[:s] if s_pad != s else y


def is_sequential_gidx(w: Int4Weight) -> bool:
    groups = w.scales.shape[0]
    groupsize = w.in_features // groups
    expected = jnp.arange(w.in_features, dtype=jnp.int32) // groupsize
    return bool(jnp.all(w.g_idx == expected))
