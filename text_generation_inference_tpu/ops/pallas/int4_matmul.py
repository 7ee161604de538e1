"""Pallas TPU kernel: fused INT4 (GPTQ) dequant + matmul.

TPU equivalent of the reference's exllama v2 / triton GPTQ GEMMs
(reference: server/.../utils/gptq/exllamav2.py, utils/gptq/quant_linear.py:
104-246). Decode matmuls are HBM-bandwidth-bound on the weights, so keeping
them packed 4-bit in HBM and dequantizing in VMEM right before the MXU cuts
weight traffic 4x vs bf16 — the speed-of-light lever for quantized serving
(BASELINE.md north-star).

Tiling notes: qweight blocks are (block_in/8, block_out) — both dims
MXU-aligned; qzeros/scales are small and ride along as FULL arrays in VMEM
(their natural per-block shapes violate the (8, 128) tile minimum), with the
kernel slicing the group rows it needs.

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

from ..quant.int4 import Int4Weight


def _kernel(x_ref,        # [S, BI]
            qw_ref,       # [BI/8, BO] int32
            qz_ref,       # FULL [groups, out/8] int32 (VMEM)
            sc_ref,       # FULL [groups, out] f32 (VMEM)
            o_ref,        # [S, BO]
            acc_ref,      # VMEM [S, BO] f32
            *, block_in: int, block_out: int, groupsize: int):
    oi = pl.program_id(0)
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
    q = q.reshape(block_in, bo)

    qz = qz_ref[pl.ds(ii * gpb, gpb), pl.ds(oi * (block_out // 8),
                                            block_out // 8)]
    zshifts = (4 * jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2))
    z = ((qz[:, :, None] >> zshifts) & 0xF).reshape(gpb, bo) + 1

    sc = sc_ref[pl.ds(ii * gpb, gpb), pl.ds(oi * block_out, block_out)]
    sc = sc.astype(jnp.float32)                        # [GPB, BO]
    qg = q.reshape(gpb, groupsize, bo)
    w = ((qg - z[:, None, :]).astype(jnp.float32)
         * sc[:, None, :]).reshape(block_in, bo)

    x = x_ref[...].astype(jnp.float32)                 # [S, BI]
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul(x: jax.Array, w: Int4Weight, *, block_in: int = 512,
                block_out: int = 512, interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w). x: [S, in] → [S, out]. Sequential g_idx only."""
    s, in_f = x.shape
    out_f = w.out_features
    groups = w.scales.shape[0]
    groupsize = in_f // groups
    block_in = min(block_in, in_f)
    block_out = min(block_out, out_f)
    if block_in % groupsize != 0 and groupsize % block_in != 0:
        block_in = groupsize
    if block_in % groupsize != 0:
        block_in = groupsize
    # row dim must satisfy the (8, 128) sublane tile: pad small batches
    s_pad = max(8, -(-s // 8) * 8)
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    ni = pl.cdiv(in_f, block_in)
    no = pl.cdiv(out_f, block_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s_pad, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in // 8, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qzeros (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales (full)
        ],
        out_specs=pl.BlockSpec((s_pad, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s_pad, block_out), jnp.float32)],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, block_in=block_in, block_out=block_out,
                          groupsize=groupsize),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, out_f), x.dtype),
        interpret=interpret,
    )
    y = kernel(x, w.qweight, w.qzeros, w.scales.astype(jnp.float32))
    return y[:s] if s_pad != s else y


def is_sequential_gidx(w: Int4Weight) -> bool:
    groups = w.scales.shape[0]
    groupsize = w.in_features // groups
    expected = jnp.arange(w.in_features, dtype=jnp.int32) // groupsize
    return bool(jnp.all(w.g_idx == expected))
