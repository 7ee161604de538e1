"""INT4 matmul kernel variants on the real chip.

50M-weight decode matmul (4096x12288, groupsize 128, S=16) — the ROADMAP
north-star shape. SOL at 819GB/s reading 4-bit weights = ~31us; round-1
kernel measures ~1.1ms (VPU relayout-bound: the [BI/8, 8, BO] nibble unpack
crosses sublanes).

Variants:
  current   round-1 int4_matmul kernel
  xla8      x @ w8.astype(bf16): int8 weights in HBM, XLA convert-on-read
  pallas8   Pallas kernel, int8 weight blocks, convert + group-dot in VMEM
  pallas4   Pallas kernel, NATIVE jnp.int4 weight blocks (s4 ref)
  bitcast   Pallas kernel, int32 lane-major packed, in-kernel bitcast to s4

Usage: PYTHONPATH=... python scripts/probe_int4.py current xla8 pallas8 ...
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S, IN_F, OUT_F, GS = 16, 4096, 12288, 128
CALLS = 8


CHAIN = 64


def _chain(fn, extra_args):
    """Wrap fn(x, *extra) into a CHAIN-long dependent loop inside ONE jit:
    the remote-tunnel fetch (~33ms fixed) is paid once, not per call."""

    def run(x, *extra):
        def body(x, _):
            y = fn(x, *extra)
            return y[:, :IN_F].astype(x.dtype) * 1e-3, None

        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x

    return jax.jit(run)


def _time(fn, x, *extra):
    g = _chain(fn, extra)
    y = g(x, *extra)
    np.asarray(y[0, 0])          # compile + sync
    t0 = time.perf_counter()
    for _ in range(CALLS):
        y = g(x, *extra)
        np.asarray(y[0, 0])
    total = (time.perf_counter() - t0) / CALLS
    return (total * 1e3 - 33.0) / CHAIN   # strip the ~33ms tunnel fetch


def make_int4weight(rng):
    from text_generation_inference_tpu.ops.quant.int4 import Int4Weight

    groups = IN_F // GS
    return Int4Weight(
        qweight=jnp.asarray(rng.integers(-2**31, 2**31,
                                         size=(IN_F // 8, OUT_F),
                                         dtype=np.int64).astype(np.int32)),
        qzeros=jnp.asarray(rng.integers(-2**31, 2**31,
                                        size=(groups, OUT_F // 8),
                                        dtype=np.int64).astype(np.int32)),
        scales=jnp.asarray(rng.normal(scale=0.01,
                                      size=(groups, OUT_F)).astype(np.float32)),
        g_idx=jnp.asarray((np.arange(IN_F) // GS).astype(np.int32)),
        perm=None,
        zbias=jnp.asarray(rng.normal(scale=0.05,
                                     size=(groups, OUT_F)).astype(np.float32)),
    )


# ---- pallas8 / pallas4: weight rows contiguous, scale via group-dot ------

def _k_rows(x_ref, w_ref, sc_ref, zb_ref, o_ref, acc_ref, *,
            block_in, groupsize):
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)          # [BI, BO]
    bo = w.shape[1]
    sc = sc_ref[0, :gpb, :]
    zb = zb_ref[0, :gpb, :]
    x = x_ref[...].astype(jnp.bfloat16)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    wg = w.reshape(gpb, groupsize, bo)
    acc = jnp.zeros_like(acc_ref)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def rows_kernel(x, w_rows, sc, zb, block_in=512, block_out=1024):
    s, in_f = x.shape
    out_f = w_rows.shape[1]
    gpb = block_in // GS
    ni, no = in_f // block_in, out_f // block_out
    scb = sc.reshape(ni, gpb, out_f)
    zbb = zb.reshape(ni, gpb, out_f)
    pad = ((0, 0), (0, 8 - gpb), (0, 0)) if gpb < 8 else None
    if pad:
        scb = jnp.pad(scb, pad)
        zbb = jnp.pad(zbb, pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s, block_out), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_k_rows, block_in=block_in, groupsize=GS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_f), x.dtype),
    )(x, w_rows, scb, zbb)


# ---- lane: int32 lane-major packed, in-kernel shift/mask unpack ----------

def _k_lane(x_ref, qw_ref, sc_ref, zb_ref, o_ref, acc_ref, *,
            block_in, groupsize):
    """qw_ref [BI, BO/8] int32, 8 OUT-neighbors per word little-nibble.
    The unpack reshape [BI, BO/8, 8] -> [BI, BO] merges MINOR dims (both in
    lanes), unlike the row-major kernel's cross-sublane merge."""
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qw = qw_ref[...]                                  # [BI, BO/8] int32
    shifts = 4 * jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    q = ((qw[:, :, None] >> shifts) & 0xF) - 8        # [BI, BO/8, 8]
    w = q.reshape(qw.shape[0], qw.shape[1] * 8).astype(jnp.bfloat16)
    bo = w.shape[1]
    sc = sc_ref[0, :gpb, :]
    zb = zb_ref[0, :gpb, :]
    x = x_ref[...].astype(jnp.bfloat16)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    wg = w.reshape(gpb, groupsize, bo)
    acc = jnp.zeros_like(acc_ref)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def lane_kernel(x, qw_lane, sc, zb, block_in=512, block_out=1024):
    s, in_f = x.shape
    out_f = qw_lane.shape[1] * 8
    gpb = block_in // GS
    ni, no = in_f // block_in, out_f // block_out
    scb = sc.reshape(ni, gpb, out_f)
    zbb = zb.reshape(ni, gpb, out_f)
    if gpb < 8:
        scb = jnp.pad(scb, ((0, 0), (0, 8 - gpb), (0, 0)))
        zbb = jnp.pad(zbb, ((0, 0), (0, 8 - gpb), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in, block_out // 8), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s, block_out), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_k_lane, block_in=block_in, groupsize=GS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_f), x.dtype),
    )(x, qw_lane, scb, zbb)


# ---- scalew: dequant + pre-scale in VMEM, ONE deep dot per block ---------

def _k_scalew(x_ref, w4_ref, sc_ref, zb_ref, o_ref, acc_ref, *,
              block_in, groupsize):
    """Instead of one MXU dot per 128-row group (gpb small dots, latency-
    bound at S=16), dequantize AND scale the whole [BI, BO] block on the
    VPU, then contract the full BI depth in a single dot."""
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w4_ref[...].astype(jnp.bfloat16)              # [BI, BO]
    bo = w.shape[1]
    sc = sc_ref[0, :gpb, :]                           # [GPB, BO]
    w = (w.reshape(gpb, groupsize, bo)
         * sc[:, None, :].astype(jnp.bfloat16)).reshape(block_in, bo)
    x = x_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [S, BO]
    zb = zb_ref[0, :gpb, :]
    xg = x.reshape(x.shape[0], gpb, groupsize)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def scalew_kernel(x, w4, sc, zb, block_in=2048, block_out=2048):
    s, in_f = x.shape
    out_f = w4.shape[1]
    gpb = block_in // GS
    gpb_pad = -(-gpb // 8) * 8
    ni, no = in_f // block_in, out_f // block_out
    scb = sc.reshape(ni, gpb, out_f)
    zbb = zb.reshape(ni, gpb, out_f)
    if gpb < gpb_pad:
        scb = jnp.pad(scb, ((0, 0), (0, gpb_pad - gpb), (0, 0)))
        zbb = jnp.pad(zbb, ((0, 0), (0, gpb_pad - gpb), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, gpb_pad, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, gpb_pad, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s, block_out), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_k_scalew, block_in=block_in, groupsize=GS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_f), x.dtype),
    )(x, w4, scb, zbb)


# ---- bitcast: int32 lane-major packed, in-kernel bitcast -----------------

def _k_bitcast(x_ref, qw_ref, sc_ref, zb_ref, o_ref, acc_ref, *,
               block_in, groupsize):
    ii = pl.program_id(1)
    ni = pl.num_programs(1)
    gpb = block_in // groupsize

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qw = qw_ref[...]                              # [BI, BO/8] int32
    q4 = jax.lax.bitcast_convert_type(qw, jnp.int4)   # [BI, BO/8, 8]
    w = q4.reshape(qw.shape[0], qw.shape[1] * 8).astype(jnp.bfloat16)
    bo = w.shape[1]
    sc = sc_ref[0, :gpb, :]
    zb = zb_ref[0, :gpb, :]
    x = x_ref[...].astype(jnp.bfloat16)
    xg = x.reshape(x.shape[0], gpb, groupsize)
    wg = w.reshape(gpb, groupsize, bo)
    acc = jnp.zeros_like(acc_ref)
    for g in range(gpb):
        partial = jax.lax.dot_general(
            xg[:, g, :], wg[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * sc[g][None, :].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    acc = acc - jax.lax.dot_general(
        xsum, zb.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(ii == ni - 1)
    def _finish():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def bitcast_kernel(x, qw_lane, sc, zb, block_in=512, block_out=1024):
    s, in_f = x.shape
    out_f = qw_lane.shape[1] * 8
    gpb = block_in // GS
    ni, no = in_f // block_in, out_f // block_out
    scb = sc.reshape(ni, gpb, out_f)
    zbb = zb.reshape(ni, gpb, out_f)
    if gpb < 8:
        scb = jnp.pad(scb, ((0, 0), (0, 8 - gpb), (0, 0)))
        zbb = jnp.pad(zbb, ((0, 0), (0, 8 - gpb), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(no, ni),
        in_specs=[
            pl.BlockSpec((s, block_in), lambda oi, ii: (0, ii)),
            pl.BlockSpec((block_in, block_out // 8), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
            pl.BlockSpec((1, 8, block_out), lambda oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((s, block_out), lambda oi, ii: (0, oi)),
        scratch_shapes=[pltpu.VMEM((s, block_out), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_k_bitcast, block_in=block_in, groupsize=GS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_f), x.dtype),
    )(x, qw_lane, scb, zbb)


def _probe_persistent_s4():
    """Can a persistent s4 array feed a pallas kernel across jit calls?"""
    rng = np.random.default_rng(1)
    w8 = jnp.asarray(rng.integers(-8, 8, size=(IN_F, OUT_F),
                                  dtype=np.int64).astype(np.int8))
    w4 = jax.jit(lambda a: a.astype(jnp.int4))(w8)
    sc = jnp.asarray(rng.normal(size=(IN_F // GS, OUT_F)).astype(np.float32))
    zb = jnp.asarray(rng.normal(size=(IN_F // GS, OUT_F)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(S, IN_F)).astype(np.float32)).astype(
        jnp.bfloat16)
    ms = _time(rows_kernel, x, w4, sc, zb)
    return ms


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, IN_F)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    results = {}
    for variant in sys.argv[1:]:
        try:
            if variant == "current":
                from text_generation_inference_tpu.ops.pallas.int4_matmul \
                    import int4_matmul

                w = make_int4weight(rng)
                fn = lambda x: int4_matmul(x, w, compute_dtype=jnp.bfloat16)
                ms = _time(fn, x)
            elif variant == "xla8":
                w8 = jnp.asarray(rng.integers(
                    -8, 8, size=(IN_F, OUT_F), dtype=np.int64)
                    .astype(np.int8))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))

                def f(x, w8, sc):
                    w = w8.astype(jnp.bfloat16).reshape(
                        IN_F // GS, GS, OUT_F)
                    w = (w * sc[:, None, :].astype(jnp.bfloat16)).reshape(
                        IN_F, OUT_F)
                    return x @ w
                ms = _time(f, x, w8, sc)
            elif variant == "pallas8":
                w8 = jnp.asarray(rng.integers(
                    -8, 8, size=(IN_F, OUT_F), dtype=np.int64)
                    .astype(np.int8))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                zb = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                ms = _time(rows_kernel, x, w8, sc, zb)
            elif variant == "pallas4":
                w8 = jnp.asarray(rng.integers(
                    -8, 8, size=(IN_F, OUT_F), dtype=np.int64)
                    .astype(np.int8))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                zb = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))

                # convert + kernel inside ONE jit (device_put of s4 across
                # jit boundaries recurses under the axon plugin)
                def f(x, w8, s_, z_):
                    return rows_kernel(x, w8.astype(jnp.int4), s_, z_)
                ms = _time(f, x, w8, sc, zb)
            elif variant == "lane":
                qw = jnp.asarray(rng.integers(
                    -2**31, 2**31, size=(IN_F, OUT_F // 8),
                    dtype=np.int64).astype(np.int32))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                zb = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                ms = _time(lane_kernel, x, qw, sc, zb)
            elif variant == "bitcast":
                qw = jnp.asarray(rng.integers(
                    -2**31, 2**31, size=(IN_F, OUT_F // 8),
                    dtype=np.int64).astype(np.int32))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                zb = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                ms = _time(bitcast_kernel, x, qw, sc, zb)
            elif variant in ("scanstack", "unrollL", "scanidx"):
                # Layer-loop structure A/B: does feeding stacked weights
                # through lax.scan xs (per-iteration dynamic-slice ->
                # materialized copy before the custom call) triple decode
                # weight traffic vs reading them in place?
                #   scanstack — engine's current shape: scan over stacked
                #               leaves, int4_matmul_s4 on the slice
                #   unrollL   — Python loop over L separate persistent
                #               per-layer arrays (no slicing at all)
                #   scanidx   — scan over the layer INDEX; stacked kernel
                #               reads blocks via scalar-prefetch indexing
                # s4 conversion happens INSIDE the jit, hoisted above the
                # layer loop (exactly the engine's prepare_params shape):
                # persistent s4 arrays cannot cross jit boundaries on this
                # backend (UNIMPLEMENTED at transfer). KREP repeats amortize
                # the conversion to ~1/KREP of a matmul per matmul.
                from text_generation_inference_tpu.ops.pallas.int4_matmul \
                    import (int4_matmul_s4, int4_matmul_s4_stacked,
                            prep_stacked_scales, stacked_blocks)
                from text_generation_inference_tpu.ops.quant.int4 \
                    import Int4Weight

                # KREP x LST = 512 matmuls/call: the ~33 ms tunnel fetch
                # amortizes to ~0.06 ms/matmul (at 8x8 it was ~0.5 ms —
                # bigger than the kernel itself, burying the comparison)
                LST, KREP = 8, 64
                w8s = jnp.asarray(rng.integers(
                    -8, 8, size=(LST, IN_F, OUT_F),
                    dtype=np.int64).astype(np.int8))
                scs = jnp.asarray(rng.normal(
                    size=(LST, IN_F // GS, OUT_F)).astype(np.float32))
                zbs = jnp.asarray(rng.normal(
                    size=(LST, IN_F // GS, OUT_F)).astype(np.float32))

                def mk_w(q4, sc, zb):
                    return Int4Weight(qweight=None, qzeros=None, scales=sc,
                                      g_idx=None, zbias=zb, q4=q4)

                # weights ride as jit ARGUMENTS (closure-captured concrete
                # arrays bake into the HLO as literals — a 400 MB compile
                # payload the remote-compile tunnel rejects with HTTP 413)
                if variant == "scanstack":
                    def f(x, w8s, scs, zbs):
                        q4s = w8s.astype(jnp.int4)

                        def body(x, inputs):
                            q4, sc, zb = inputs
                            y = int4_matmul_s4(x, mk_w(q4, sc, zb))
                            return (y[:, :IN_F] * 1e-3).astype(x.dtype), None

                        def rep(x, _):
                            x, _ = jax.lax.scan(body, x, (q4s, scs, zbs))
                            return x, None
                        x, _ = jax.lax.scan(rep, x, None, length=KREP)
                        return x

                    extra = (w8s, scs, zbs)
                elif variant == "unrollL":
                    def f(x, w8s, scs, zbs):
                        per_layer = [
                            mk_w(w8s[l].astype(jnp.int4), scs[l], zbs[l])
                            for l in range(LST)]
                        for _ in range(KREP):
                            for w in per_layer:
                                y = int4_matmul_s4(x, w)
                                x = (y[:, :IN_F] * 1e-3).astype(x.dtype)
                        return x

                    extra = (w8s, scs, zbs)
                else:  # scanidx
                    bi, _bo = stacked_blocks(IN_F, OUT_F, GS, S)
                    sc_b, zb_b = prep_stacked_scales(scs, zbs, IN_F, bi, GS)

                    def f(x, w8s, sc_b, zb_b):
                        q4s = w8s.astype(jnp.int4)

                        def body(x, li):
                            y = int4_matmul_s4_stacked(
                                x, q4s, sc_b, zb_b, li, groupsize=GS)
                            return (y[:, :IN_F] * 1e-3).astype(x.dtype), None

                        def rep(x, _):
                            x, _ = jax.lax.scan(
                                body, x, jnp.arange(LST, dtype=jnp.int32))
                            return x, None
                        x, _ = jax.lax.scan(rep, x, None, length=KREP)
                        return x

                    extra = (w8s, sc_b, zb_b)

                g = jax.jit(f)
                y = g(x, *extra)
                np.asarray(y[0, 0])
                t0 = time.perf_counter()
                for _ in range(CALLS):
                    y = g(x, *extra)
                    np.asarray(y[0, 0])
                # per-matmul ms (LST*KREP matmuls per call)
                ms = (time.perf_counter() - t0) / CALLS / (LST * KREP) * 1e3
            elif variant == "pallas4p":
                ms = _probe_persistent_s4()
            elif variant == "reals4":
                from text_generation_inference_tpu.ops.pallas.int4_matmul \
                    import int4_matmul_s4
                from text_generation_inference_tpu.ops import linear as lo

                w = make_int4weight(rng)

                def f(x, qw, sc, zb):
                    ww = lo.prepare_params(
                        w._replace(qweight=qw, scales=sc, zbias=zb))
                    return int4_matmul_s4(x, ww)
                ms = _time(f, x, w.qweight, w.scales, w.zbias)
            elif variant == "scalew":
                w8 = jnp.asarray(rng.integers(
                    -8, 8, size=(IN_F, OUT_F), dtype=np.int64)
                    .astype(np.int8))
                sc = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))
                zb = jnp.asarray(rng.normal(
                    size=(IN_F // GS, OUT_F)).astype(np.float32))

                def f(x, w8, s_, z_):
                    return scalew_kernel(x, w8.astype(jnp.int4), s_, z_)
                ms = _time(f, x, w8, sc, zb)
            else:
                raise ValueError(variant)
            results[variant] = round(ms, 4)
            print(f"{variant}: {ms:.4f} ms", file=sys.stderr)
        except Exception as e:
            results[variant] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
