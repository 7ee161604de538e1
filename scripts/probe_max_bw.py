"""Find the chip's empirically achievable HBM bandwidth.

The analytic SOL in bench.py assumes the v5e datasheet 819 GB/s. In this
environment pure bf16 reductions achieve ~535 GB/s; this probe tries every
pattern that could go faster — bigger arrays, elementwise copy, matmul
weight streaming (the pattern decode actually pays for), int8, and a raw
Pallas double-buffered DMA read — to establish the real roofline the engine
should be judged against. All measurements amortize the ~0.8 ms tunnel
dispatch overhead via in-jit repetition with a data dependency.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8
CALLS = 6


def bench(fn, *args, reps=REPS):
    fn_j = jax.jit(fn)
    float(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(CALLS):
        r = fn_j(*args)
    float(r)
    return (time.perf_counter() - t0) / CALLS / reps


def rep(inner):
    def run(*args):
        def body(acc, _):
            return inner(acc, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc
    return run


def main():
    kq = jax.random.key(0)

    # 1. bf16 sum, escalating sizes
    for mb in (256, 1024, 2048):
        n = mb * 1024 * 1024 // 2
        x = jax.random.normal(kq, (n,), jnp.bfloat16)
        dt = bench(rep(lambda a, x: jnp.sum(x, dtype=jnp.float32)
                       * (1 + 1e-12 * a)), x)
        print(f"bf16 sum {mb:5d} MB : {dt*1e3:7.3f} ms  {x.nbytes/dt/1e9:5.0f} GB/s")
        del x

    # 2. int8 sum (half the convert work per byte)
    xi = jnp.asarray(np.random.default_rng(0).integers(
        -127, 127, size=(1024 * 1024 * 1024,), dtype=np.int8))
    dt = bench(rep(lambda a, x: jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)
                   * (1 + 1e-12 * a)), xi)
    print(f"int8 sum  1024 MB : {dt*1e3:7.3f} ms  {xi.nbytes/dt/1e9:5.0f} GB/s")
    del xi

    # 3. matmul weight stream: y = x @ W, x [64, 8192], W [8192, 65536] bf16
    #    (1 GB weight read per matmul — decode's dominant pattern)
    x = jax.random.normal(kq, (64, 8192), jnp.bfloat16)
    w = jax.random.normal(kq, (8192, 65536), jnp.bfloat16)

    def mm(a, x, w):
        y = (x * (1 + 1e-12 * a)) @ w
        return jnp.sum(y, dtype=jnp.float32)
    dt = bench(rep(mm), x, w)
    print(f"matmul W 1024 MB  : {dt*1e3:7.3f} ms  {w.nbytes/dt/1e9:5.0f} GB/s")
    del w

    # 4. layered matmul scan (decode's exact shape): 22 x [64,2048]@[2048,5632]
    L, B, Din, Dout = 22, 64, 2048, 5632
    ws = jax.random.normal(kq, (L, Din, Dout), jnp.bfloat16)
    xs = jax.random.normal(kq, (B, Din), jnp.bfloat16)

    def scan_mm(a, xs, ws):
        def body(acc, wl):
            return acc + jnp.sum((xs * (1 + 1e-12 * a)) @ wl,
                                 dtype=jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0), ws)
        return s
    dt = bench(rep(scan_mm), xs, ws)
    print(f"scan matmul {ws.nbytes//2**20:4d} MB: {dt*1e3:7.3f} ms  {ws.nbytes/dt/1e9:5.0f} GB/s")
    del ws

    # 5. elementwise copy (read+write traffic)
    y = jax.random.normal(kq, (512 * 1024 * 1024 // 2,), jnp.bfloat16)
    dt = bench(rep(lambda a, y: jnp.sum(y * (1.0 + 1e-12 * a),
                                        dtype=jnp.float32)), y)
    # y*c writes a new array only if not fused into the sum; sum fuses, so
    # this measures read-only again; use lax.optimization_barrier copy:
    def copy_chain(y):
        def body(c, _):
            c = jax.lax.optimization_barrier(c * 1.0000001)
            return c, None
        c, _ = jax.lax.scan(body, y, None, length=REPS)
        return jnp.sum(c, dtype=jnp.float32)
    dt = bench(copy_chain, y)
    print(f"copy r+w   512 MB : {dt*1e3:7.3f} ms  {2*y.nbytes/dt/1e9:5.0f} GB/s")
    del y

    # 6. Pallas double-buffered pure-DMA read reduce
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 4 * 1024 * 1024  # bytes per block (bf16 -> 2M elems)
    NELEM = 512 * 1024 * 1024 // 2
    NBLK = NELEM * 2 // CHUNK

    def dma_kernel(x_ref, o_ref, scratch, sems):
        blk = CHUNK // 2

        def get(slot, i):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * blk, blk)], scratch.at[slot], sems.at[slot])

        get(0, 0).start()
        acc = jnp.zeros((8, 128), jnp.float32)

        def body(i, acc):
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < NBLK)
            def _():
                get(nslot, i + 1).start()
            get(slot, i).wait()
            return acc + jnp.sum(
                scratch[slot].reshape(-1, 8, 128), axis=0,
                dtype=jnp.float32)
        acc = jax.lax.fori_loop(0, NBLK, body, acc)
        o_ref[...] = acc

    xx = jax.random.normal(kq, (NELEM,), jnp.bfloat16)
    f = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, CHUNK // 2), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    def pallas_rep(a, xx):
        def body(acc, _):
            return acc + jnp.sum(f(xx * (1 + 1e-12 * acc))[0]), None
        acc, _ = jax.lax.scan(body, a, None, length=1)
        return acc
    # NOTE: xx*(...) materializes a copy (r+w) before the kernel; instead
    # call the kernel on xx directly, repeated CALLS times without in-jit rep
    # (kernel itself is one long DMA loop, dispatch overhead amortizes over
    # 512MB)
    g = jax.jit(lambda xx: jnp.sum(f(xx)))
    float(g(xx))
    t0 = time.perf_counter()
    for _ in range(CALLS):
        r = g(xx)
    float(r)
    dt = (time.perf_counter() - t0) / CALLS
    print(f"pallas DMA 512 MB : {dt*1e3:7.3f} ms  {xx.nbytes/dt/1e9:5.0f} GB/s")


if __name__ == "__main__":
    main()
