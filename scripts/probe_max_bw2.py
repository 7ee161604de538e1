"""HBM bandwidth probe v2 — airtight loop dependencies.

v1's rep() trick let XLA hoist loop-invariant `jnp.sum(x)` out of the scan,
inflating read numbers (2 TB/s nonsense). Here every repetition reads
through `x + a` (a = carry-dependent scalar), which XLA fuses into the
reduction without materializing but cannot hoist.
"""
import time

import jax
import jax.numpy as jnp

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


def main():
    kq = jax.random.key(0)

    # 1. read-only: sum(x + a) — the add depends on the carry, fuses into
    #    the reduce (no materialization), cannot be hoisted
    for mb in (512, 1024, 2048):
        n = mb * 1024 * 1024 // 2
        x = jax.random.normal(kq, (n,), jnp.bfloat16)

        def read(x):
            def body(a, _):
                return jnp.sum(x + a.astype(jnp.bfloat16),
                               dtype=jnp.float32) * 1e-20, None
            a, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return a
        dt = bench(read, x)
        print(f"read bf16 {mb:5d} MB : {dt*1e3:7.3f} ms  {x.nbytes/dt/1e9:5.0f} GB/s")
        del x

    # 2. copy chain (read+write, donatable in-place)
    n = 1024 * 1024 * 1024 // 2
    y = jax.random.normal(kq, (n,), jnp.bfloat16)

    def copy_chain(y):
        def body(c, _):
            return jax.lax.optimization_barrier(c * jnp.bfloat16(1.0000001)), None
        c, _ = jax.lax.scan(body, y, None, length=REPS)
        return jnp.sum(c[:8], dtype=jnp.float32)
    dt = bench(copy_chain, y)
    print(f"copy r+w   1024 MB : {dt*1e3:7.3f} ms  {2*y.nbytes/dt/1e9:5.0f} GB/s")
    del y

    # 3. the KV slab read via the attention-chain shapes, dependency through q
    S, K, G, D, T, L = 64, 4, 8, 64, 256, 22
    q = jax.random.normal(kq, (L, S, K, G, D), jnp.bfloat16)
    k = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)
    v = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)

    def chain_reps(q, k, v):
        def rep_body(acc, _):
            qq = q + acc.astype(jnp.bfloat16)

            def body(a, inp):
                qg, ck, cv = inp
                s = jnp.einsum("skgd,sktd->skgt", qg, ck,
                               preferred_element_type=jnp.float32)
                pr = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
                return a + jnp.sum(jnp.einsum("skgt,sktd->skgd", pr, cv)
                                   .astype(jnp.float32)), None
            a, _ = jax.lax.scan(body, jnp.float32(0), (qq, k, v))
            return a * 1e-20, None
        acc, _ = jax.lax.scan(rep_body, jnp.float32(0), None, length=REPS)
        return acc
    dt = bench(chain_reps, q, k, v)
    sol = 2 * k.nbytes
    print(f"attn chain  369 MB : {dt*1e3:7.3f} ms  {sol/dt/1e9:5.0f} GB/s")

    # 4. decode-shaped matmul scan with f32 accum vs bf16 accum
    L2, B, Din, Dout = 22, 64, 2048, 5632
    ws = jax.random.normal(kq, (L2, Din, Dout), jnp.bfloat16)
    xs = jax.random.normal(kq, (B, Din), jnp.bfloat16)

    for pet, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        def scan_mm(xs, ws):
            def rep_body(acc, _):
                xx = xs + acc.astype(jnp.bfloat16)

                def body(a, wl):
                    y = jax.lax.dot(xx, wl, preferred_element_type=pet)
                    return a + jnp.sum(y, dtype=jnp.float32), None
                s, _ = jax.lax.scan(body, jnp.float32(0), ws)
                return s * 1e-20, None
            acc, _ = jax.lax.scan(rep_body, jnp.float32(0), None, length=REPS)
            return acc
        dt = bench(scan_mm, xs, ws)
        print(f"scan matmul {name} 484 MB: {dt*1e3:7.3f} ms  {ws.nbytes/dt/1e9:5.0f} GB/s")

    # 5. one big matmul, weight read 1 GB
    x2 = jax.random.normal(kq, (64, 8192), jnp.bfloat16)
    w2 = jax.random.normal(kq, (8192, 65536), jnp.bfloat16)

    def mm(x2, w2):
        def rep_body(acc, _):
            xx = x2 + acc.astype(jnp.bfloat16)
            y = jax.lax.dot(xx, w2, preferred_element_type=jnp.bfloat16)
            return jnp.sum(y, dtype=jnp.float32) * 1e-20, None
        acc, _ = jax.lax.scan(rep_body, jnp.float32(0), None, length=REPS)
        return acc
    dt = bench(mm, x2, w2)
    print(f"matmul 1024 MB     : {dt*1e3:7.3f} ms  {w2.nbytes/dt/1e9:5.0f} GB/s")

    # 6. batch sensitivity of the big matmul: B=8 vs 64 vs 256
    for b in (8, 256, 512):
        x3 = jax.random.normal(kq, (b, 8192), jnp.bfloat16)

        def mmb(x3, w2):
            def rep_body(acc, _):
                xx = x3 + acc.astype(jnp.bfloat16)
                y = jax.lax.dot(xx, w2, preferred_element_type=jnp.bfloat16)
                return jnp.sum(y, dtype=jnp.float32) * 1e-20, None
            acc, _ = jax.lax.scan(rep_body, jnp.float32(0), None, length=REPS)
            return acc
        dt = bench(mmb, x3, w2)
        print(f"matmul B={b:3d}       : {dt*1e3:7.3f} ms  {w2.nbytes/dt/1e9:5.0f} GB/s")


if __name__ == "__main__":
    main()
