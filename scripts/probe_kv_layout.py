"""Probe: is the KV slab's head_dim-minor layout wasting HBM bandwidth?

Theory: TPU tiles the last two dims of an array ((16,128) for bf16, (32,128)
for int8). With the cache stored [L, S, K, T, D] and D=64 (TinyLlama), the
minor dim is padded 64 -> 128: the slab occupies 2x its logical bytes and
every decode-attention read streams 2x the SOL byte count. A T-minor layout
[L, S, K, D, T] (T = context bucket, a multiple of 128) removes the padding.

Measures, on the real chip:
  1. allocated bytes per layout (memory_stats delta vs logical size)
  2. per-step attention time: scores+softmax+value einsum chain over the
     slab in each layout, scanned over layers like the decode step.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

S, K, G, D, T, L = 64, 4, 8, 64, 256, 22
STEPS = 50


def mem_delta(fn):
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    before = stats.get("bytes_in_use", 0)
    x = fn()
    jax.block_until_ready(x)
    stats = dev.memory_stats() or {}
    after = stats.get("bytes_in_use", 0)
    return x, after - before


def timeit(fn, *args):
    # host-fetch the result to synchronize: block_until_ready does not
    # reliably wait through the remote-TPU tunnel (see bench.py NOTE)
    float(fn(*args)[1])
    t0 = time.perf_counter()
    r = None
    for _ in range(STEPS):
        r = fn(*args)
    float(r[1])
    return (time.perf_counter() - t0) / STEPS


def main():
    key = jax.random.key(0)
    logical = L * S * K * T * D * 2
    print(f"logical slab bytes: {logical/1e6:.1f} MB (one of k/v)")

    # --- layout A: D-minor [L, S, K, T, D] (current) ---
    ka, da = mem_delta(lambda: jax.random.normal(key, (L, S, K, T, D), jnp.bfloat16))
    va, _ = mem_delta(lambda: jax.random.normal(key, (L, S, K, T, D), jnp.bfloat16))
    print(f"D-minor allocated: {da/1e6:.1f} MB  ratio vs logical: {da/logical:.2f}")

    # --- layout B: T-minor [L, S, K, D, T] ---
    kb, db = mem_delta(lambda: jax.random.normal(key, (L, S, K, D, T), jnp.bfloat16))
    vb, _ = mem_delta(lambda: jax.random.normal(key, (L, S, K, D, T), jnp.bfloat16))
    print(f"T-minor allocated: {db/1e6:.1f} MB  ratio vs logical: {db/logical:.2f}")

    q = jax.random.normal(jax.random.key(1), (L, S, K, G, D), jnp.bfloat16)

    @jax.jit
    def attn_dminor(q, k, v):
        def body(acc, inp):
            qg, ck, cv = inp
            s = jnp.einsum("skgd,sktd->skgt", qg, ck,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
            a = jnp.einsum("skgt,sktd->skgd", p, cv)
            return acc + jnp.sum(a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (q, k, v))
        return acc, acc

    @jax.jit
    def attn_tminor(q, k, v):
        def body(acc, inp):
            qg, ck, cv = inp
            s = jnp.einsum("skgd,skdt->skgt", qg, ck,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
            a = jnp.einsum("skgt,skdt->skgd", p, cv)
            return acc + jnp.sum(a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (q, k, v))
        return acc, acc

    ta = timeit(attn_dminor, q, ka, va)
    tb = timeit(attn_tminor, q, kb, vb)
    sol = 2 * logical / 819e9
    print(f"attention chain  D-minor: {ta*1e3:.3f} ms   T-minor: {tb*1e3:.3f} ms"
          f"   SOL(k+v read): {sol*1e3:.3f} ms")
    print(f"vs SOL  D-minor: {sol/ta:.2f}   T-minor: {sol/tb:.2f}")


if __name__ == "__main__":
    main()
