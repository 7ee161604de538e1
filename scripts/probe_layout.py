"""Attention / HBM-bandwidth microprobe for the ring-decode hot loop.

Timing through the remote-TPU tunnel: a D2H fetch costs ~30 ms RTT and
block_until_ready does not synchronize, so each measurement runs the op
REPS times inside one jit fori_loop and fetches one scalar at the end.
LICM guard: the op's SMALL operand (q / x) is perturbed by the loop carry
each iteration, so XLA cannot hoist the slab-reading op out of the loop;
the perturbation itself is negligible work.

Run on the chip: python scripts/probe_layout.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 100


def fenced(fn, *args):
    out = fn(*args)
    return float(np.asarray(out).ravel()[0])


def measure(op, small, *big, reps=REPS):
    """op(small, *big) -> scalar f32; `small` is perturbed by the carry."""

    @jax.jit
    def many(small, *big):
        def body(i, acc):
            s = small * (1.0 + 1e-12 * acc).astype(small.dtype)
            return acc + op(s, *big)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    fenced(many, small, *big)  # compile
    t0 = time.perf_counter()
    fenced(many, small, *big)
    total = time.perf_counter() - t0
    return total / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    L, S, K, T, D = 22, 64, 4, 256, 64
    G = 8
    key = jax.random.key(0)
    a64 = jax.random.normal(key, (L, S, K, T, D), jnp.bfloat16)
    a128 = a64.reshape(L, S, K, T // 2, 2 * D)
    v64 = jax.random.normal(jax.random.key(1), (L, S, K, T, D), jnp.bfloat16)
    q = jax.random.normal(key, (S, K, G, D), jnp.bfloat16)

    nbytes = a64.size * 2
    print(f"slab bytes: {nbytes/1e6:.1f} MB  ({2*nbytes/1e6:.1f} MB both)")

    def report(name, dt, bytes_read):
        print(f"{name:>24}: {dt*1e3:7.3f} ms  {bytes_read/dt/1e9:7.1f} GB/s",
              flush=True)

    def scores_scan(q, a):
        def body(c, ck):
            s = jnp.einsum("skgd,sktd->skgt", q, ck,
                           preferred_element_type=jnp.float32)
            return c + jnp.sum(s), None
        out, _ = jax.lax.scan(body, jnp.float32(0), a)
        return out

    report("scores scan [T,64]", measure(scores_scan, q, a64), nbytes)

    def scores128_scan(q, a):
        q2 = jnp.concatenate([q, q], axis=-1)
        def body(c, ck):
            s = jnp.einsum("skgd,sktd->skgt", q2, ck,
                           preferred_element_type=jnp.float32)
            return c + jnp.sum(s), None
        out, _ = jax.lax.scan(body, jnp.float32(0), a)
        return out

    report("scores scan [T/2,128]", measure(scores128_scan, q, a128), nbytes)

    def attn_scan(q, a, v):
        def body(c, inputs):
            ck, cv = inputs
            s = jnp.einsum("skgd,sktd->skgt", q, ck,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
            o = jnp.einsum("skgt,sktd->skgd", p, cv)
            return c + jnp.sum(o, dtype=jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), (a, v))
        return out

    report("attn scan (2 slabs)", measure(attn_scan, q, a64, v64), 2 * nbytes)

    def attn_flat(q, a, v):
        s = jnp.einsum("skgd,lsktd->lskgt", q, a,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("lskgt,lsktd->lskgd", p, v)
        return jnp.sum(o, dtype=jnp.float32)

    report("attn flat (no scan)", measure(attn_flat, q, a64, v64), 2 * nbytes)

    def attn_bf16(q, a, v):
        def body(c, inputs):
            ck, cv = inputs
            s = jnp.einsum("skgd,sktd->skgt", q, ck)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cv.dtype)
            o = jnp.einsum("skgt,sktd->skgd", p, cv)
            return c + jnp.sum(o, dtype=jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), (a, v))
        return out

    report("attn bf16 scores", measure(attn_bf16, q, a64, v64), 2 * nbytes)

    # merged-head variant: collapse (K,G)->H so the score matmul is one
    # [S*K, G, D] x [S*K, D, T] batch with bigger tiles? (same as scan)
    # weight-read floor: matvec over a 1.1B-param bf16 matrix
    P = int(1.1e9)
    w = jax.random.normal(key, (P // 2048, 2048), jnp.bfloat16)
    x = jax.random.normal(key, (2048,), jnp.bfloat16)

    def matvec(x, w):
        return jnp.sum(jnp.einsum("d,nd->n", x, w,
                                  preferred_element_type=jnp.float32))

    report("matvec 1.1B bf16", measure(matvec, x, w), P * 2)

    # batched S=64 matmul (the real decode shape): [64, 2048] x [N, 2048]
    xb = jax.random.normal(key, (64, 2048), jnp.bfloat16)

    def matmul(xb, w):
        return jnp.sum(jnp.einsum("sd,nd->sn", xb, w,
                                  preferred_element_type=jnp.float32))

    report("matmul S=64 1.1B bf16", measure(matmul, xb, w), P * 2)


if __name__ == "__main__":
    main()
