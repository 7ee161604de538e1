"""Attention-chain probe with dispatch overhead amortized away.

probe_attn_chain's per-call numbers were corrupted by a ~0.8 ms fixed
per-dispatch cost of the remote-TPU tunnel (measured: read time vs size has
intercept ~0.8 ms, slope ~550-880 GB/s). Here every measured quantity runs
REPS times inside ONE jit via lax.scan with a scalar data dependency (qq
depends on the accumulator, so XLA cannot hoist or CSE the repeated work),
mirroring how the real decode chunk amortizes dispatch.
"""
import time

import jax
import jax.numpy as jnp

S, K, G, D, T, L = 64, 4, 8, 64, 256, 22
REPS = 16
CALLS = 8


def bench(make_fn, *args):
    fn = jax.jit(make_fn)
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(CALLS):
        r = fn(*args)
    float(r)
    per_call = (time.perf_counter() - t0) / CALLS
    return per_call / REPS


def repeat(inner):
    """Run inner(qq, k, v) REPS times with a dependency chain through qq."""
    def run(q, k, v):
        def body(acc, _):
            qq = q * (1.0 + 1e-12 * acc)
            return inner(qq, k, v), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc
    return run


def main():
    kq = jax.random.key(0)
    q = jax.random.normal(kq, (L, S, K, G, D), jnp.bfloat16)
    k = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)
    v = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)
    slab = L * S * K * T * D * 2

    def layer_scan(per_layer):
        def inner(qq, k, v):
            def body(a, inp):
                return a + per_layer(*inp), None
            a, _ = jax.lax.scan(body, jnp.float32(0), (qq, k, v))
            return a
        return inner

    # 0. pure read: sum both slabs (scaled by the dependent factor via q-sum
    #    trick: add a tiny qq term so each rep re-reads)
    def read_only(qq, k, v):
        return (jnp.sum(k, dtype=jnp.float32) * jnp.sum(qq[0, 0, 0, 0, :8],
                                                        dtype=jnp.float32)
                + jnp.sum(v, dtype=jnp.float32))
    dt = bench(repeat(read_only), q, k, v)
    print(f"read k+v        : {dt*1e3:7.3f} ms  {2*slab/dt/1e9:5.0f} GB/s")

    # 1. scores einsum only
    dt = bench(repeat(layer_scan(
        lambda qg, ck, cv: jnp.sum(jnp.einsum(
            "skgd,sktd->skgt", qg, ck,
            preferred_element_type=jnp.float32)))), q, k, v)
    print(f"scores only     : {dt*1e3:7.3f} ms  (k read SOL@819 {slab/819e9*1e3:.3f})")

    # 2. full chain fp32 softmax (production formulation)
    def chain(qg, ck, cv):
        s = jnp.einsum("skgd,sktd->skgt", qg, ck,
                       preferred_element_type=jnp.float32)
        pr = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
        return jnp.sum(jnp.einsum("skgt,sktd->skgd", pr, cv)
                       .astype(jnp.float32))
    dt = bench(repeat(layer_scan(chain)), q, k, v)
    print(f"full chain      : {dt*1e3:7.3f} ms  (k+v SOL@819 {2*slab/819e9*1e3:.3f})")

    # 3. full chain over T-minor storage
    kT = jnp.swapaxes(k, -1, -2).copy()
    vT = jnp.swapaxes(v, -1, -2).copy()

    def chainT(qg, ck, cv):
        s = jnp.einsum("skgd,skdt->skgt", qg, ck,
                       preferred_element_type=jnp.float32)
        pr = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
        return jnp.sum(jnp.einsum("skgt,skdt->skgd", pr, cv)
                       .astype(jnp.float32))
    dt = bench(repeat(layer_scan(chainT)), q, kT, vT)
    print(f"full chain Tmin : {dt*1e3:7.3f} ms")

    # 4. value einsum only
    def val_only(qg, ck, cv):
        pr = (qg[..., :1] * jnp.ones((1, 1, 1, T), jnp.bfloat16))
        return jnp.sum(jnp.einsum("skgt,sktd->skgd", pr, cv)
                       .astype(jnp.float32))
    dt = bench(repeat(layer_scan(val_only)), q, k, v)
    print(f"value only      : {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
