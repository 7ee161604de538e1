"""Break down the decode-attention chain cost (TinyLlama shape, bucket 256).

probe_kv_layout found the chain at ~1.47 ms vs 0.45 ms SOL regardless of
D-minor/T-minor storage — so the slack is not tiling/padding. This probe
times each stage and several formulations to find the residual.
"""
import time

import jax
import jax.numpy as jnp

S, K, G, D, T, L = 64, 4, 8, 64, 256, 22
STEPS = 30


def timeit(fn, *args):
    float(fn(*args))           # host fetch = the only reliable sync here
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / STEPS


def scan_over_layers(per_layer):
    def run(q, k, v):
        def body(acc, inp):
            return acc + per_layer(*inp), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (q, k, v))
        return acc
    return jax.jit(run)


def main():
    kq = jax.random.key(0)
    q = jax.random.normal(kq, (L, S, K, G, D), jnp.bfloat16)
    k = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)
    v = jax.random.normal(kq, (L, S, K, T, D), jnp.bfloat16)

    read1 = L * S * K * T * D * 2 / 819e9 * 1e3   # one slab pass, ms

    # 1. scores einsum only (reads k once)
    f = scan_over_layers(lambda qg, ck, cv: jnp.sum(
        jnp.einsum("skgd,sktd->skgt", qg, ck,
                   preferred_element_type=jnp.float32)))
    print(f"scores only          : {timeit(f, q, k, v)*1e3:7.3f} ms  (SOL {read1:.3f})")

    # 2. scores bf16 accumulate
    f = scan_over_layers(lambda qg, ck, cv: jnp.sum(
        jnp.einsum("skgd,sktd->skgt", qg, ck,
                   preferred_element_type=jnp.bfloat16)
        .astype(jnp.float32)))
    print(f"scores bf16 acc      : {timeit(f, q, k, v)*1e3:7.3f} ms")

    # 3. value einsum only (fixed probs, reads v once)
    p = jax.random.normal(kq, (L, S, K, G, T), jnp.bfloat16)
    f2 = jax.jit(lambda p, v: jax.lax.scan(
        lambda acc, inp: (acc + jnp.sum(
            jnp.einsum("skgt,sktd->skgd", inp[0], inp[1])
            .astype(jnp.float32)), None),
        jnp.float32(0), (p, v))[0])
    float(f2(p, v))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = f2(p, v)
    float(r)
    print(f"value einsum only    : {(time.perf_counter()-t0)/STEPS*1e3:7.3f} ms  (SOL {read1:.3f})")

    # 4. full chain fp32 softmax (current production shape)
    def chain_f32(qg, ck, cv):
        s = jnp.einsum("skgd,sktd->skgt", qg, ck,
                       preferred_element_type=jnp.float32)
        pr = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
        return jnp.sum(jnp.einsum("skgt,sktd->skgd", pr, cv)
                       .astype(jnp.float32))
    f = scan_over_layers(chain_f32)
    print(f"full chain f32 smax  : {timeit(f, q, k, v)*1e3:7.3f} ms  (SOL {2*read1:.3f})")

    # 5. full chain, softmax in bf16 end-to-end
    def chain_bf16(qg, ck, cv):
        s = jnp.einsum("skgd,sktd->skgt", qg, ck,
                       preferred_element_type=jnp.bfloat16)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
        pr = e / jnp.sum(e, axis=-1, keepdims=True).astype(jnp.bfloat16)
        return jnp.sum(jnp.einsum("skgt,sktd->skgd", pr, cv)
                       .astype(jnp.float32))
    f = scan_over_layers(chain_bf16)
    print(f"full chain bf16 smax : {timeit(f, q, k, v)*1e3:7.3f} ms")

    # 6. chain with the K batch folded into rows: q [S*K, G, D] @ k [S*K, D, T]
    def chain_fold(qg, ck, cv):
        q2 = qg.reshape(S * K, G, D)
        k2 = ck.reshape(S * K, T, D)
        v2 = cv.reshape(S * K, T, D)
        s = jax.lax.dot_general(
            q2, k2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [SK, G, T]
        pr = jax.nn.softmax(s, axis=-1).astype(v2.dtype)
        o = jax.lax.dot_general(
            pr, v2, (((2,), (1,)), ((0,), (0,))))    # [SK, G, D]
        return jnp.sum(o.astype(jnp.float32))
    f = scan_over_layers(chain_fold)
    print(f"full chain dot_gen   : {timeit(f, q, k, v)*1e3:7.3f} ms")

    # 7. all-layer single einsum (no scan): upper bound on scan overhead
    @jax.jit
    def chain_nolscan(q, k, v):
        s = jnp.einsum("lskgd,lsktd->lskgt", q, k,
                       preferred_element_type=jnp.float32)
        pr = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.sum(jnp.einsum("lskgt,lsktd->lskgd", pr, v)
                       .astype(jnp.float32))
    print(f"full chain no scan   : {timeit(chain_nolscan, q, k, v)*1e3:7.3f} ms")

    # 8. fold G into S: batch (s g) treats every q head separately with its
    #    kv head — wider effective row dim? (opposite direction: G=1 matvec)
    # 9. chain at T=512 and T=1024 to see scaling with slab size
    for t2 in (512, 1024):
        k2 = jax.random.normal(kq, (L, S, K, t2, D), jnp.bfloat16)
        v2 = jax.random.normal(kq, (L, S, K, t2, D), jnp.bfloat16)
        f = scan_over_layers(chain_f32)
        sol = 2 * L * S * K * t2 * D * 2 / 819e9 * 1e3
        print(f"full chain f32 T={t2:4d}: {timeit(f, q, k2, v2)*1e3:7.3f} ms  (SOL {sol:.3f})")


if __name__ == "__main__":
    main()
