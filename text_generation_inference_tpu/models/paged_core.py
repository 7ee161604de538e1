"""Decoder forward passes over the paged KV pool.

Same layer math as models/core.py (shares its building blocks); only the
cache side differs: K/V rows live in flat page pools [L, P*page, K, D] and
every read/write goes through the block table. This is the TPU counterpart
of the reference's PagedCausalLM forward path (reference:
server/.../models/paged_causal_lm.py:418-479 prepare_inputs_for_prefill /
slot mapping; custom_modeling/paged_llama_modeling.py store()/attend()).

RoPE/learned positions supported; ALiBi models use the gather-based
attention fallback (bias needs absolute key positions, which the paged
Pallas kernel does not carry).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..engine.paged_cache import PagedKVCache
from ..ops.pallas.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_partial_reference,
    paged_decode_attention_partial_stacked,
    paged_decode_attention_reference,
)
from .core import (
    DecoderSpec,
    _apply_rope,
    _attn_out,
    _embed,
    _layer_scan,
    _mlp,
    _norm,
    _qkv,
    _rope_freqs,
    _unembed,
)


def _partial_attention_stacked(qg, kpools, vpools, bt, ctx, li, page_size,
                               spec, mesh, slopes_kg=None, use_kernel=True,
                               ks_pools=None, vs_pools=None):
    """_partial_attention over layer-STACKED pools [L, K, POOL_R, D] with a
    traced layer index `li` — the per-layer decode scan closes over the
    whole pool and the Pallas kernel dereferences the layer via scalar
    prefetch, so no per-layer pool slice is ever materialized (a scan-xs
    slice feeding a custom call costs ~3x the KV traffic; see
    _kernel_all_heads_stats_stacked).

    int8 pools (ks_pools/vs_pools given) ride the quantized kernel variant
    — the scale pools are two extra block-table-indexed operands
    (_kernel_all_heads_stats_stacked_i8) — so the long-context int8-KV
    regime streams pages like the bf16 path instead of falling back to the
    HBM-materializing XLA gather."""
    if not use_kernel:
        kp = jax.lax.dynamic_index_in_dim(kpools, li, 0, keepdims=False)
        vp = jax.lax.dynamic_index_in_dim(vpools, li, 0, keepdims=False)
        ksp = vsp = None
        if ks_pools is not None:
            ksp = jax.lax.dynamic_index_in_dim(ks_pools, li, 0,
                                               keepdims=False)
            vsp = jax.lax.dynamic_index_in_dim(vs_pools, li, 0,
                                               keepdims=False)
        return paged_decode_attention_partial_reference(
            qg, kp, vp, bt, ctx, page_size, alibi_slopes_kg=slopes_kg,
            k_scale_pool=ksp, v_scale_pool=vsp)
    li = jnp.asarray(li, jnp.int32).reshape(1)
    quant = ks_pools is not None
    if mesh is not None and mesh.shape.get("model", 1) > 1 \
            and spec.num_kv_heads % mesh.shape["model"] == 0:
        import functools

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        kv_spec = P(None, "model", None, None)
        in_specs = [kv_spec, kv_spec, kv_spec, P(None, None), P(None),
                    P(None)]
        args = [qg, kpools, vpools, bt, ctx, li]
        if quant:
            def wrapped(qg, kp, vp, bt, ctx, li, ksp, vsp):
                return paged_decode_attention_partial_stacked(
                    qg, kp, vp, bt, ctx, li, page_size,
                    k_scale_pools=ksp, v_scale_pools=vsp)
            fn_base = wrapped
            in_specs += [P(None, "model", None), P(None, "model", None)]
            args += [ks_pools, vs_pools]
        else:
            fn_base = functools.partial(
                paged_decode_attention_partial_stacked, page_size=page_size)
        fn = shard_map(
            fn_base,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, "model", None, None), P(None, "model", None),
                       P(None, "model", None)),
            check_rep=False)
        return fn(*args)
    return paged_decode_attention_partial_stacked(
        qg, kpools, vpools, bt, ctx, li, page_size,
        k_scale_pools=ks_pools, v_scale_pools=vs_pools)


def _use_kernel() -> bool:
    import os

    if os.getenv("FLASH_ATTENTION", "1").lower() in ("0", "false"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def decode_paged(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S]
    positions: jax.Array,    # [S] write position (= context_len - 1)
    cache: PagedKVCache,
    context_len: jax.Array,  # [S] = positions + 1 for active slots
    page_size: int,
    active: Optional[jax.Array] = None,   # [S] bool; inactive writes dropped
    mesh=None,
) -> tuple[jax.Array, PagedKVCache]:
    """One decode step over every slot via the page pool."""
    s = ids.shape[0]
    bt = cache.block_table
    x = _embed(spec, params, ids, positions)

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None

    # flat pool row for each slot's write position; INACTIVE slots must not
    # write at all — their block-table rows are stale (freed slots keep old
    # page ids, fresh slots point at page 0), so an in-bounds write would
    # corrupt whichever live request now owns those pool rows. Route them
    # out of bounds and scatter with mode="drop".
    pool_rows = cache.k.shape[2]
    write_rows = (bt[jnp.arange(s), positions // page_size] * page_size
                  + positions % page_size)
    if active is not None:
        write_rows = jnp.where(active, write_rows, pool_rows)
    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    use_kernel = _use_kernel() and spec.pos != "alibi"
    if spec.pos == "alibi":
        from .core import alibi_slopes

        slopes_kg = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl)).reshape(
            spec.num_kv_heads, group)
    else:
        slopes_kg = None

    def layer(x, inputs):
        lp, kp, vp = inputs                       # pools [K, P*page, D]
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)               # q [S,H,Dh]; k/v [S,K,Dh]
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        kp = kp.at[:, write_rows].set(
            k.transpose(1, 0, 2).astype(kp.dtype), mode="drop")
        vp = vp.at[:, write_rows].set(
            v.transpose(1, 0, 2).astype(vp.dtype), mode="drop")

        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)
        if use_kernel and not (mesh is not None
                               and mesh.shape.get("model", 1) > 1):
            attn = paged_decode_attention(qg, kp, vp, bt, context_len,
                                          page_size)
        else:
            # GSPMD partitions the gather/einsum reference across the
            # kv-head axis natively; the plain kernel is single-device
            attn = paged_decode_attention_reference(
                qg, kp, vp, bt, context_len, page_size,
                alibi_slopes_kg=slopes_kg)
        attn = attn.reshape(s, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (kp, vp)

    x, (new_k, new_v) = _layer_scan(layer, x, params["layers"],
                                    (cache.k, cache.v))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, cache._replace(k=new_k, v=new_v)


def gather_dense_view(cache: PagedKVCache, live_pages: int,
                      page_size: int):
    """Gather every slot's first `live_pages` pages into a dense
    slot-indexed KV view [L, S, K, R, D] (R = live_pages * page_size).

    Within a ring-decode chunk the pool is read-only and the block tables
    are fixed, so this ONE gather (amortized over the whole chunk) lets
    the chunk run the slot engine's XLA attention — no per-(layer, step)
    Pallas launch. Row r of the view is absolute position r (pages are
    allocated in position order). Stale tables of inactive slots read
    garbage pages; their scores are masked / outputs discarded, exactly
    like the slot engine's stale rows.
    """
    from .core import KVCache

    bt = cache.block_table[:, :live_pages]                    # [S, P']
    s = bt.shape[0]
    rows = (bt[:, :, None] * page_size
            + jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
            ).reshape(s, live_pages * page_size)              # [S, R]
    # pool [L, K, POOL_R, D] --take axis 2--> [L, K, S, R, D] -> [L,S,K,R,D]
    k = jnp.swapaxes(jnp.take(cache.k, rows, axis=2, mode="clip"), 1, 2)
    v = jnp.swapaxes(jnp.take(cache.v, rows, axis=2, mode="clip"), 1, 2)
    if cache.quantized:
        # scale pools [L, K, POOL_R] -> [L, S, K, R]: the dense view is a
        # quantized slot-engine cache, so decode_ring_step's int8 read path
        # (scale folded into scores/probs) applies unchanged
        ks = jnp.swapaxes(jnp.take(cache.k_scale, rows, axis=2,
                                   mode="clip"), 1, 2)
        vs = jnp.swapaxes(jnp.take(cache.v_scale, rows, axis=2,
                                   mode="clip"), 1, 2)
        return KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
    return KVCache(k=k, v=v)


def decode_paged_ring_step(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S]
    positions: jax.Array,    # [S] position ids[s] will occupy
    cache: PagedKVCache,     # pool READ-ONLY this chunk
    kbuf: jax.Array,         # [L, S, K, C, D] in-chunk keys (cols < step_idx)
    vbuf: jax.Array,         # [L, S, K, C, D]
    step_idx: jax.Array,     # scalar i32
    chunk_start: jax.Array,  # [S] i32: positions at chunk entry
    page_size: int = 128,
    mesh=None,
    live_pages: Optional[int] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Ring-buffer decode step over the paged pool (the paged counterpart
    of core.decode_ring_step): the pool is never written inside the chunk
    — the Pallas paged kernel covers pre-chunk context and returns partial
    softmax stats, which are merged flash-decoding style with the in-chunk
    ring buffer + current token computed in XLA. One block-table scatter
    per chunk (engine) replaces the per-step pool copy.

    Returns (logits [S, V] f32, k_all [L, S, K, D], v_all [L, S, K, D]).
    """
    s = ids.shape[0]
    n_buf = kbuf.shape[3]
    bt = cache.block_table
    if live_pages is not None and live_pages < bt.shape[1]:
        # the kernel grid is (S, bt.shape[1]): slicing the table to the
        # live-page bucket drops dead grid iterations (the engine picks the
        # smallest bucket covering every live slot's pre-chunk context)
        bt = jax.lax.slice_in_dim(bt, 0, live_pages, axis=1)
    x = _embed(spec, params, ids, positions)
    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None
    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads
    use_kernel = _use_kernel() and spec.pos != "alibi"
    buf_mask = jnp.arange(n_buf, dtype=jnp.int32)[None, :] < step_idx

    if spec.pos == "alibi":
        from .core import alibi_slopes

        slopes_kg = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl)).reshape(
            spec.num_kv_heads, group)
        buf_pos = (chunk_start[:, None]
                   + jnp.arange(n_buf, dtype=jnp.int32)[None, :])  # [S, C]
        buf_bias = (slopes_kg[None, :, :, None]
                    * buf_pos.astype(jnp.float32)[:, None, None, :])
        new_bias = (slopes_kg[None]
                    * positions[:, None, None].astype(jnp.float32))
    else:
        slopes_kg = None
        buf_bias = new_bias = None

    def layer(x, inputs):
        lp, li, kb, vb = inputs         # pool closed over, READ-ONLY
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        qg = q.reshape(s, spec.num_kv_heads, group, spec.head_dim)

        # part 1: pool attention over pre-chunk context (partial stats).
        # The stacked kernel indexes the layer inside the kernel — the pool
        # is NOT scan xs, so XLA never materializes a per-layer slice copy.
        acc1, m1, l1 = _partial_attention_stacked(
            qg, cache.k, cache.v, bt, chunk_start, li, page_size, spec,
            mesh, slopes_kg=(slopes_kg if spec.pos == "alibi" else None),
            use_kernel=use_kernel,
            ks_pools=cache.k_scale, vs_pools=cache.v_scale)

        # part 2: in-chunk ring + current token
        bscores = jnp.einsum("skgd,skcd->skgc", qg, kb,
                             preferred_element_type=jnp.float32) * scale
        if buf_bias is not None:
            bscores = bscores + buf_bias
        bscores = jnp.where(buf_mask[:, None, None, :], bscores, -jnp.inf)
        score_new = jnp.sum(
            qg.astype(jnp.float32) * k[:, :, None, :].astype(jnp.float32),
            axis=-1) * scale
        if new_bias is not None:
            score_new = score_new + new_bias
        all_r = jnp.concatenate([bscores, score_new[..., None]], axis=-1)
        m2 = jnp.max(all_r, axis=-1)                         # [S, K, G]
        p2 = jnp.exp(all_r - m2[..., None])
        p2 = jnp.where(jnp.isneginf(all_r), 0.0, p2)
        l2 = jnp.sum(p2, axis=-1)
        acc2 = jnp.einsum("skgc,skcd->skgd",
                          p2[..., :n_buf], vb.astype(jnp.float32)) \
            + p2[..., n_buf:] * v[:, :, None, :].astype(jnp.float32)

        # flash-decoding merge
        m = jnp.maximum(m1, m2)
        a1 = jnp.where(jnp.isneginf(m1), 0.0, jnp.exp(m1 - m))
        a2 = jnp.where(jnp.isneginf(m2), 0.0, jnp.exp(m2 - m))
        denom = jnp.maximum(l1 * a1 + l2 * a2, 1e-30)
        attn = (acc1 * a1[..., None] + acc2 * a2[..., None]) \
            / denom[..., None]
        attn = attn.astype(x.dtype).reshape(s, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)
        return x, (k, v)

    layer_ids = jnp.arange(spec.num_layers, dtype=jnp.int32)
    x, (k_all, v_all) = _layer_scan(
        layer, x, params["layers"], (layer_ids, kbuf, vbuf))
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    return logits, k_all, v_all


def paged_ring_flush(cache: PagedKVCache, kbuf: jax.Array, vbuf: jax.Array,
                     chunk_start: jax.Array, active: jax.Array,
                     max_seq: int, page_size: int) -> PagedKVCache:
    """Scatter a chunk's ring buffers into the page pool through the block
    table: buffer col c of slot s lands at the pool row of position
    chunk_start[s] + c. Inactive slots are dropped entirely — their block
    tables are stale and an in-bounds write would corrupt pages now owned
    by live requests (same hazard as decode_paged's inactive-write guard).
    """
    n_buf = kbuf.shape[3]
    L, s = kbuf.shape[0], kbuf.shape[1]
    pool_rows = cache.k.shape[2]
    bt = cache.block_table
    wpos = chunk_start[None, :] + jnp.arange(n_buf, dtype=jnp.int32)[:, None]
    valid = active[None, :] & (wpos < max_seq)                 # [C, S]
    page_idx = jnp.clip(wpos // page_size, 0, bt.shape[1] - 1)
    rows = (bt[jnp.arange(s)[None, :], page_idx] * page_size
            + wpos % page_size)                                # [C, S]
    rows = jnp.where(valid, rows, pool_rows)                   # OOB -> drop
    if cache.quantized:
        # quantize once at the chunk flush (the ring buffers stay full
        # precision in-chunk — same scheme as the slot engine's ring_flush)
        from .core import quantize_kv

        kq, ks = quantize_kv(kbuf)    # [L,S,K,C,D] i8, [L,S,K,C] f32
        vq, vs = quantize_kv(vbuf)
        new_k = cache.k.at[:, :, rows, :].set(
            kq.transpose(0, 2, 3, 1, 4), mode="drop")
        new_v = cache.v.at[:, :, rows, :].set(
            vq.transpose(0, 2, 3, 1, 4), mode="drop")
        new_ks = cache.k_scale.at[:, :, rows].set(
            ks.transpose(0, 2, 3, 1), mode="drop")
        new_vs = cache.v_scale.at[:, :, rows].set(
            vs.transpose(0, 2, 3, 1), mode="drop")
        return cache._replace(k=new_k, v=new_v, k_scale=new_ks,
                              v_scale=new_vs)
    # pool [L, K, R, D]; advanced indices (C, S) at axis 2 stay in place:
    # updated region is [L, K, C, S, D]
    new_k = cache.k.at[:, :, rows, :].set(
        kbuf.transpose(0, 2, 3, 1, 4).astype(cache.k.dtype), mode="drop")
    new_v = cache.v.at[:, :, rows, :].set(
        vbuf.transpose(0, 2, 3, 1, 4).astype(cache.v.dtype), mode="drop")
    return cache._replace(k=new_k, v=new_v)


def verify_chunk_paged(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,          # [S, C] candidate tokens per slot
    start_pos: jax.Array,    # [S] position of ids[:, 0]
    cache: PagedKVCache,
    page_size: int,
    active: jax.Array,       # [S] bool
    max_seq: int,
    live_pages: Optional[int] = None,
):
    """Speculative verification through the block table (the paged
    counterpart of core.verify_chunk; reference speculates on its paged
    path only, paged_causal_lm.py:481-563): live pages are gathered to a
    dense [L,S,K,R,D] view once per verify call (amortized over the C
    candidate positions, same trade as the dense-gather ring decode),
    core.verify_chunk runs against the view, and the C chunk positions are
    flushed back through the block table. Rejected positions are rewound
    by not advancing history_len — their flushed KV is masked by context
    length and overwritten by the next chunk (same rewind scheme as the
    reference's KV-manager child-sequence free + the slot engine).

    Returns ([S, C, V] logits, [S, C, D] hidden, updated cache).
    """
    from .core import verify_chunk

    s, c = ids.shape
    if live_pages is None:
        live_pages = cache.block_table.shape[1]
    dense = gather_dense_view(cache, live_pages, page_size)
    logits, hidden, new_dense = verify_chunk(spec, params, ids, start_pos,
                                             dense)
    # pull the C chunk rows back out of the dense view -> [L, S, K, C, D]
    rows = jnp.arange(s)
    r_max = new_dense.k.shape[3]
    pos = start_pos[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    pos_cl = jnp.clip(pos, 0, r_max - 1)
    # advanced indices (rows[:,None] at axis 1, pos_cl at axis 3) are
    # non-adjacent -> broadcast result [S, C] moves to front: [S,C,L,K,D]
    kbuf = new_dense.k[:, rows[:, None], :, pos_cl, :].transpose(2, 0, 3, 1, 4)
    vbuf = new_dense.v[:, rows[:, None], :, pos_cl, :].transpose(2, 0, 3, 1, 4)
    cache = paged_ring_flush(cache, kbuf, vbuf, start_pos, active,
                             max_seq, page_size)
    return logits, hidden, cache


def prefill_paged(
    spec: DecoderSpec,
    params: dict,
    ids: jax.Array,        # [N, T] right-padded bucket
    lengths: jax.Array,    # [N]
    slots: jax.Array,      # [N]
    cache: PagedKVCache,
    page_size: int,
    prefix_embeds: Optional[jax.Array] = None,
    prefix_len: Optional[jax.Array] = None,
    return_hidden: bool = False,
):
    """Bucket prefill whose KV lands in the target slots' pages.

    Attention within the bucket is self-contained (causal over the prompt),
    so only the writes differ from core.prefill. Returns all-position
    logits + updated pool.
    """
    n, t = ids.shape
    bt = cache.block_table
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (n, t))
    x = _embed(spec, params, ids, positions)
    if prefix_embeds is not None:
        use_prefix = positions < prefix_len[:, None]
        x = jnp.where(use_prefix[..., None], prefix_embeds.astype(x.dtype), x)

    if spec.pos == "rope":
        cos, sin = _rope_freqs(spec, positions)
    else:
        cos = sin = None

    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    key_valid = positions < lengths[:, None]
    mask = causal[None, :, :] & key_valid[:, None, :]
    if spec.pos == "alibi":
        from .core import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(spec.num_heads, spec.alibi_impl))
        alibi = slopes[:, None] * jnp.arange(t, dtype=jnp.float32)[None, :]
        bias = alibi[None, :, None, :]
    else:
        bias = None

    # flat pool rows for every (row, position); invalid positions dropped
    pool_rows = cache.k.shape[2]
    pages = bt[slots[:, None], positions // page_size]       # [N, T]
    flat = pages * page_size + positions % page_size
    flat = jnp.where(key_valid, flat, pool_rows)             # OOB -> dropped
    flat = flat.reshape(-1)

    scale = 1.0 / math.sqrt(spec.head_dim)
    group = spec.num_heads // spec.num_kv_heads

    from ..ops import attention as attn_ops

    quant = cache.quantized

    def layer(x, inputs):
        lp, kp, vp = inputs[0], inputs[1], inputs[2]
        h = _norm(spec, lp["ln1"], x)
        q, k, v = _qkv(spec, lp, h)
        if cos is not None:
            q = _apply_rope(spec, q, cos, sin)
            k = _apply_rope(spec, k, cos, sin)
        qg = q.reshape(n, t, spec.num_kv_heads, group, spec.head_dim)
        b = (bias.reshape(1, spec.num_kv_heads, group, 1, t)
             if bias is not None else None)
        attn = attn_ops.prefill_attention(qg, k, v, lengths, b, mask, scale)
        attn = attn.reshape(n, t, spec.num_heads, spec.head_dim)
        attn = _attn_out(spec, lp, attn)

        if spec.parallel_residual:
            h2 = _norm(spec, lp["ln2"], x)
            x = x + attn + _mlp(spec, lp, h2)
        else:
            x = x + attn
            h2 = _norm(spec, lp["ln2"], x)
            x = x + _mlp(spec, lp, h2)

        k_rows = k.reshape(-1, spec.num_kv_heads, spec.head_dim)
        v_rows = v.reshape(-1, spec.num_kv_heads, spec.head_dim)
        if quant:
            ksp, vsp = inputs[3], inputs[4]
            from .core import quantize_kv

            kq, ks = quantize_kv(k_rows)       # [NT, K, D] i8, [NT, K] f32
            vq, vs = quantize_kv(v_rows)
            kp = kp.at[:, flat].set(kq.transpose(1, 0, 2), mode="drop")
            vp = vp.at[:, flat].set(vq.transpose(1, 0, 2), mode="drop")
            ksp = ksp.at[:, flat].set(ks.T, mode="drop")
            vsp = vsp.at[:, flat].set(vs.T, mode="drop")
            return x, (kp, vp, ksp, vsp)
        kp = kp.at[:, flat].set(
            k_rows.transpose(1, 0, 2).astype(kp.dtype), mode="drop")
        vp = vp.at[:, flat].set(
            v_rows.transpose(1, 0, 2).astype(vp.dtype), mode="drop")
        return x, (kp, vp)

    xs = ((cache.k, cache.v, cache.k_scale, cache.v_scale) if quant
          else (cache.k, cache.v))
    x, pools = _layer_scan(layer, x, params["layers"], xs)
    if quant:
        new_k, new_v, new_ks, new_vs = pools
        cache = cache._replace(k=new_k, v=new_v, k_scale=new_ks,
                               v_scale=new_vs)
    else:
        new_k, new_v = pools
        cache = cache._replace(k=new_k, v=new_v)
    x = _norm(spec, params["final_norm"], x)
    logits = _unembed(spec, params, x)
    if return_hidden:
        return logits, x, cache
    return logits, cache
