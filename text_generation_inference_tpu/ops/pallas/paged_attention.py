"""Pallas TPU kernel: decode attention over a paged KV pool.

The paged variant of decode_attention.py (and the TPU replacement for the
reference's fms_extras paged `attend()`, reference:
paged_llama_modeling.py:227-268): KV lives in a flat page pool
[P * page_size, K, D]; each slot's pages are named by a block table
[S, max_pages]. The block table is a scalar-prefetch operand, so the KV
block index map dereferences it directly — the kernel streams exactly the
pages a slot owns, in order, and dead trailing pages clamp to the last live
page (DMA elided by Mosaic's consecutive-identical-index rule).

Shapes (pool is HEAD-MAJOR so KV blocks satisfy TPU tiling — a block is
(1, page_size, D) with page_size % 8 == 0 and D equal to the array dim):
  q:          [S, K, G, D]
  k/v pool:   [K, P * page_size, D]
  block_table:[S, max_pages] i32
  ctx:        [S] i32 (live tokens per slot)
  out:        [S, K, G, D]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _flash_page_update(q, k, v, ctx, b, page_size, scale,
                       m_ref, l_ref, acc_ref, ks=None, vs=None):
    """One online-softmax update step over a single page: q [K,G,D] f32,
    k/v [K,page,D] f32; folds the page's scores into the running
    (m, l, acc) scratch state.

    ks/vs ([K, page] f32, optional) are per-row-per-head dequant factors
    for int8 pools: the k scale factors out of the head_dim contraction
    (applied to the scores), the v scale folds into the probabilities
    before the value contraction — identical math to the gather reference
    (paged_decode_attention_partial_reference)."""
    kh, g, d = q.shape
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [K, G, page]
    if ks is not None:
        scores = scores * ks[:, None, :]
    pos = b * page_size + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 2)
    scores = jnp.where(pos < ctx, scores, NEG_INF)

    m_prev = m_ref[...].reshape(kh, g, 1)
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(scores == NEG_INF, 0.0, p)
    alpha = jnp.exp(m_prev - m_safe)
    alpha = jnp.where(m_prev == NEG_INF, 0.0, alpha)

    l_prev = l_ref[...].reshape(kh, g, 1)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    l_ref[...] = l_new.reshape(kh * g, 1)
    v_valid = (b * page_size + jax.lax.broadcasted_iota(
        jnp.int32, v.shape, 1)) < ctx
    v = jnp.where(v_valid, v, 0.0)
    p_v = p * vs[:, None, :] if vs is not None else p
    pv = jax.lax.dot_general(
        p_v, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [K, G, D]
    acc_ref[...] = (acc_ref[...].reshape(kh, g, d) * alpha
                    + pv).reshape(kh * g, d)
    m_ref[...] = m_new.reshape(kh * g, 1)


def _kernel_all_heads_stats(ctx_ref, bt_ref, q_ref, k_ref, v_ref,
                            o_ref, mo_ref, lo_ref,
                            m_ref, l_ref, acc_ref, *,
                            page_size: int, scale: float):
    """_kernel_all_heads variant that also writes the softmax row max (m)
    and normalizer (l) so the caller can merge this partial attention with
    keys held elsewhere (the in-chunk ring buffer) — flash-decoding style
    two-part softmax combination."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    ctx = ctx_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b * page_size < ctx)
    def _compute():
        _flash_page_update(q_ref[0].astype(jnp.float32),
                           k_ref[...].astype(jnp.float32),
                           v_ref[...].astype(jnp.float32),
                           ctx, b, page_size, scale, m_ref, l_ref, acc_ref)

    @pl.when(b == nb - 1)
    def _finish():
        kh, g, d = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
        # UNNORMALIZED accumulator + stats out: caller merges and divides
        o_ref[0] = acc_ref[...].reshape(kh, g, d).astype(o_ref.dtype)
        mo_ref[0] = m_ref[...].reshape(kh, g).astype(mo_ref.dtype)
        lo_ref[0] = l_ref[...].reshape(kh, g).astype(lo_ref.dtype)


def _kernel_all_heads_stats_stacked(li_ref, ctx_ref, bt_ref,
                                    q_ref, k_ref, v_ref,
                                    o_ref, mo_ref, lo_ref,
                                    m_ref, l_ref, acc_ref, *,
                                    page_size: int, scale: float):
    """Stacked-pool variant of _kernel_all_heads_stats: the KV pools keep
    their layer axis ([L, K, R, D]) and the layer to attend over arrives as
    a scalar-prefetch operand dereferenced by the block index map. This is
    what lets the per-layer decode scan close over the WHOLE pool instead
    of carrying it as scan xs — a scan-xs dynamic-slice feeding a custom
    call is materialized by XLA (slice read + slice write + kernel read ≈
    3x the KV traffic; same pathology ops/pallas/int4_matmul.py's stacked
    kernel removed for weights, measured in scripts/probe_decode.py)."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    ctx = ctx_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b * page_size < ctx)
    def _compute():
        _flash_page_update(q_ref[0].astype(jnp.float32),
                           k_ref[0].astype(jnp.float32),
                           v_ref[0].astype(jnp.float32),
                           ctx, b, page_size, scale, m_ref, l_ref, acc_ref)

    @pl.when(b == nb - 1)
    def _finish():
        kh, g, d = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
        o_ref[0] = acc_ref[...].reshape(kh, g, d).astype(o_ref.dtype)
        mo_ref[0] = m_ref[...].reshape(kh, g).astype(mo_ref.dtype)
        lo_ref[0] = l_ref[...].reshape(kh, g).astype(lo_ref.dtype)


def _kernel_all_heads_stats_stacked_i8(li_ref, ctx_ref, bt_ref,
                                       q_ref, k_ref, v_ref,
                                       ks_ref, vs_ref,
                                       o_ref, mo_ref, lo_ref,
                                       m_ref, l_ref, acc_ref, *,
                                       page_size: int, scale: float):
    """int8-pool variant of _kernel_all_heads_stats_stacked: two extra
    operands carry the per-row-per-head quantization factors
    ([L, K, POOL_R] f32, blocked like the KV pools), dereferenced through
    the same block-table index map. This keeps the long-context int8-KV
    regime on the Pallas kernel instead of the XLA gather fallback (which
    materializes the gathered pages in HBM every (layer, step))."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    ctx = ctx_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b * page_size < ctx)
    def _compute():
        _flash_page_update(q_ref[0].astype(jnp.float32),
                           k_ref[0].astype(jnp.float32),
                           v_ref[0].astype(jnp.float32),
                           ctx, b, page_size, scale, m_ref, l_ref, acc_ref,
                           ks=ks_ref[0], vs=vs_ref[0])

    @pl.when(b == nb - 1)
    def _finish():
        kh, g, d = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
        o_ref[0] = acc_ref[...].reshape(kh, g, d).astype(o_ref.dtype)
        mo_ref[0] = m_ref[...].reshape(kh, g).astype(mo_ref.dtype)
        lo_ref[0] = l_ref[...].reshape(kh, g).astype(lo_ref.dtype)


def _kernel_all_heads(ctx_ref, bt_ref, q_ref, k_ref, v_ref, o_ref,
                      m_ref, l_ref, acc_ref, *, page_size: int, scale: float):
    """Grid (S, num_pages): one program handles ALL kv heads for one
    (slot, page) — 4-8x fewer programs than a per-head grid, which matters
    because each program is tiny."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    ctx = ctx_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b * page_size < ctx)
    def _compute():
        _flash_page_update(q_ref[0].astype(jnp.float32),
                           k_ref[...].astype(jnp.float32),
                           v_ref[...].astype(jnp.float32),
                           ctx, b, page_size, scale, m_ref, l_ref, acc_ref)

    @pl.when(b == nb - 1)
    def _finish():
        denom = jnp.maximum(l_ref[...], 1e-30)
        kh, g, d = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
        out = (acc_ref[...] / denom).reshape(kh, g, d)
        o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                           block_table: jax.Array, ctx: jax.Array,
                           page_size: int, *, interpret: bool = False
                           ) -> jax.Array:
    """See module docstring. Returns [S, K, G, D]."""
    s, kh, g, d = q.shape
    max_pages = block_table.shape[1]
    scale = 1.0 / math.sqrt(d)

    def q_index(si, bi, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    def kv_index(si, bi, ctx_ref, bt_ref):
        # clamp to the table width too: a freed slot's stale ctx may imply
        # more pages than the (possibly live-page-sliced) table holds
        last_live = jnp.clip(pl.cdiv(ctx_ref[si], page_size) - 1, 0,
                             max_pages - 1)
        page = bt_ref[si, jnp.minimum(bi, last_live)]
        return (0, page, 0)

    def o_index(si, bi, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, max_pages),
        in_specs=[
            pl.BlockSpec((1, kh, g, d), q_index),
            pl.BlockSpec((kh, page_size, d), kv_index),
            pl.BlockSpec((kh, page_size, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, kh, g, d), o_index),
        scratch_shapes=[
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel_all_heads, page_size=page_size, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, kh, g, d), q.dtype),
        interpret=interpret,
    )
    return kernel(ctx.astype(jnp.int32), block_table.astype(jnp.int32),
                  q, k_pool, v_pool)


def paged_decode_attention_partial(q: jax.Array, k_pool: jax.Array,
                                   v_pool: jax.Array, block_table: jax.Array,
                                   ctx: jax.Array, page_size: int,
                                   *, interpret: bool = False):
    """Attention over the pool returning the UNNORMALIZED accumulator and
    softmax stats (acc [S,K,G,D] f32, m [S,K,G] f32, l [S,K,G] f32) for
    flash-decoding-style merging with another key set. For slots with
    ctx == 0, m = -inf and l = 0 (the merge then ignores the pool part)."""
    s, kh, g, d = q.shape
    max_pages = block_table.shape[1]
    scale = 1.0 / math.sqrt(d)

    def q_index(si, bi, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    def kv_index(si, bi, ctx_ref, bt_ref):
        # clamp to the table width too: a freed slot's stale ctx may imply
        # more pages than the (possibly live-page-sliced) table holds
        last_live = jnp.clip(pl.cdiv(ctx_ref[si], page_size) - 1, 0,
                             max_pages - 1)
        page = bt_ref[si, jnp.minimum(bi, last_live)]
        return (0, page, 0)

    def o_index(si, bi, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    def stat_index(si, bi, ctx_ref, bt_ref):
        return (si, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, max_pages),
        in_specs=[
            pl.BlockSpec((1, kh, g, d), q_index),
            pl.BlockSpec((kh, page_size, d), kv_index),
            pl.BlockSpec((kh, page_size, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, kh, g, d), o_index),
            pl.BlockSpec((1, kh, g), stat_index),
            pl.BlockSpec((1, kh, g), stat_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel_all_heads_stats, page_size=page_size,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, kh, g, d), jnp.float32),
            jax.ShapeDtypeStruct((s, kh, g), jnp.float32),
            jax.ShapeDtypeStruct((s, kh, g), jnp.float32),
        ],
        interpret=interpret,
    )
    return kernel(ctx.astype(jnp.int32), block_table.astype(jnp.int32),
                  q, k_pool, v_pool)


def paged_decode_attention_partial_stacked(q: jax.Array, k_pools: jax.Array,
                                           v_pools: jax.Array,
                                           block_table: jax.Array,
                                           ctx: jax.Array,
                                           layer_idx: jax.Array,
                                           page_size: int,
                                           *, k_scale_pools=None,
                                           v_scale_pools=None,
                                           interpret: bool = False):
    """paged_decode_attention_partial over LAYER-STACKED pools
    ([L, K, POOL_R, D]) with the layer picked by a scalar-prefetched index
    — see _kernel_all_heads_stats_stacked for why this beats slicing the
    pool per layer in a scan. layer_idx: [1] (or scalar) int32.

    k_scale_pools/v_scale_pools ([L, K, POOL_R] f32, optional): per-row
    dequant factors for int8 KV pools, blocked and block-table-indexed
    like the pools themselves (_kernel_all_heads_stats_stacked_i8)."""
    s, kh, g, d = q.shape
    max_pages = block_table.shape[1]
    scale = 1.0 / math.sqrt(d)
    layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    quant = k_scale_pools is not None

    def q_index(si, bi, li_ref, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    def kv_index(si, bi, li_ref, ctx_ref, bt_ref):
        # clamp to the table width too: a freed slot's stale ctx may imply
        # more pages than the (possibly live-page-sliced) table holds
        last_live = jnp.clip(pl.cdiv(ctx_ref[si], page_size) - 1, 0,
                             max_pages - 1)
        page = bt_ref[si, jnp.minimum(bi, last_live)]
        return (li_ref[0], 0, page, 0)

    def scale_index(si, bi, li_ref, ctx_ref, bt_ref):
        last_live = jnp.clip(pl.cdiv(ctx_ref[si], page_size) - 1, 0,
                             max_pages - 1)
        page = bt_ref[si, jnp.minimum(bi, last_live)]
        return (li_ref[0], 0, page)

    def o_index(si, bi, li_ref, ctx_ref, bt_ref):
        return (si, 0, 0, 0)

    def stat_index(si, bi, li_ref, ctx_ref, bt_ref):
        return (si, 0, 0)

    in_specs = [
        pl.BlockSpec((1, kh, g, d), q_index),
        pl.BlockSpec((1, kh, page_size, d), kv_index),
        pl.BlockSpec((1, kh, page_size, d), kv_index),
    ]
    operands = [q, k_pools, v_pools]
    if quant:
        in_specs += [
            pl.BlockSpec((1, kh, page_size), scale_index),
            pl.BlockSpec((1, kh, page_size), scale_index),
        ]
        operands += [k_scale_pools, v_scale_pools]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s, max_pages),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, kh, g, d), o_index),
            pl.BlockSpec((1, kh, g), stat_index),
            pl.BlockSpec((1, kh, g), stat_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, 1), jnp.float32),
            pltpu.VMEM((kh * g, d), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(
            _kernel_all_heads_stats_stacked_i8 if quant
            else _kernel_all_heads_stats_stacked,
            page_size=page_size, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, kh, g, d), jnp.float32),
            jax.ShapeDtypeStruct((s, kh, g), jnp.float32),
            jax.ShapeDtypeStruct((s, kh, g), jnp.float32),
        ],
        interpret=interpret,
    )
    return kernel(layer_idx, ctx.astype(jnp.int32),
                  block_table.astype(jnp.int32), *operands)


def paged_decode_attention_partial_reference(q, k_pool, v_pool, block_table,
                                             ctx, page_size,
                                             alibi_slopes_kg=None,
                                             k_scale_pool=None,
                                             v_scale_pool=None):
    """XLA gather-based equivalent of paged_decode_attention_partial.
    Gathered key index t IS the absolute position (pages are gathered in
    block-table order), so ALiBi bias is slopes * t when requested.

    With int8 pools, k_scale_pool/v_scale_pool ([K, POOL_R] f32) carry the
    per-row-per-head quantization factors: the k scale factors out of the
    head_dim contraction (applied to scores), the v scale folds into the
    probabilities before the value contraction — same folding as the slot
    engine's int8 read path (models/core.py decode_ring_step)."""
    s, kh, g, d = q.shape
    rows = (block_table[:, :, None] * page_size
            + jnp.arange(page_size)[None, None, :]).reshape(s, -1)
    k = jnp.take(k_pool, rows, axis=1, mode="clip")          # [K, S, T', D]
    v = jnp.take(v_pool, rows, axis=1, mode="clip")
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("skgd,kstd->skgt", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    t = rows.shape[1]
    if k_scale_pool is not None:
        ks = jnp.take(k_scale_pool, rows, axis=1, mode="clip")  # [K, S, T']
        scores = scores * jnp.swapaxes(ks, 0, 1)[:, :, None, :]
    if alibi_slopes_kg is not None:
        scores = scores + (alibi_slopes_kg[None, :, :, None]
                           * jnp.arange(t, dtype=jnp.float32)[None, None, None])
    mask = jnp.arange(t)[None, :] < ctx[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1)                               # [S, K, G]
    m_safe = jnp.where(m == NEG_INF, 0.0, m)
    p = jnp.exp(scores - m_safe[..., None])
    p = jnp.where(scores == NEG_INF, 0.0, p)
    l = jnp.sum(p, axis=-1)
    if v_scale_pool is not None:
        vs = jnp.take(v_scale_pool, rows, axis=1, mode="clip")  # [K, S, T']
        p_v = p * jnp.swapaxes(vs, 0, 1)[:, :, None, :]
    else:
        p_v = p
    acc = jnp.einsum("skgt,kstd->skgd", p_v, v.astype(jnp.float32))
    return acc, m, l


def paged_decode_attention_reference(q, k_pool, v_pool, block_table, ctx,
                                     page_size, alibi_slopes_kg=None):
    """XLA gather-based reference (also the CPU / ALiBi fallback path).
    Gathered key index t is the absolute position, so ALiBi bias is
    slopes * t when requested."""
    s, kh, g, d = q.shape
    max_pages = block_table.shape[1]
    # gather each slot's pages into contiguous [K, S, T', D]
    rows = (block_table[:, :, None] * page_size
            + jnp.arange(page_size)[None, None, :]).reshape(s, -1)
    k = jnp.take(k_pool, rows, axis=1, mode="clip")          # [K, S, T', D]
    v = jnp.take(v_pool, rows, axis=1, mode="clip")
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("skgd,kstd->skgt", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    t = rows.shape[1]
    if alibi_slopes_kg is not None:
        scores = scores + (alibi_slopes_kg[None, :, :, None]
                           * jnp.arange(t, dtype=jnp.float32)[None, None, None])
    mask = jnp.arange(t)[None, :] < ctx[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("skgt,kstd->skgd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
