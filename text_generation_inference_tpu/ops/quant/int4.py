"""GPTQ INT4 weight representation + XLA dequant path.

Storage layout is the GPTQ checkpoint format the reference consumes with its
exllama/triton kernels (reference: server/.../utils/gptq/quant_linear.py,
utils/weights.py:150-229):

  qweight [in/8, out] int32 — eight 4-bit rows packed little-endian per word
  qzeros  [groups, out/8] int32 — packed 4-bit zero-points (stored with the
          GPTQ "-1" bias: true zero-point = packed + 1)
  scales  [groups, out] f16/f32
  g_idx   [in] int32 — row → group map (non-trivial under act-order)

dequant: W[i, j] = scales[g_idx[i], j] * (unpack(qweight)[i, j]
                                          - unpack(qzeros)[g_idx[i], j] - 1)

`Int4Weight` is a pytree node, so it flows through jit/donation/GSPMD like
any array leaf; sharding specs treat qweight/scales/qzeros as column-sharded
together (reference sharding rules: utils/weights.py:115-201).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Int4Weight(NamedTuple):
    qweight: jax.Array   # [in/8, out] int32 (rows in GROUP-SEQUENTIAL order)
    qzeros: jax.Array    # [groups, out/8] int32
    scales: jax.Array    # [groups, out] float
    g_idx: jax.Array     # [in] int32 (sequential after normalization)
    # act-order input permutation: x must be gathered as x[..., perm] before
    # the matmul (exllama's q_perm, reference: utils/gptq/exllamav2.py:31-48).
    # None for checkpoints without act-order.
    perm: jax.Array | None = None
    # precomputed (zero+1)*scale [groups, out] f32 for the fused TPU kernel
    # (ops/pallas/int4_matmul.py); populated by compute_zbias().
    zbias: jax.Array | None = None
    # NATIVE s4 representation [in, out] jnp.int4 holding q - 8 (signed):
    # Mosaic reads s4 arrays directly with no manual nibble unpack, which
    # is ~12x faster than the int32-packed kernel (the unpack's
    # [in/8, 8, out] -> [in, out] reshape crosses sublanes — a relayout).
    # Populated by populate_q4(); qweight/qzeros are dropped then to free
    # HBM. Dequant: w = q4 * scale - (zbias - 8 * scale).
    q4: jax.Array | None = None
    # LANE-major packed persistence [in, out/8] int32 (8 OUT-neighbors per
    # word, little-nibble). s4 arrays cannot cross jit boundaries on every
    # backend, so q4 is rebuilt inside each consuming jit — from qlane that
    # rebuild is shift/mask + a free minor-dim reshape, where the GPTQ
    # row-major layout costs a full cross-sublane relayout (~80 ms per 7B
    # conversion vs ~10). Populated once at load by ops.linear
    # .prepare_storage(); qweight/qzeros are dropped then.
    qlane: jax.Array | None = None
    # BLOCKED scale/zbias views [L, ni, gpb_pad, out] for the stacked
    # scalar-prefetch kernel (ops/pallas/int4_matmul.py::
    # int4_matmul_s4_stacked). Populated in-trace by ops.linear
    # .prepare_params(rows=...) once per dispatch — never persisted, never
    # sharded (the layout is derived from scales/zbias after sharding).
    sc_b: jax.Array | None = None
    zb_b: jax.Array | None = None
    # MLP-fusion blocked scale/zbias views for the DOWN projection of a
    # fused GLU pair ([L, nj, gpb_pad, hidden], block_in = the fused
    # kernel's intermediate block) — populated by ops.linear
    # .prepare_params(rows=...) when the layers dict holds a fusable
    # w_gu/w_down pair (ops/pallas/int4_matmul.py::int4_mlp_s4_stacked)
    mlp_sc_b: jax.Array | None = None
    mlp_zb_b: jax.Array | None = None

    @property
    def in_features(self) -> int:
        if self.qweight is not None:
            return self.qweight.shape[-2] * 8
        if self.qlane is not None:
            return self.qlane.shape[-2]
        return self.q4.shape[-2]

    @property
    def out_features(self) -> int:
        if self.qweight is not None:
            return self.qweight.shape[-1]
        if self.qlane is not None:
            return self.qlane.shape[-1] * 8
        return self.q4.shape[-1]


def compute_zbias(w: Int4Weight) -> Int4Weight:
    """Populate the fused-kernel zbias = (zero+1)*scale term."""
    zeros = unpack_cols(w.qzeros) + 1
    zb = zeros.astype(jnp.float32) * w.scales.astype(jnp.float32)
    return w._replace(zbias=zb)


def normalize_act_order(qweight: np.ndarray, qzeros: np.ndarray,
                        scales: np.ndarray, g_idx: np.ndarray) -> Int4Weight:
    """Convert a raw GPTQ checkpoint (possibly act-order) into the
    group-sequential layout the fused kernel expects, hoisting the row
    shuffle into a one-time input permutation."""
    in_f = g_idx.shape[0]
    groups = scales.shape[0]
    groupsize = in_f // groups
    expected = np.arange(in_f) // groupsize
    if np.array_equal(g_idx, expected):
        return compute_zbias(Int4Weight(
            qweight=jnp.asarray(qweight), qzeros=jnp.asarray(qzeros),
            scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx, jnp.int32),
            perm=None))
    # stable sort rows by group: perm[r] = original row index
    perm = np.argsort(g_idx, kind="stable").astype(np.int32)
    q = np.asarray(unpack_rows(jnp.asarray(qweight)))
    q = q[perm]
    return compute_zbias(Int4Weight(
        qweight=jnp.asarray(pack_rows(q)),
        qzeros=jnp.asarray(qzeros),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(expected, jnp.int32),
        perm=jnp.asarray(perm, jnp.int32)))


def populate_q4(w: Int4Weight) -> Int4Weight:
    """Convert to the native-s4 representation (see Int4Weight.q4); the
    packed source is dropped to free its HBM. Prefers the lane-major qlane
    source (relayout-free unpack); falls back to the GPTQ row-major
    qweight. Requires zbias (compute_zbias) — every loader/quantizer
    populates it."""
    assert w.zbias is not None, "populate_q4 requires zbias"

    if w.qlane is not None:
        def one(ql):
            q = unpack_lane(ql) - 8               # center into s4 range
            return q.astype(jnp.int8).astype(jnp.int4)

        src = w.qlane
    else:
        def one(qw):
            q = unpack_rows(qw) - 8
            return q.astype(jnp.int8).astype(jnp.int4)

        src = w.qweight
    if src.ndim == 3:                             # stacked layers [L, ...]
        q4 = jnp.stack([one(src[i]) for i in range(src.shape[0])])
    else:
        q4 = one(src)
    return w._replace(q4=q4, qweight=None, qzeros=None, qlane=None)


def dequantize_s4(w: Int4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Full-precision [in, out] weight from the native-s4 representation."""
    s = jnp.take(w.scales.astype(jnp.float32), w.g_idx, axis=0)
    zb4 = w.zbias.astype(jnp.float32) - 8.0 * w.scales.astype(jnp.float32)
    z = jnp.take(zb4, w.g_idx, axis=0)
    return (w.q4.astype(jnp.float32) * s - z).astype(dtype)


def unpack_rows(packed: jax.Array) -> jax.Array:
    """[n/8, m] int32 → [n, m] int32 of 4-bit values (row-packed)."""
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, :, None]
    u = (packed[:, None, :] >> shifts) & 0xF
    return u.reshape(packed.shape[0] * 8, packed.shape[1])


def unpack_lane(qlane: jax.Array) -> jax.Array:
    """[n, m/8] int32 → [n, m] int32 of 4-bit values (lane-packed: 8
    column-neighbors per word, little-nibble). The final reshape merges
    MINOR dims only — no relayout, unlike unpack_rows."""
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :]
    u = (qlane[:, :, None] >> shifts) & 0xF       # [n, m/8, 8]
    return u.reshape(qlane.shape[0], qlane.shape[1] * 8)


def pack_lane(q: jax.Array) -> jax.Array:
    """[n, m] 4-bit values → [n, m/8] int32 lane-packed (unpack_lane
    inverse). int32 wrap on the top nibble is intended (disjoint bits)."""
    qw = q.astype(jnp.int32).reshape(q.shape[0], q.shape[1] // 8, 8)
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :]
    return jnp.sum(qw << shifts, axis=-1).astype(jnp.int32)


def to_lane(w: Int4Weight) -> Int4Weight:
    """One-time storage conversion GPTQ row-major → lane-major (see
    Int4Weight.qlane). Pays the row-unpack relayout once at load instead
    of on every consuming jit dispatch."""
    if w.qlane is not None or w.qweight is None:
        return w

    def one(qw):
        return pack_lane(unpack_rows(qw))

    if w.qweight.ndim == 3:
        qlane = jnp.stack([one(w.qweight[i])
                           for i in range(w.qweight.shape[0])])
    else:
        qlane = one(w.qweight)
    return w._replace(qlane=qlane, qweight=None, qzeros=None)


def unpack_cols(packed: jax.Array) -> jax.Array:
    """[n, m/8] int32 → [n, m] int32 of 4-bit values (column-packed)."""
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :]
    u = (packed[:, :, None] >> shifts) & 0xF
    return u.reshape(packed.shape[0], packed.shape[1] * 8)


def dequantize(w: Int4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Full-precision [in, out] weight (XLA fallback path)."""
    q = unpack_rows(w.qweight)                       # [in, out]
    zeros = unpack_cols(w.qzeros) + 1                # [groups, out]
    scales = w.scales.astype(jnp.float32)
    z = jnp.take(zeros, w.g_idx, axis=0)             # [in, out]
    s = jnp.take(scales, w.g_idx, axis=0)
    return ((q - z).astype(jnp.float32) * s).astype(dtype)


def matmul_dequant(x: jax.Array, w: Int4Weight) -> jax.Array:
    """x @ dequant(w) — the XLA fallback (the Pallas fused kernel is in
    ops/pallas/int4_matmul.py)."""
    if w.q4 is not None:
        return jnp.dot(x, dequantize_s4(w, x.dtype))
    return jnp.dot(x, dequantize(w, x.dtype))


def quantize_rtn(weight: np.ndarray, groupsize: int = 128) -> Int4Weight:
    """Round-to-nearest groupwise INT4 quantization of a [in, out] f32
    weight (for tests and as the starting point of the GPTQ algorithm)."""
    in_f, out_f = weight.shape
    assert in_f % groupsize == 0 and in_f % 8 == 0 and out_f % 8 == 0
    groups = in_f // groupsize
    w = weight.reshape(groups, groupsize, out_f).astype(np.float32)
    wmax = w.max(axis=1)
    wmin = w.min(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8)          # [groups, out]
    zero_f = np.round(-wmin / scale)
    zero = np.clip(zero_f, 0, 15).astype(np.int32)          # [groups, out]
    q = np.round(w / scale[:, None, :]) + zero[:, None, :]
    q = np.clip(q, 0, 15).astype(np.int32).reshape(in_f, out_f)

    return compute_zbias(Int4Weight(
        qweight=jnp.asarray(pack_rows(q)),
        qzeros=jnp.asarray(pack_cols(zero - 1)),
        scales=jnp.asarray(scale, jnp.float32),
        g_idx=jnp.asarray(np.arange(in_f) // groupsize, jnp.int32),
    ))


def quantize_stacked_rtn(weight, groupsize: int = 128) -> Int4Weight:
    """[(L,) in, out] float → stacked Int4Weight (per-layer RTN, same
    stacked layout as models/families._stack_linear produces from GPTQ
    checkpoints). Used by tests, the multichip dry run, and the
    quantize=int4 on-the-fly path."""
    w = np.asarray(weight, np.float32)
    if w.ndim == 2:
        return quantize_rtn(w, groupsize)
    per = [quantize_rtn(w[i], groupsize) for i in range(w.shape[0])]
    return Int4Weight(
        qweight=jnp.stack([p.qweight for p in per]),
        qzeros=jnp.stack([p.qzeros for p in per]),
        scales=jnp.stack([p.scales for p in per]),
        g_idx=jnp.stack([p.g_idx for p in per]),
        perm=None,
        zbias=jnp.stack([p.zbias for p in per]),
    )


def quantize_layer_params_int4(params: dict, groupsize: int = 128) -> dict:
    """Quantize every stacked linear in params['layers'] to Int4Weight
    (embeddings / lm_head / norms stay full precision, matching the
    reference's GPTQ layer placement — reference: utils/layers.py:172-203
    routes only Linear weights through QuantLinear)."""
    from .int8 import LINEAR_KEYS

    out = dict(params)
    lp = dict(params["layers"])
    for k in list(lp):
        if k in LINEAR_KEYS and isinstance(lp[k], jax.Array):
            lp[k] = quantize_stacked_rtn(np.asarray(lp[k], np.float32),
                                         groupsize)
    out["layers"] = lp
    return out


def pack_rows(q: np.ndarray) -> np.ndarray:
    """[in, out] 4-bit values → [in/8, out] int32."""
    in_f, out_f = q.shape
    q = q.reshape(in_f // 8, 8, out_f).astype(np.uint32)
    packed = np.zeros((in_f // 8, out_f), np.uint32)
    for j in range(8):
        packed |= q[:, j, :] << (4 * j)
    return packed.astype(np.int32)


def pack_cols(q: np.ndarray) -> np.ndarray:
    """[groups, out] 4-bit values → [groups, out/8] int32."""
    g, out_f = q.shape
    q = (q.astype(np.int64) & 0xF).reshape(g, out_f // 8, 8).astype(np.uint32)
    packed = np.zeros((g, out_f // 8), np.uint32)
    for j in range(8):
        packed |= q[:, :, j] << (4 * j)
    return packed.astype(np.int32)


def register_pytree() -> None:
    # NamedTuple is automatically a pytree; nothing to do, kept for clarity.
    pass
