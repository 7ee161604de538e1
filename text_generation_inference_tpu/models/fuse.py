"""Load-time matmul fusion: wq|wk|wv → w_qkv, w_gate|w_up → w_gu.

The reference fuses these in its checkpoint loaders (reference:
flash_llama_modeling.py fused gate_up, flash_santacoder fused c_attn).
Fewer, larger matmuls stream weights in longer contiguous runs and halve
kernel-launch overhead in the decode step.

Only applied when the tensor-parallel model axis is 1: a fused column-
sharded weight would split across the q/k/v segment boundaries and force
resharding at the split. Quantized (Int4Weight) layers fuse too — packed
qweight/qzeros/scales all concatenate along the output axis — except under
act-order where per-projection input permutations differ.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.quant.int4 import Int4Weight
from ..ops.quant.int8 import Int8OutlierWeight, Int8Weight
from .core import DecoderSpec


def _can_fuse(ws) -> bool:
    kinds = {type(w) for w in ws}
    if len(kinds) != 1:
        return False
    if isinstance(ws[0], Int8OutlierWeight):
        # co-located projections share their input, hence the same
        # calibration stats and outlier set — but verify, since fusing
        # different outlier_idx would silently mis-route features
        import numpy as np

        return (all(w.q.shape[:-1] == ws[0].q.shape[:-1] for w in ws)
                and all(np.array_equal(np.asarray(w.outlier_idx),
                                       np.asarray(ws[0].outlier_idx))
                        for w in ws[1:]))
    if isinstance(ws[0], Int8Weight):
        return all(w.q.shape[:-1] == ws[0].q.shape[:-1] for w in ws)
    if isinstance(ws[0], Int4Weight):
        if any(w.perm is not None for w in ws):
            return False
        g = ws[0]
        return all(
            w.qweight.shape[:-1] == g.qweight.shape[:-1]
            and w.scales.shape[0:1] + () == g.scales.shape[0:1]
            for w in ws)
    return True


def _concat_out(ws):
    """Concatenate along the output axis (last dim; axis 2 with the layer
    stack in front)."""
    if isinstance(ws[0], Int8OutlierWeight):
        return Int8OutlierWeight(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1),
            outlier_idx=ws[0].outlier_idx,
            outlier_w=jnp.concatenate([w.outlier_w for w in ws], axis=-1))
    if isinstance(ws[0], Int8Weight):
        return Int8Weight(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1))
    if isinstance(ws[0], Int4Weight):
        return Int4Weight(
            qweight=jnp.concatenate([w.qweight for w in ws], axis=-1),
            qzeros=jnp.concatenate([w.qzeros for w in ws], axis=-1),
            scales=jnp.concatenate([w.scales for w in ws], axis=-1),
            g_idx=ws[0].g_idx,
            perm=None,
            zbias=(jnp.concatenate([w.zbias for w in ws], axis=-1)
                   if all(w.zbias is not None for w in ws) else None),
        )
    return jnp.concatenate(ws, axis=-1)


def fuse_params(spec: DecoderSpec, params: dict) -> dict:
    """Returns params with fused attention/MLP input projections (original
    keys removed). No-op when already fused."""
    lp = dict(params["layers"])
    if "wq" in lp and _can_fuse([lp["wq"], lp["wk"], lp["wv"]]):
        lp["w_qkv"] = _concat_out([lp.pop("wq"), lp.pop("wk"), lp.pop("wv")])
        if "bq" in lp:
            lp["b_qkv"] = jnp.concatenate(
                [lp.pop("bq"), lp.pop("bk"), lp.pop("bv")], axis=-1)
    if "w_gate" in lp and _can_fuse([lp["w_gate"], lp["w_up"]]):
        lp["w_gu"] = _concat_out([lp.pop("w_gate"), lp.pop("w_up")])
        if "b_gate" in lp:
            lp["b_gu"] = jnp.concatenate(
                [lp.pop("b_gate"), lp.pop("b_up")], axis=-1)
    out = dict(params)
    out["layers"] = lp
    return out
