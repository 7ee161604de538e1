"""Tensor-parallel sharding: device mesh + PartitionSpecs for every tensor.

The reference implements tensor parallelism as load-time weight slicing plus
explicit collectives in the layer forward passes (reference:
server/.../utils/layers.py:215-357 — TensorParallelColumnLinear shards dim 0,
TensorParallelRowLinear shards dim 1 + all_reduce, TensorParallelHead and
TensorParallelEmbedding shard the vocab + all_gather/all_reduce; sharding
rules in utils/weights.py:79-113), with one process per GPU in lockstep.

Here the same partitioning is expressed as GSPMD `PartitionSpec`s over a
`jax.sharding.Mesh` with axes ("data", "model"): the partitioner inserts the
ICI all-reduces after row-sharded matmuls automatically, one process drives
all chips, and the reference's L3 RPC fan-out layer does not exist.

Mapping of the reference's scheme (per decoder layer):
  wq/wk/wv  [L, D, heads*dh]  -> shard last dim on "model" (column-parallel)
  wo        [L, heads*dh, D]  -> shard dim 1 on "model" (row-parallel,
                                 all-reduce after — layers.py:318-322)
  w_gate/up [L, D, F]         -> column-parallel
  w_down    [L, F, D]         -> row-parallel
  embed     [V, D]            -> vocab-sharded (layers.py:325-357)
  lm_head   [D, V]            -> vocab-sharded output (layers.py:221-277)
  KV cache  [L, S, K, T, Dh]  -> shard kv heads on "model" when divisible
  norms/biases of row outputs -> replicated
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.core import DecoderSpec, KVCache
from ..ops.quant.int4 import Int4Weight
from ..ops.quant.int8 import Int8OutlierWeight, Int8Weight


def make_mesh(model_parallel: Optional[int] = None,
              data_parallel: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel is None:
        model_parallel = n // data_parallel
    need = model_parallel * data_parallel
    assert need <= n, f"mesh {data_parallel}x{model_parallel} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def _shardable(dim: int, mesh: Mesh) -> bool:
    return dim % mesh.shape["model"] == 0


def _quant_leaf_specs(arr, kind: str, ms: int):
    """Per-field PartitionSpecs for a quantized weight leaf.

    The reference shards GPTQ tensors field-by-field at load time
    (reference: server/.../utils/weights.py:115-201 — column loading slices
    qweight/qzeros/scales on the output dim, row loading slices qweight on
    the packed input dim and scales/qzeros on the group dim, g_idx stays
    whole). Here the same rules become per-field PartitionSpecs on the
    "model" mesh axis; GSPMD inserts the collectives. g_idx and the
    act-order input permutation stay replicated (the perm gathers the
    *global* activation vector — the analogue of the reference's
    act-order×TP special-casing at weights.py:150-156, which keeps a
    whole-tensor view for the shuffle).

    `kind` is "col" (shard out dim), "row" (shard in dim) or "repl".
    Falls back to full replication when any field's sharded dim does not
    divide the mesh axis (mirroring the dense col_or_repl/row_or_repl
    fallbacks).
    """
    def lead(field):
        # stacked loaders put a leading [L] layer dim on every field
        return (None,) * (field.ndim - 2)

    def lead1(field):
        return (None,) * (field.ndim - 1)

    if isinstance(arr, Int8Weight):
        # q [(L,) in, out] int8; scale [(L,) out] f32
        if kind == "col" and arr.out_features % ms == 0:
            return Int8Weight(q=P(*lead(arr.q), None, "model"),
                              scale=P(*lead1(arr.scale), "model"))
        if kind == "row" and arr.in_features % ms == 0:
            return Int8Weight(q=P(*lead(arr.q), "model", None),
                              scale=P(*lead1(arr.scale), None))
        return Int8Weight(q=P(*lead(arr.q), None, None),
                          scale=P(*lead1(arr.scale), None))

    if isinstance(arr, Int8OutlierWeight):
        # q/scale shard like Int8Weight; outlier_w [(L,) K, out] follows
        # the OUT split for col-parallel. outlier_idx names GLOBAL input
        # features, so a row split of the int8 part would leave the gather
        # crossing shards — outlier_idx/outlier_w stay replicated for
        # "row" (K is tiny; the bf16 side is cheap to replicate), matching
        # the reference's rule of degrading gracefully when a quantized
        # layout and TP split don't compose (weights.py:150-156).
        if kind == "col" and arr.out_features % ms == 0:
            return Int8OutlierWeight(
                q=P(*lead(arr.q), None, "model"),
                scale=P(*lead1(arr.scale), "model"),
                outlier_idx=P(*lead1(arr.outlier_idx), None),
                outlier_w=P(*lead(arr.outlier_w), None, "model"))
        if kind == "row" and arr.in_features % ms == 0:
            return Int8OutlierWeight(
                q=P(*lead(arr.q), "model", None),
                scale=P(*lead1(arr.scale), None),
                outlier_idx=P(*lead1(arr.outlier_idx), None),
                outlier_w=P(*lead(arr.outlier_w), None, None))
        return Int8OutlierWeight(
            q=P(*lead(arr.q), None, None),
            scale=P(*lead1(arr.scale), None),
            outlier_idx=P(*lead1(arr.outlier_idx), None),
            outlier_w=P(*lead(arr.outlier_w), None, None))

    # Int4Weight; groups = scales.shape[-2]
    w: Int4Weight = arr
    groups = w.scales.shape[-2]

    def fs(field, *tail):
        return None if field is None else P(*lead(field), *tail)

    def fs1(field, *tail):
        return None if field is None else P(*lead1(field), *tail)

    col_ok = kind == "col" and w.out_features % (8 * ms) == 0
    # row split must be group-aligned so scales/qzeros/zbias shard with the
    # same boundaries (in = groups*groupsize; groups % ms == 0 implies the
    # per-shard row range covers whole groups)
    row_ok = (kind == "row" and groups % ms == 0
              and (w.in_features // 8) % ms == 0)
    if col_ok:
        return Int4Weight(
            qweight=fs(w.qweight, None, "model"),
            qzeros=fs(w.qzeros, None, "model"),
            scales=fs(w.scales, None, "model"),
            g_idx=fs1(w.g_idx, None),
            perm=fs1(w.perm, None),
            zbias=fs(w.zbias, None, "model"),
            q4=fs(w.q4, None, "model"),
            qlane=fs(w.qlane, None, "model"),
        )
    if row_ok:
        return Int4Weight(
            qweight=fs(w.qweight, "model", None),
            qzeros=fs(w.qzeros, "model", None),
            scales=fs(w.scales, "model", None),
            g_idx=fs1(w.g_idx, None),
            perm=fs1(w.perm, None),
            zbias=fs(w.zbias, "model", None),
            q4=fs(w.q4, "model", None),
            qlane=fs(w.qlane, "model", None),
        )
    return Int4Weight(
        qweight=fs(w.qweight, None, None),
        qzeros=fs(w.qzeros, None, None),
        scales=fs(w.scales, None, None),
        g_idx=fs1(w.g_idx, None),
        perm=fs1(w.perm, None),
        zbias=fs(w.zbias, None, None),
        q4=fs(w.q4, None, None),
        qlane=fs(w.qlane, None, None),
    )


def _is_quant(x) -> bool:
    return isinstance(x, (Int4Weight, Int8Weight, Int8OutlierWeight))


def param_specs(spec: DecoderSpec, params: dict, mesh: Mesh) -> dict:
    """PartitionSpec pytree matching the model param structure. Quantized
    (Int4Weight/Int8Weight) leaves expand to a matching NamedTuple of
    per-field specs (see _quant_leaf_specs)."""
    ms = mesh.shape["model"]
    col = P(None, None, "model")
    row = P(None, "model", None)
    repl2 = P(None, None)
    repl1 = P(None)

    def col_or_repl(arr):
        if _is_quant(arr):
            return _quant_leaf_specs(arr, "col", ms)
        return col if arr.shape[-1] % ms == 0 else P(None, None, None)

    def row_or_repl(arr):
        if _is_quant(arr):
            return _quant_leaf_specs(arr, "row", ms)
        return row if arr.shape[1] % ms == 0 else P(None, None, None)

    def repl_like(arr):
        if _is_quant(arr):
            return _quant_leaf_specs(arr, "repl", ms)
        return P(*([None] * arr.ndim))

    q_ok = spec.num_heads % ms == 0
    kv_ok = spec.num_kv_heads % ms == 0

    lp = params["layers"]
    layer_specs = {}
    for name, arr in lp.items():
        if name in ("wq", "w_gate", "w_up"):
            layer_specs[name] = col_or_repl(arr) if (name != "wq" or q_ok) \
                else repl_like(arr)
        elif name in ("wk", "wv"):
            # shard along whole kv heads only; splitting inside a head's
            # feature dim (MQA/GQA with few heads) hurts attention layout
            layer_specs[name] = col_or_repl(arr) if kv_ok else repl_like(arr)
        elif name in ("wo", "w_down"):
            if name == "wo":
                layer_specs[name] = row_or_repl(arr) if q_ok \
                    else repl_like(arr)
            else:
                layer_specs[name] = row_or_repl(arr)
        elif name in ("bq", "b_gate", "b_up"):
            ok = q_ok if name == "bq" else arr.shape[-1] % ms == 0
            layer_specs[name] = P(None, "model") if ok else P(None, None)
        elif name in ("bk", "bv"):
            layer_specs[name] = P(None, "model") if kv_ok else P(None, None)
        elif name in ("bo", "b_down"):
            layer_specs[name] = repl2
        elif name in ("ln1", "ln2"):
            layer_specs[name] = {k: repl2 for k in arr}
        else:
            layer_specs[name] = repl_like(arr)

    out = {
        "embed_tokens": P("model", None)
        if params["embed_tokens"].shape[0] % ms == 0 else P(None, None),
        "layers": layer_specs,
        "final_norm": {k: repl1 for k in params["final_norm"]},
    }
    if "embed_positions" in params:
        out["embed_positions"] = P(None, None)
    if "embed_ln" in params:
        out["embed_ln"] = {k: repl1 for k in params["embed_ln"]}
    if "lm_head" in params:
        out["lm_head"] = P(None, "model") \
            if params["lm_head"].shape[-1] % ms == 0 else P(None, None)
    return out


def cache_spec(spec: DecoderSpec, mesh: Mesh) -> P:
    """[L, S, K, T, Dh]: kv heads on "model", slots on "data"."""
    kv_axis = "model" if _shardable(spec.num_kv_heads, mesh) else None
    return P(None, None, kv_axis, None, None)


def shard_params(params: dict, specs: dict, mesh: Mesh) -> dict:
    # flatten fully: quantized NamedTuple leaves in `params` line up with
    # the matching NamedTuple-of-specs nodes from _quant_leaf_specs
    return jax.tree_util.tree_map(
        lambda arr, s: jax.device_put(arr, NamedSharding(mesh, s)),
        params, specs)


def shard_cache(cache: KVCache, spec: DecoderSpec, mesh: Mesh) -> KVCache:
    cs = cache_spec(spec, mesh)
    s = NamedSharding(mesh, cs)
    # int8 cache scales [L, S, K, T] shard on the same kv-head axis
    ss = NamedSharding(mesh, P(*cs[:-1]))
    return KVCache(
        k=jax.device_put(cache.k, s), v=jax.device_put(cache.v, s),
        k_scale=(None if cache.k_scale is None
                 else jax.device_put(cache.k_scale, ss)),
        v_scale=(None if cache.v_scale is None
                 else jax.device_put(cache.v_scale, ss)))


def paged_pool_spec(spec: DecoderSpec, mesh: Mesh) -> P:
    """Paged pool [L, K, P*page, D]: kv heads on "model" when divisible
    (the paged counterpart of cache_spec — the reference shards the paged
    KV on heads the same way its contiguous cache is sharded)."""
    kv_axis = "model" if _shardable(spec.num_kv_heads, mesh) else None
    return P(None, kv_axis, None, None)


def shard_paged_cache(cache, spec: DecoderSpec, mesh: Mesh):
    """Shard a PagedKVCache: pool on kv heads, block table replicated;
    int8 scale pools [L, K, R] shard on the same kv-head axis."""
    ps = paged_pool_spec(spec, mesh)
    pool = NamedSharding(mesh, ps)
    scale = NamedSharding(mesh, P(*ps[:-1]))
    repl = NamedSharding(mesh, P(None, None))
    return cache._replace(
        k=jax.device_put(cache.k, pool),
        v=jax.device_put(cache.v, pool),
        block_table=jax.device_put(cache.block_table, repl),
        k_scale=(None if cache.k_scale is None
                 else jax.device_put(cache.k_scale, scale)),
        v_scale=(None if cache.v_scale is None
                 else jax.device_put(cache.v_scale, scale)))


def replicate(tree, mesh: Mesh):
    full = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, full), tree)
