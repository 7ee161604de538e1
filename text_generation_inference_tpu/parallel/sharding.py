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


def param_specs(spec: DecoderSpec, params: dict, mesh: Mesh) -> dict:
    """PartitionSpec pytree matching the model param structure."""
    ms = mesh.shape["model"]
    col = P(None, None, "model")
    row = P(None, "model", None)
    repl2 = P(None, None)
    repl1 = P(None)

    def col_or_repl(arr):
        return col if arr.shape[-1] % ms == 0 else P(None, None, None)

    def row_or_repl(arr):
        return row if arr.shape[1] % ms == 0 else P(None, None, None)

    q_ok = spec.num_heads % ms == 0
    kv_ok = spec.num_kv_heads % ms == 0

    lp = params["layers"]
    layer_specs = {}
    for name, arr in lp.items():
        if name in ("wq", "w_gate", "w_up"):
            layer_specs[name] = col_or_repl(arr) if (name != "wq" or q_ok) \
                else P(None, None, None)
        elif name in ("wk", "wv"):
            # shard along whole kv heads only; splitting inside a head's
            # feature dim (MQA/GQA with few heads) hurts attention layout
            layer_specs[name] = col if kv_ok else P(None, None, None)
        elif name in ("wo", "w_down"):
            if name == "wo":
                layer_specs[name] = row if q_ok else P(None, None, None)
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
            layer_specs[name] = P(*([None] * arr.ndim))

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
    return jax.tree_util.tree_map(
        lambda arr, s: jax.device_put(arr, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def shard_cache(cache: KVCache, spec: DecoderSpec, mesh: Mesh) -> KVCache:
    s = NamedSharding(mesh, cache_spec(spec, mesh))
    return KVCache(k=jax.device_put(cache.k, s), v=jax.device_put(cache.v, s))


def paged_pool_spec(spec: DecoderSpec, mesh: Mesh) -> P:
    """Paged pool [L, K, P*page, D]: kv heads on "model" when divisible
    (the paged counterpart of cache_spec — the reference shards the paged
    KV on heads the same way its contiguous cache is sharded)."""
    kv_axis = "model" if _shardable(spec.num_kv_heads, mesh) else None
    return P(None, kv_axis, None, None)


def shard_paged_cache(cache, spec: DecoderSpec, mesh: Mesh):
    """Shard a PagedKVCache: pool on kv heads, block table replicated."""
    pool = NamedSharding(mesh, paged_pool_spec(spec, mesh))
    repl = NamedSharding(mesh, P(None, None))
    return cache._replace(
        k=jax.device_put(cache.k, pool),
        v=jax.device_put(cache.v, pool),
        block_table=jax.device_put(cache.block_table, repl))


def replicate(tree, mesh: Mesh):
    full = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, full), tree)
