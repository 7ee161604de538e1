"""Analytic memory planner tests."""

import numpy as np

import jax.numpy as jnp

from text_generation_inference_tpu.config import ServingConfig
from text_generation_inference_tpu.engine.memory import plan_memory, tree_bytes
from text_generation_inference_tpu.models import core
from text_generation_inference_tpu.models.core import DecoderSpec

SPEC = DecoderSpec(
    vocab_size=512, hidden_size=128, num_layers=2, num_heads=8,
    num_kv_heads=4, head_dim=16, intermediate_size=256)


def make_cfg(slots=8, seq=512):
    cfg = ServingConfig(max_sequence_length=seq, max_new_tokens=seq // 2,
                        max_batch_slots=slots, prefill_buckets=[128, seq])
    cfg.validate()
    return cfg


def test_tree_bytes():
    params = {"a": jnp.zeros((10, 10), jnp.float32),
              "b": jnp.zeros((5,), jnp.bfloat16)}
    assert tree_bytes(params) == 400 + 10


def test_kv_accounting_exact():
    params = core.init_params(SPEC, __import__("jax").random.key(0),
                              dtype=jnp.float32)
    cfg = make_cfg()
    plan = plan_memory(SPEC, cfg, params, cache_dtype_itemsize=4,
                       hbm_bytes=16 * 1024 ** 3)
    expected_kv = 2 * 2 * 4 * 512 * 16 * 4   # L*2*K*T*D*itemsize
    assert plan.kv_bytes_per_slot == expected_kv
    assert plan.max_slots == 8                # plenty of room, no shrink


def test_slot_shrink_when_tight(monkeypatch):
    params = core.init_params(SPEC, __import__("jax").random.key(0),
                              dtype=jnp.float32)
    cfg = make_cfg(slots=1000)
    plan = plan_memory(SPEC, cfg, params, cache_dtype_itemsize=4,
                       hbm_bytes=64 * 1024 ** 2)   # 64 MiB budget
    assert plan.max_slots < 1000
    assert cfg.max_batch_slots == plan.max_slots


def test_estimate_memory_off(monkeypatch):
    monkeypatch.setenv("ESTIMATE_MEMORY", "off")
    params = core.init_params(SPEC, __import__("jax").random.key(0),
                              dtype=jnp.float32)
    cfg = make_cfg(slots=1000)
    plan = plan_memory(SPEC, cfg, params, cache_dtype_itemsize=4,
                       hbm_bytes=64 * 1024 ** 2)
    assert plan.max_slots == 1000              # no auto-shrink
