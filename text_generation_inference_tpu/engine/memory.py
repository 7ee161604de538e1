"""Analytic HBM capacity planning.

Replaces the reference's empirical memory characterizer — which binary-
searches OOM boundaries and curve-fits quadratic/linear coefficients at
startup (reference: server/.../utils/memory_characterizer.py:203-539) —
with closed-form accounting: on TPU every serving buffer has a static shape,
so capacity is arithmetic, not measurement. The `MemoryScalingModel`-style
coefficients are still exposed so the scheduler-side admission interface
matches the reference's (ModelInfo memory model, reference:
proto/generate.proto:44-64).

ESTIMATE_MEMORY=off disables slot auto-shrinking (reference env contract).
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import numpy as np

from ..config import ServingConfig
from ..models.core import DecoderSpec

logger = logging.getLogger(__name__)


def tree_bytes(tree) -> int:
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(tree))


def device_hbm_bytes(device=None) -> int:
    """Total HBM of the target device; falls back to a v5e-sized default
    when the backend reports no stats (e.g. CPU tests)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024 ** 3


@dataclasses.dataclass
class MemoryPlan:
    param_bytes: int
    kv_bytes_per_slot: int
    state_bytes: int
    activation_bytes: int       # transient prefill working set estimate
    hbm_bytes: int
    usable_bytes: int
    max_slots: int

    # reference-compatible coefficients (MemoryScalingModel):
    # prefill memory ≈ linear_coef * batch * seq; next-token ≈ nt_coef * batch
    @property
    def prefill_linear_coef(self) -> float:
        return self.kv_bytes_per_slot and (
            self.activation_bytes / max(self.kv_bytes_per_slot, 1))

    @property
    def weight_limit(self) -> int:
        return self.usable_bytes

    def describe(self) -> str:
        gb = 1024 ** 3
        return (f"params {self.param_bytes/gb:.2f}GiB + "
                f"kv/slot {self.kv_bytes_per_slot/gb:.3f}GiB x {self.max_slots} "
                f"+ act {self.activation_bytes/gb:.2f}GiB "
                f"of {self.hbm_bytes/gb:.1f}GiB HBM")


def plan_memory(spec: DecoderSpec, config: ServingConfig, params,
                cache_dtype_itemsize: int = 2,
                hbm_bytes: int | None = None) -> MemoryPlan:
    """Compute the memory plan and (unless ESTIMATE_MEMORY=off) shrink
    max_batch_slots in-place to what fits with the configured safety margin
    (reference default 20%, cli.py:28)."""
    hbm = hbm_bytes if hbm_bytes is not None else device_hbm_bytes()
    param_bytes = tree_bytes(params)
    kv_per_slot = (spec.num_layers * 2 * spec.num_kv_heads
                   * config.max_sequence_length * spec.head_dim
                   * cache_dtype_itemsize)
    # prefill transient working set: activations for the largest bucket
    # (hidden + mlp intermediates + logits row), batch 1, fp32-dominated
    bucket = config.prefill_buckets[-1]
    act = bucket * (spec.hidden_size * 6 + spec.intermediate_size * 3) * 4
    act += bucket * spec.vocab_size * 4          # all-position logits
    state = config.max_batch_slots * config.max_sequence_length * 4 * 4

    usable = int(hbm * (1.0 - config.batch_safety_margin)) - param_bytes \
        - act - state
    max_slots = config.max_batch_slots
    if os.getenv("ESTIMATE_MEMORY", "auto").lower() != "off":
        fit = max(1, usable // max(kv_per_slot, 1))
        if fit < max_slots:
            logger.warning(
                "shrinking batch slots %d -> %d to fit HBM", max_slots, fit)
            max_slots = int(fit)
            config.max_batch_slots = max_slots

    plan = MemoryPlan(
        param_bytes=param_bytes,
        kv_bytes_per_slot=kv_per_slot,
        state_bytes=state,
        activation_bytes=act,
        hbm_bytes=hbm,
        usable_bytes=max(usable, 0),
        max_slots=max_slots,
    )
    logger.info("memory plan: %s", plan.describe())
    return plan
