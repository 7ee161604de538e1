"""Paged KV cache: fixed-size pages in HBM + host-side allocator.

TPU-native counterpart of the reference's paged attention path (reference:
server/.../models/paged_causal_lm.py + fms_extras PagedKVCacheManager,
block_size=16): the KV pool is [L, P, page, K, D]; each slot owns an ordered
list of pages recorded in a device block table [S, max_pages]. Capacity is
tracked in pages, so admission reserves exactly
ceil((input_len + max_new_tokens) / page_size) pages per request instead of
a full max_seq slot — the scheduler's batch "weight" model (reference:
router/src/batch_types.rs FlashBatch ∝ total tokens) falls out of page
accounting.

The allocator is intentionally host-side Python (page grant/free happen at
request admission/completion, not per token) — mirroring the reference's
host-side block manager.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.core import DecoderSpec


from typing import Optional


class PagedKVCache(NamedTuple):
    """k/v pools: [L, K, P * page_size, D] — head-major so Pallas KV blocks
    are (1, page_size, D), satisfying TPU tiling constraints.

    With dtype int8 the pool is symmetric per-row-per-head quantized (the
    paged counterpart of the slot engine's int8 KV, models/core.py KVCache):
    k_scale/v_scale are [L, K, P * page_size] f32 absmax/127 factors
    (~3% extra HBM at D=128), quantization happens at the write sites
    (prefill scatter / ring-chunk flush) and the read path folds the scale
    into the score/value contractions."""

    k: jax.Array
    v: jax.Array
    block_table: jax.Array    # [S, max_pages] i32 page ids (garbage beyond use)
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, spec: DecoderSpec, num_pages: int, page_size: int,
               num_slots: int, max_pages_per_slot: int, dtype) -> "PagedKVCache":
        shape = (spec.num_layers, spec.num_kv_heads,
                 num_pages * page_size, spec.head_dim)
        # unmapped block-table entries carry the out-of-bounds sentinel
        # `num_pages`, NOT 0: a write routed through an unmapped entry
        # (e.g. a decode chunk overrunning a finished slot's allocation)
        # must land out of bounds and be dropped — page 0 is a real
        # allocatable page and writing it would corrupt whichever live
        # request owns it. Reads through the sentinel clamp to the pool
        # edge and are masked by context length.
        bt = jnp.full((num_slots, max_pages_per_slot), num_pages, jnp.int32)
        if jnp.dtype(dtype) == jnp.int8:
            return cls(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                block_table=bt,
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   block_table=bt)

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def page_size(self) -> int:
        raise AttributeError("page_size tracked by PageAllocator")


class PageAllocator:
    """Free-list page allocator with per-slot reservations."""

    def __init__(self, num_pages: int, page_size: int, max_pages_per_slot: int):
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_pages_per_slot = max_pages_per_slot
        self.free_pages: list[int] = list(range(num_pages))
        self.slot_pages: dict[int, list[int]] = {}

    @property
    def num_free(self) -> int:
        return len(self.free_pages)

    def pages_needed(self, total_tokens: int) -> int:
        return -(-total_tokens // self.page_size)

    def can_allocate(self, total_tokens: int) -> bool:
        n = self.pages_needed(total_tokens)
        return n <= len(self.free_pages) and n <= self.max_pages_per_slot

    def allocate(self, slot: int, total_tokens: int) -> list[int]:
        n = self.pages_needed(total_tokens)
        if n > len(self.free_pages):
            raise RuntimeError(
                f"out of KV pages: need {n}, free {len(self.free_pages)}")
        if n > self.max_pages_per_slot:
            raise RuntimeError(
                f"request needs {n} pages > max_pages_per_slot "
                f"{self.max_pages_per_slot}")
        pages = [self.free_pages.pop() for _ in range(n)]
        self.slot_pages[slot] = pages
        return pages

    def free(self, slot: int) -> None:
        pages = self.slot_pages.pop(slot, [])
        self.free_pages.extend(pages)

    def row_indices(self, pages: list[int], length: int) -> np.ndarray:
        """Flat pool-row index for each token position 0..length-1."""
        pos = np.arange(length)
        page_idx = pos // self.page_size
        return (np.asarray(pages, np.int64)[page_idx] * self.page_size
                + pos % self.page_size).astype(np.int32)
