"""Attention dispatch: Pallas TPU kernels vs XLA einsum fallback.

Counterpart of the reference's flash-attn availability gating (reference:
server/.../utils/flash_attn.py:8-40 SM checks + FLASH_ATTENTION env,
models/__init__.py:48-136 dispatch). Kernels run on TPU backends; ALiBi
models and CPU tests use the einsum path (same math, models/core.py).

Env: FLASH_ATTENTION=0 disables the Pallas kernels (default: enabled on
non-CPU backends).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

_FLASH_ENABLED = os.getenv("FLASH_ATTENTION", "1").lower() not in ("0", "false")


def _kernels_available() -> bool:
    if not _FLASH_ENABLED:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def prefill_attention(q, k, v, lengths, bias, mask, scale: float):
    """q [N, T, K, G, D]; k/v [N, T, K, D]; returns [N, T, K, G, D].

    `bias`/`mask` drive the einsum fallback; the Pallas kernel derives the
    causal+length mask itself and currently has no bias support (ALiBi
    models fall back).
    """
    n, t, kh, g, d = q.shape
    if bias is None and _kernels_available() and t >= 128 and d % 64 == 0:
        from .pallas.flash_prefill import flash_prefill

        return flash_prefill(q, k, v, lengths)
    # XLA fallback
    scores = jnp.einsum("nqkgd,nvkd->nkgqv", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nkgqv,nvkd->nqkgd", probs, v)


def decode_attention(q, k_cache, v_cache, context_len, bias, mask,
                     scale: float):
    """q [S, K, G, D]; caches [S, K, T, D]; returns [S, K, G, D]."""
    s, kh, g, d = q.shape
    t = k_cache.shape[2]
    # This dispatch serves the "scan"/"post" write modes only; the default
    # decode path is the RING scheme (models/core.decode_ring_step), which
    # computes attention inline (einsum over the read-only cache + ring).
    # Threshold rationale, measured on v5e: standalone the kernel beats the
    # einsum from T=1024, but inside the layer scan it is a fusion barrier
    # and loses end-to-end (3286 vs 2682 tok/s at T=1024) — XLA overlaps
    # the einsum's HBM reads with the surrounding matmuls. At T >= 2048 the
    # dead-KV DMA saving outweighs the barrier, so the kernel engages.
    if bias is None and _kernels_available() and t >= 2048 and d % 64 == 0:
        from .pallas.decode_attention import decode_attention as da

        return da(q, k_cache, v_cache, context_len)
    scores = jnp.einsum("skgd,sktd->skgt", q, k_cache,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("skgt,sktd->skgd", probs, v_cache)
