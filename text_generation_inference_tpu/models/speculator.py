"""MLP speculator: cheap draft-token proposer for speculative decoding.

Architecture follows IBM's MLPSpeculator used by the reference's paged
speculative path (reference: server/.../models/paged_causal_lm.py:481-563,
utils/paged.py:162-326, weights from fms_extras): for each of `n_predict`
draft positions, the state is updated from the previous state and the
embedding of the previously (drafted) token, then a tied head produces
logits:

  state_0   = model hidden state at the accepted token
  state_i+1 = GELU( LN( W_state @ state_i + W_emb @ emb(tok_i) ) )
  logits_i  = head_i(state_i+1)

Checkpoints load from a safetensors file with fms_extras naming; a
random-init constructor exists for tests/benches.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpeculatorSpec:
    vocab_size: int
    model_dim: int          # hidden size of the base model
    inner_dim: int
    n_predict: int = 3


def init_speculator(spec: SpeculatorSpec, key, dtype=jnp.float32) -> dict:
    k = iter(jax.random.split(key, 4 * spec.n_predict + 2))

    def dense(shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(k), shape, jnp.float32) * scale).astype(dtype)

    return {
        "emb": [dense((spec.vocab_size, spec.inner_dim), 0.02)
                for _ in range(spec.n_predict)],
        "w_state": [dense((spec.model_dim if i == 0 else spec.inner_dim,
                           spec.inner_dim)) for i in range(spec.n_predict)],
        "ln_scale": [jnp.ones((spec.inner_dim,), dtype)
                     for _ in range(spec.n_predict)],
        "ln_bias": [jnp.zeros((spec.inner_dim,), dtype)
                    for _ in range(spec.n_predict)],
        "head": [dense((spec.inner_dim, spec.vocab_size))
                 for _ in range(spec.n_predict)],
    }


def propose(spec: SpeculatorSpec, params: dict, hidden: jax.Array,
            first_token: jax.Array) -> jax.Array:
    """Greedy draft proposals. hidden [S, model_dim], first_token [S] →
    [S, n_predict] draft token ids."""
    state = hidden
    tok = first_token
    out = []
    for i in range(spec.n_predict):
        z = jnp.dot(state, params["w_state"][i]) + \
            jnp.take(params["emb"][i], tok, axis=0)
        zf = z.astype(jnp.float32)
        mean = jnp.mean(zf, axis=-1, keepdims=True)
        var = jnp.var(zf, axis=-1, keepdims=True)
        zf = (zf - mean) * jax.lax.rsqrt(var + 1e-6)
        z = (zf * params["ln_scale"][i] + params["ln_bias"][i]).astype(z.dtype)
        state = jax.nn.gelu(z, approximate=True)
        logits = jnp.dot(state, params["head"][i],
                         preferred_element_type=jnp.float32)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out.append(tok)
    return jnp.stack(out, axis=1)


def load_speculator(path: str, dtype=jnp.bfloat16
                    ) -> tuple[SpeculatorSpec, dict]:
    """Load an fms_extras-style MLPSpeculator checkpoint (the weights the
    reference consumes, reference: paged_causal_lm.py speculator loading):
    tensors named emb.{i}.weight, proj.{i}.weight, head.{i}.weight,
    ln.{i}.weight/bias plus a config.json with n_predict/inner_dim."""
    import json
    from pathlib import Path

    from ..utils.weights import Weights

    p = Path(path)
    cfg = json.loads((p / "config.json").read_text())
    w = Weights(p)
    n_predict = cfg.get("n_predict", 3)
    spec = SpeculatorSpec(
        vocab_size=cfg["vocab_size"],
        model_dim=cfg.get("emb_dim") or cfg["model_dim"],
        inner_dim=int(cfg.get("inner_dim") or cfg["model_dim"]),
        n_predict=n_predict,
    )
    params = {
        "emb": [jnp.asarray(w.get(f"emb.{i}.weight"), dtype)
                for i in range(n_predict)],
        "w_state": [jnp.asarray(w.get(f"proj.{i}.weight").T, dtype)
                    for i in range(n_predict)],
        "ln_scale": [jnp.asarray(w.get(f"ln.{i}.weight"), dtype)
                     for i in range(n_predict)],
        "ln_bias": [jnp.asarray(w.get(f"ln.{i}.bias"), dtype)
                    for i in range(n_predict)],
        "head": [jnp.asarray(w.get(f"head.{i}.weight").T, dtype)
                 for i in range(n_predict)],
    }
    return spec, params


def accept_longest_prefix(draft: jax.Array, verified_argmax: jax.Array
                          ) -> jax.Array:
    """Number of accepted draft tokens per slot.

    draft [S, K]: proposed tokens; verified_argmax [S, K]: the model's
    argmax at each draft position (computed from verify_chunk logits at
    positions 0..K-1, i.e. the model's own prediction of draft[:, i]).
    Accept while they agree (reference: utils/paged.py:253-326
    accept-longest-match).
    """
    agree = (draft == verified_argmax).astype(jnp.int32)
    # longest all-ones prefix: cumprod trick
    return jnp.sum(jnp.cumprod(agree, axis=1), axis=1)
