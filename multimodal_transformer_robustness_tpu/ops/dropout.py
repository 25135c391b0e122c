"""Dropout with inverted scaling, matching ``torch.nn.functional.dropout``
semantics (zero w.p. p, scale survivors by 1/(1-p), identity in eval mode)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate, train: bool) -> jnp.ndarray:
    """``rate`` may be a Python float or a traced scalar — traced rates let
    same-shaped stacks with different dropout rates run under one vmap
    (the reference gives each modality stack its own attn_dropout,
    src/dynamic_models2.py:201-210)."""
    if not train:
        return x
    if isinstance(rate, (int, float)) and rate == 0.0:
        return x
    assert rng is not None, "training-mode dropout needs an rng"
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
