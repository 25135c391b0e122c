"""Auxiliary losses.

``cmd``: Central Moment Discrepancy domain regularizer — port of reference
src/utils.py:21-49 (the reference constructs it in train.py:54 but never
applies it; provided for completeness and available to training recipes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _matchnorm(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(x1 - x2)))


def _scm(sx1: jnp.ndarray, sx2: jnp.ndarray, k: int) -> jnp.ndarray:
    ss1 = jnp.mean(jnp.power(sx1, k), axis=0)
    ss2 = jnp.mean(jnp.power(sx2, k), axis=0)
    return _matchnorm(ss1, ss2)


def cmd(x1: jnp.ndarray, x2: jnp.ndarray, n_moments: int) -> jnp.ndarray:
    """Central moment discrepancy between two batches of features [N, D]."""
    mx1 = jnp.mean(x1, axis=0)
    mx2 = jnp.mean(x2, axis=0)
    sx1 = x1 - mx1
    sx2 = x2 - mx2
    scms = _matchnorm(mx1, mx2)
    for i in range(n_moments - 1):
        scms = scms + _scm(sx1, sx2, i + 2)
    return scms
