"""Mask-aware LayerNorm.

Reference semantics (modules/dynamic_layers.py:57-76): gather gamma/beta by
the active channel indices and run ``F.layer_norm`` over the *reduced*
dimension — i.e. moments are computed over active channels only.  Here the
tensor stays full-width with zeros at inactive channels; moments are taken as
masked sums divided by the active-channel count, which is exactly the
reduced-dim statistics.  Output is re-masked so the zeros invariant holds.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-5  # torch nn.LayerNorm default


def masked_layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    eps: float = _EPS,
) -> jnp.ndarray:
    """LayerNorm over the last axis; if ``mask`` is given, statistics cover
    only channels with mask==1 and the output is zero elsewhere.

    Uses biased variance (divide by N), matching torch.
    Safe under an all-zero mask (returns zeros instead of NaN) — needed when
    a whole fusion branch is gated off (masks.py branch_gate == 0).
    """
    x32 = x.astype(jnp.float32)
    if mask is None:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
        return y.astype(x.dtype)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(x32 * m, axis=-1, keepdims=True) / n
    diff = (x32 - mu) * m
    var = jnp.sum(jnp.square(diff), axis=-1, keepdims=True) / n
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return (y * m).astype(x.dtype)
