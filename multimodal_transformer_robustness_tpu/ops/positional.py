"""Sinusoidal positional embedding with the reference's fairseq padding rule,
generalized to channel masks.

Reference semantics (modules/position_embedding.py):
  * positions: column t gets position t+1 unless the input's value at that
    column equals padding_idx (0), in which case position 0 — the callers pass
    the *feature-0 channel* of the activation as the "token id" proxy
    (modules/transformer.py:42, modules/dynamic_transformer.py:66).
  * table (``get_embedding``, position_embedding.py:44-67): channel c has
    frequency ``exp(-floor(c/2) * ln(10000)/(half_dim-1))`` with
    ``half_dim = dim // 2``; even channels take sin, odd take cos; row 0
    (padding position) is all zeros.
  * under a channel mask the reference first *compacts* the tensor and builds
    the table for the compacted width (dynamic_transformer.py:58-62).  Here
    the tensor stays full-width, so channel c's table entry is computed from
    its *rank among active channels* and the active-channel count — identical
    values, scattered back to the active positions.

Note: the reference zero-pads an extra column for odd dims, which would break
broadcasting in its own forward; odd active widths are therefore not
reachable in practice (slot widths are multiples of d).  We simply apply the
sin/cos formula to every rank.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def make_positions(feat0: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """``feat0``: [B, T] proxy token values (the activation's first active
    channel).  Returns int32 positions: t+1, or 0 where feat0 == padding_idx.
    Port of position_embedding.py:8-27 with left_pad=0."""
    t = feat0.shape[-1]
    pos = jnp.arange(1, t + 1, dtype=jnp.int32)
    return jnp.where(feat0 != padding_idx, pos, 0)


def sinusoidal_pe(
    positions: jnp.ndarray,
    n_channels: int,
    channel_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Positional embedding [B, T, n_channels] for integer ``positions``
    [B, T] (0 = padding => all-zero row).

    With ``channel_mask`` (0/1 over n_channels), frequencies follow the
    compacted layout described above and inactive channels are zero.
    Safe when the mask is all-zero (returns zeros).
    """
    if channel_mask is None:
        rank = jnp.arange(n_channels, dtype=jnp.float32)
        n_act = float(n_channels)
        mask = None
    else:
        m = channel_mask.astype(jnp.float32)
        rank = jnp.cumsum(m) - 1.0  # rank of each active channel in compacted order
        n_act = jnp.maximum(jnp.sum(m), 2.0)
        mask = m
    half_dim = jnp.floor(jnp.asarray(n_act, jnp.float32) / 2.0)
    denom = jnp.maximum(half_dim - 1.0, 1.0)
    inv_freq = jnp.exp(jnp.floor(rank / 2.0) * (-math.log(10000.0) / denom))
    angle = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, C]
    even = jnp.mod(jnp.floor(rank), 2.0) == 0.0
    pe = jnp.where(even, jnp.sin(angle), jnp.cos(angle))
    pe = pe * (positions != 0).astype(jnp.float32)[..., None]  # padding row zeroed
    if mask is not None:
        pe = pe * mask
    return pe
