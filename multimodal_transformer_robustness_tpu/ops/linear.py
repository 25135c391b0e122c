"""Masked linear: static-shape replacement of the reference's DynamicLinear.

Reference semantics (modules/dynamic_layers.py:6-54): slice weight rows/cols
by prefix dims or gather them by index masks, then dense ``F.linear``.  Here
the weight stays full-size; a 0/1 ``mask_in`` zeroes input columns'
contributions and ``mask_out`` zeroes output units (including their bias),
which is numerically identical — excluded weights simply multiply zeros.

Weight layout is torch's ``[out_features, in_features]`` so checkpoints can
round-trip with the reference's ``state_dict`` naming (SURVEY.md §5
checkpoint/resume).  XLA folds the transpose into the matmul.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def init_linear(rng: jax.Array, dim_in: int, dim_out: int, init: str = "torch") -> dict:
    """``init='torch'``: torch nn.Linear default (kaiming-uniform weight,
    fan-in uniform bias).  ``init='xavier_zero'``: xavier-uniform weight and
    zero bias, as the reference's transformer layers use
    (modules/dynamic_transformer.py:152-156)."""
    kw, kb = jax.random.split(rng)
    if init == "xavier_zero":
        bound = math.sqrt(6.0 / (dim_in + dim_out))
        w = jax.random.uniform(kw, (dim_out, dim_in), jnp.float32, -bound, bound)
        b = jnp.zeros((dim_out,), jnp.float32)
    else:
        # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) on [out, in]
        # reduces to U(-1/sqrt(in), 1/sqrt(in)) for both weight and bias.
        bound = math.sqrt(1.0 / dim_in)
        w = jax.random.uniform(kw, (dim_out, dim_in), jnp.float32, -bound, bound)
        b = jax.random.uniform(kb, (dim_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def masked_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    mask_in: Optional[jnp.ndarray] = None,
    mask_out: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``y = (x * mask_in) @ w.T + b``, then ``y * mask_out``.

    ``mask_in`` is redundant when callers maintain the zeros-at-inactive-
    channels invariant, but accepting it keeps the op self-contained.
    """
    if mask_in is not None:
        x = x * mask_in.astype(x.dtype)
    y = jnp.matmul(x, w.T, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    if mask_out is not None:
        y = y * mask_out.astype(y.dtype)
    return y
