"""Elastic multi-head attention, static-shape / mask-parameterized.

Reference semantics (modules/dynamic_multihead_attention.py):
  * packed in-projection weight viewed as ``[3, H, Dh, E_in]``; the active
    configuration selects the *prefix slab* ``[:, :H_act, :Dh_act, :]``
    (lines 259-268) and the out-projection's matching columns (271-282);
  * q is scaled by ``active_head_dim ** -0.5`` (line 91);
  * additive attention mask, then softmax in float32 (lines 99-109);
  * channel masks (``active_mask``) apply only in self-attention mode
    (assert at line 79) and gather in-proj input columns / out-proj output
    rows.

Here the slab selection becomes a ``head_mask ⊗ head_dim_mask`` zeroing of
the projected q/k/v (bias included): masked entries contribute exactly zero
to the logits contraction and to the out-projection, so the result is
bit-equal to running the sliced computation.  Masked *heads* still compute a
softmax over garbage logits, but their value vectors are zero so their
contribution vanishes.  Channel masking relies on the caller's
zeros-at-inactive-channels input invariant and re-masks the output
(bias included).

Layout: batch-major ``[B, T, C]`` (the reference is seq-major ``[T, B, C]``);
logits are ``[B, H, Tq, Tk]`` so the lane dimension carries Tk.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .dropout import dropout

NEG_INF = float("-inf")


def future_mask(tq: int, tk: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive [tq, tk] mask: -inf where ``col - row >= 1 + |tk - tq|``.

    Port of modules/transformer.py:150-157 (``buffered_future_mask`` with the
    ``1 + abs(dim2 - dim1)`` diagonal offset for cross-length q/k).
    """
    rows = jnp.arange(tq)[:, None]
    cols = jnp.arange(tk)[None, :]
    return jnp.where(cols - rows >= 1 + abs(tk - tq), NEG_INF, 0.0).astype(dtype)


def init_mha(rng: jax.Array, embed_dim_in: int, num_heads: int, head_dim: int) -> dict:
    """Xavier-uniform packed in-projection + out-projection, zero biases
    (reference ``reset_parameters``, dynamic_multihead_attention.py:49-53).
    Xavier bounds are computed on the torch 2-D shapes ``[3E, E_in]`` and
    ``[E_out, E]`` so the init distribution matches."""
    e = num_heads * head_dim
    k1, k2 = jax.random.split(rng)
    b_in = math.sqrt(6.0 / (3 * e + embed_dim_in))
    in_w = jax.random.uniform(k1, (3, num_heads, head_dim, embed_dim_in), jnp.float32, -b_in, b_in)
    b_out = math.sqrt(6.0 / (embed_dim_in + e))
    out_w = jax.random.uniform(k2, (embed_dim_in, num_heads, head_dim), jnp.float32, -b_out, b_out)
    return {
        "in_proj_w": in_w,                                   # [3, H, Dh, E_in]
        "in_proj_b": jnp.zeros((3, num_heads, head_dim), jnp.float32),
        "out_w": out_w,                                      # [E_out, H, Dh]
        "out_b": jnp.zeros((embed_dim_in,), jnp.float32),
    }


def multihead_attention(
    params: dict,
    query: jnp.ndarray,                 # [B, Tq, E_in]
    key: jnp.ndarray,                   # [B, Tk, E_in]
    value: jnp.ndarray,                 # [B, Tk, E_in]
    *,
    head_mask: jnp.ndarray,             # [H]
    head_dim_mask: jnp.ndarray,         # [Dh]
    attn_bias: Optional[jnp.ndarray] = None,   # [Tq, Tk] additive
    channel_mask: Optional[jnp.ndarray] = None,  # [E_in]; self-attn only
    attn_dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    impl: str = "xla",                  # "xla" | "flash" (Pallas kernel)
    causal_offset: Optional[int] = None,  # flash path: future-mask offset
    flash_dropout: bool = False,        # flash path: fuse in-softmax dropout
) -> jnp.ndarray:
    w_in = params["in_proj_w"]
    b_in = params["in_proj_b"]
    hd = (head_mask[:, None] * head_dim_mask[None, :]).astype(query.dtype)  # [H, Dh]

    def proj(x, i):
        y = jnp.einsum("btc,hdc->bthd", x, w_in[i], preferred_element_type=jnp.float32)
        # cast back so a bf16 compute policy keeps bf16 logits/value matmuls
        # (the f32 accumulate above is free on the MXU; leaving q/k/v f32
        # would silently promote every downstream op)
        return (((y + b_in[i]) * hd)).astype(x.dtype)

    # ---- T==1 fast path (trace-time: shapes are static) --------------------
    # After the RNN/CNN/BERT headers every stream is a single fused step
    # (models/mult.py: base is [M, B, 1, d]), so the 18 MOSEI stacks all run
    # attention at Tq == Tk == 1 — where softmax over one key is IDENTICALLY
    # 1 (f32 exp(0)/exp(0)) and the future mask is structurally zero.  The
    # whole attention therefore reduces to attention-dropout of the constant
    # 1 times v, then the out-projection: q/k projections, logits, softmax
    # and mask all disappear.  Exact, gradients included: d softmax(single
    # logit) = w*g - w*(w@g) = 0, so the slow path's q/k-projection grads
    # are exact f32 zeros — precisely what the unused leaves get here.  The
    # dropout draw keeps the slow path's rng/shape ([B, H, 1, 1]) so the
    # realization is bit-identical to the XLA path.  (Measured motivation:
    # BENCH_NOTES — the T=1 stacks burned 12-15 ms/step at B=1024 for ~1 ms
    # of MXU work, dominated by softmax/elementwise/RNG traffic.)
    tq, tk = query.shape[1], key.shape[1]
    if tq == 1 and tk == 1 and (attn_bias is None or impl == "flash"):
        v = proj(value, 2)
        ones = jnp.ones((query.shape[0], w_in.shape[1], 1, 1), query.dtype)
        weights = dropout(rng, ones, attn_dropout, train)      # [B, H, 1, 1]
        attn = (weights.transpose(0, 2, 1, 3).astype(jnp.float32)
                * v.astype(jnp.float32)).astype(query.dtype)   # [B, 1, H, Dh]
        out = jnp.einsum("bqhd,ehd->bqe", attn, params["out_w"],
                         preferred_element_type=jnp.float32)
        out = out + params["out_b"]
        if channel_mask is not None:
            out = out * channel_mask
        return out.astype(query.dtype)

    q = proj(query, 0)
    k = proj(key, 1)
    v = proj(value, 2)

    active_dh = jnp.maximum(jnp.sum(head_dim_mask.astype(jnp.float32)), 1.0)
    q = q * jax.lax.rsqrt(active_dh).astype(q.dtype)  # active_head_dim ** -0.5

    if impl == "flash":
        # fused Pallas path (see attention_pallas.py; differentiable via the
        # custom VJP in attention_pallas_bwd.py).  In-softmax dropout is
        # fused into the kernel (position-hash mask, torch dropout-after-
        # softmax semantics) when ``flash_dropout`` and training; the draw
        # REALIZATIONS differ from the XLA path's jax.random stream (as
        # torch's differ from both) — distribution, not stream, is the
        # contract.  attn_bias must be the structural future mask (offset).
        from .attention_pallas import flash_attention

        do_seeds = do_rates = None
        if flash_dropout and train:
            assert rng is not None, "training-mode dropout needs an rng"
            bh = query.shape[0] * w_in.shape[1]
            do_seeds = jax.random.randint(rng, (bh,), 0, 2**31 - 1,
                                          dtype=jnp.int32)
            do_rates = jnp.full((bh,), attn_dropout, jnp.float32)
        attn = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=causal_offset is not None,
            offset=causal_offset if causal_offset is not None else 1,
            dropout_seeds=do_seeds, dropout_rates=do_rates,
        ).transpose(0, 2, 1, 3)
        out = jnp.einsum("bqhd,ehd->bqe", attn, params["out_w"],
                         preferred_element_type=jnp.float32)
        out = out + params["out_b"]
        if channel_mask is not None:
            out = out * channel_mask
        return out.astype(query.dtype)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if attn_bias is not None:
        logits = logits + attn_bias
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    weights = dropout(rng, weights, attn_dropout, train)

    attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
    out = jnp.einsum("bqhd,ehd->bqe", attn, params["out_w"], preferred_element_type=jnp.float32)
    out = out + params["out_b"]
    if channel_mask is not None:
        out = out * channel_mask
    return out.astype(query.dtype)
