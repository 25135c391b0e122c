"""Elastic transformer encoder: pre-norm layers under a `lax.scan` with
per-layer depth gates.

Reference structure (modules/dynamic_transformer.py):
  * stack forward (lines 56-88): embed-scale ``sqrt(E)`` + sinusoidal PE
    (fed the activation's feature-0 channel as token proxy) + embed dropout;
    in cross mode the key/value stream is embedded once, with *independent*
    dropout draws for k and v (lines 70-78); then ``active_layer_num`` layers;
    final (masked) LayerNorm.
  * layer forward (lines 159-188): LN -> attention (+ optional future mask)
    -> res-dropout -> residual; LN -> fc1(E_in -> 4*H*Dh) -> ReLU ->
    relu-dropout -> fc2 -> res-dropout -> residual.  ``active_hidden_out_fc1``
    prefix-masks the FFN hidden width; channel masks thread through LN,
    attention and fc1-in/fc2-out.

Depth elasticity: the reference truncates the Python loop (line 81-86); here
all L layers' parameters are stacked on a leading axis and scanned, each
layer gated by ``layer_gates[l]`` — an inactive layer is an identity
(`jnp.where` on the carry).  This keeps one compiled program for every depth.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from .attention import future_mask, init_mha, multihead_attention
from .dropout import dropout
from .layernorm import masked_layer_norm
from .linear import init_linear, masked_linear
from .positional import make_positions, sinusoidal_pe

# rematerialize each encoder layer in the backward pass (jax.checkpoint)
# instead of storing its activations: trades recompute FLOPs (cheap — the
# T=1 stacks are bandwidth-bound, ~1 ms of MXU work) for HBM traffic.
# Measured on the MOSEI step (BENCH_NOTES): B=1024 bf16 cached-text
# 30.3 -> 26.2 ms (-13%); B=256 neutral; B=16 11.5 ms vs 7.3 (-57% — at
# tiny batches the stacks are latency-bound and recompute just doubles
# work).  So remat engages only when the stack sees >= REMAT_MIN_ROWS
# batch*time rows (trace-time decision; shapes are static).  Values are
# bit-identical (same forward program, same rngs); gradients agree to ULP
# level only — the backward graph differs (replay vs stored activations),
# so XLA fuses/rounds differently (measured 1.8e-7 rel, test_scan_unroll).
REMAT_LAYERS = True
REMAT_MIN_ROWS = 512
# A T==1 stack's saved activations are tiny ([B, 1, E] + [B, 1, ffn] per
# layer: ~2 MB bf16 at B=1024) so remat buys it almost no HBM headroom but
# doubles its dropout-RNG + elementwise work in the backward pass.  Setting
# REMAT_MIN_TIME = 2 exempts T==1 stacks from remat; 1 keeps the round-2
# behavior (remat whenever rows >= REMAT_MIN_ROWS).  Default decided by
# on-chip A/B (BENCH_NOTES "remat T==1 exemption").
REMAT_MIN_TIME = 1
# Unroll the layer scan: the T==1 stacks' per-layer work is a handful of
# small fused kernels, so the scan's per-iteration fixed cost is a real
# fraction of their time; unrolling lets XLA schedule/fuse across layers.
# True fully unrolls (L is 2-4 here).  Default decided by on-chip A/B
# (benchmarks/stack_knobs_ab.py) — scan keeps compile time low meanwhile.
SCAN_UNROLL = False
# The fused T==1 residual-block kernel (ops/trunk_block_pallas.py) was
# RETIRED from this dispatch surface 2026-08-19 (VERDICT r3 #7): the on-chip
# A/B (benchmarks/stack_knobs_ab.py, BENCH_NOTES "staged trunk knobs")
# measured it a loss at BOTH production regimes (B=1024 bf16 and B=16 f32 —
# XLA's own fusion of the tiny T==1 bodies wins).  The kernel remains a
# tested library op (kernel-level oracle tests in
# tests/test_trunk_block_pallas.py) for wide-residual-block uses outside
# this trunk.


@register_dataclass
@dataclasses.dataclass(frozen=True)
class EncoderMasks:
    """Per-stack elastic state (all arrays -> vmap/stack friendly)."""

    layer_gates: jnp.ndarray                 # [L]
    head_mask: jnp.ndarray                   # [H]
    head_dim_mask: jnp.ndarray               # [Dh]
    ffn_mask: jnp.ndarray                    # [4*H*Dh]
    channel_mask: Optional[jnp.ndarray] = None  # [E_in] or None (self-attn only)


@dataclasses.dataclass(frozen=True)
class EncoderHParams:
    """Static (trace-time) stack hyperparameters.  Attention dropout is NOT
    here: it may differ per stack instance under one vmap, so it is a traced
    argument of :func:`encoder_forward`."""

    embed_dim_in: int
    num_heads: int
    head_dim: int
    layers: int
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = False
    # "xla" (default) or "flash": route attention through the fused Pallas
    # kernel (ops/attention_pallas.py) in eval AND training (custom VJP,
    # ops/attention_pallas_bwd.py, with fused in-softmax dropout)
    attn_impl: str = "xla"
    # static hint: every stack instance sharing these hparams has effective
    # attention-dropout 0, so the flash path skips the in-kernel dropout
    # machinery entirely (callers compute this from the spec's static rates)
    flash_zero_rates: bool = True


def _init_layer(rng: jax.Array, e_in: int, h: int, dh: int) -> dict:
    ffn = 4 * h * dh
    ks = jax.random.split(rng, 3)
    return {
        "attn": init_mha(ks[0], e_in, h, dh),
        "fc1": init_linear(ks[1], e_in, ffn, init="xavier_zero"),
        "fc2": init_linear(ks[2], ffn, e_in, init="xavier_zero"),
        "ln0": {"g": jnp.ones((e_in,), jnp.float32), "b": jnp.zeros((e_in,), jnp.float32)},
        "ln1": {"g": jnp.ones((e_in,), jnp.float32), "b": jnp.zeros((e_in,), jnp.float32)},
    }


def init_encoder(rng: jax.Array, hp: EncoderHParams) -> dict:
    """Parameters: per-layer pytrees stacked on axis 0 (scan layout) + final LN."""
    keys = jax.random.split(rng, max(hp.layers, 1))
    layers = [_init_layer(keys[l], hp.embed_dim_in, hp.num_heads, hp.head_dim) for l in range(hp.layers)]
    if hp.layers:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        proto = _init_layer(keys[0], hp.embed_dim_in, hp.num_heads, hp.head_dim)
        stacked = jax.tree.map(lambda x: jnp.zeros((0,) + x.shape, x.dtype), proto)
    return {
        "layers": stacked,
        "ln": {"g": jnp.ones((hp.embed_dim_in,), jnp.float32),
               "b": jnp.zeros((hp.embed_dim_in,), jnp.float32)},
    }


def _layer_forward(
    lp: dict,
    x: jnp.ndarray,
    x_k: Optional[jnp.ndarray],
    x_v: Optional[jnp.ndarray],
    hp: EncoderHParams,
    m: EncoderMasks,
    attn_bias: Optional[jnp.ndarray],
    attn_rate,
    train: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    tq = x.shape[1]
    tk = x_k.shape[1] if x_k is not None else tq
    cm = m.channel_mask
    impl = "flash" if hp.attn_impl == "flash" else "xla"
    kw = {}
    if impl == "flash":
        # tq/tk computed above for the fused-trunk gate
        kw = {"impl": "flash",
              "causal_offset": (1 + abs(tk - tq)) if hp.attn_mask else None,
              "attn_bias": None,
              # in-kernel dropout only where the group can have nonzero rates
              "flash_dropout": not hp.flash_zero_rates}
    else:
        kw = {"attn_bias": attn_bias}

    residual = x
    h = masked_layer_norm(x, lp["ln0"]["g"], lp["ln0"]["b"], cm)
    if x_k is None:
        attn = multihead_attention(
            lp["attn"], h, h, h,
            head_mask=m.head_mask, head_dim_mask=m.head_dim_mask,
            channel_mask=cm,
            attn_dropout=attn_rate, train=train, rng=rngs[0], **kw)
    else:
        # cross mode: channel masks are self-attn-only
        # (assert at dynamic_multihead_attention.py:79)
        k = masked_layer_norm(x_k, lp["ln0"]["g"], lp["ln0"]["b"], None)
        v = masked_layer_norm(x_v, lp["ln0"]["g"], lp["ln0"]["b"], None)
        attn = multihead_attention(
            lp["attn"], h, k, v,
            head_mask=m.head_mask, head_dim_mask=m.head_dim_mask,
            channel_mask=None,
            attn_dropout=attn_rate, train=train, rng=rngs[0], **kw)
    x = residual + dropout(rngs[1], attn, hp.res_dropout, train)

    residual = x
    h = masked_layer_norm(x, lp["ln1"]["g"], lp["ln1"]["b"], cm)
    h = masked_linear(h, lp["fc1"]["w"], lp["fc1"]["b"], mask_out=m.ffn_mask)
    h = jax.nn.relu(h)
    h = dropout(rngs[2], h, hp.relu_dropout, train)
    h = masked_linear(h, lp["fc2"]["w"], lp["fc2"]["b"], mask_out=cm)
    x = residual + dropout(rngs[3], h, hp.res_dropout, train)
    return x


def encoder_forward(
    params: dict,
    x_in: jnp.ndarray,                      # [B, T, E_in]
    x_kv: Optional[jnp.ndarray] = None,     # [B, Tk, E_in] for cross mode
    *,
    hp: EncoderHParams,
    masks: EncoderMasks,
    attn_rate=0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full stack forward.  Returns [B, T, E_in] (zeros kept at masked
    channels)."""
    cm = masks.channel_mask
    scale = math.sqrt(hp.embed_dim_in)  # full width even under masks
    #                                     (dynamic_transformer.py:27 — embed_scale
    #                                     is set at construction time)
    rngs = jax.random.split(rng, 4 + max(hp.layers, 1)) if rng is not None else None

    pos = make_positions(x_in[:, :, 0])
    # under a channel mask, feature 0 of the *compacted* tensor is the lowest
    # active channel; select it for padding detection
    if cm is not None:
        first_active = jnp.argmax(cm > 0)
        pos = make_positions(jnp.take(x_in, first_active, axis=-1))
    pe = sinusoidal_pe(pos, hp.embed_dim_in, cm).astype(x_in.dtype)
    x = scale * x_in + pe
    x = dropout(rngs[0] if rngs is not None else None, x, hp.embed_dropout, train)

    x_k = x_v = None
    if x_kv is not None:
        pos_kv = make_positions(x_kv[:, :, 0])
        pe_kv = sinusoidal_pe(pos_kv, hp.embed_dim_in, None).astype(x_kv.dtype)
        xk_embed = scale * x_kv + pe_kv
        # independent dropout draws for k and v (dynamic_transformer.py:77-78)
        x_k = dropout(rngs[1] if rngs is not None else None, xk_embed, hp.embed_dropout, train)
        x_v = dropout(rngs[2] if rngs is not None else None, xk_embed, hp.embed_dropout, train)

    attn_bias = None
    if hp.attn_mask:
        tq = x.shape[1]
        tk = x_kv.shape[1] if x_kv is not None else tq
        if not (tq == 1 and tk == 1):
            # future_mask(1, 1) is identically 0 (col - row >= 1 never
            # holds): skip it so attention.py's T==1 fast path engages
            attn_bias = future_mask(tq, tk)

    if hp.layers:
        layer_rngs = (
            rngs[4:4 + hp.layers]
            if rngs is not None
            else jnp.zeros((hp.layers, 2), jnp.uint32)
        )

        def body(carry, inp):
            lp, gate, lrng = inp
            y = _layer_forward(
                lp, carry, x_k, x_v, hp, masks, attn_bias, attn_rate, train,
                lrng if rng is not None else None)
            return jnp.where(gate > 0, y, carry), None

        if (REMAT_LAYERS and train and x.shape[1] >= REMAT_MIN_TIME
                and x.shape[0] * x.shape[1] >= REMAT_MIN_ROWS):
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, (params["layers"], masks.layer_gates, layer_rngs),
                            unroll=SCAN_UNROLL)

    return masked_layer_norm(x, params["ln"]["g"], params["ln"]["b"], cm)
