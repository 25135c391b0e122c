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
# Fused T==1 residual-block kernels (ops/trunk_block_pallas.py): each trunk
# layer at T==1 collapses (with the attention fast path) to two structurally
# identical residual blocks; the kernel runs each as ONE pallas_call fwd +
# one bwd (custom VJP, in-kernel hash dropout) instead of ~16 XLA kernels.
# "auto" resolves to the kernel on TPU when the weights fit VMEM; default
# stays "xla" until the on-chip A/B shows a win (BENCH_NOTES protocol).
# NOTE: flipping changes train-mode dropout REALIZATIONS (hash stream, not
# jax.random) — distribution, not stream, is the contract (same policy as
# the flash kernel's in-softmax dropout).
TRUNK_IMPL = "xla"     # "auto" | "pallas" | "xla"
TRUNK_INTERPRET = False  # tests: run the kernel in interpret mode on CPU
TRUNK_BLOCK_ROWS = 128


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


def _trunk_resolved_impl() -> str:
    impl = TRUNK_IMPL
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _seed_from_key(key: Optional[jax.Array]):
    """Raw uint32 [2] rng key -> int32 hash seed for the fused kernels'
    counter-based dropout (no RNG op; the murmur finalizer mixes further)."""
    if key is None:
        return 0
    return jax.lax.bitcast_convert_type(key[0] ^ key[1], jnp.int32)


def _layer_forward_fused(lp, x, x_v, hp, m, attn_rate, train, rngs):
    """T==1 layer as two fused residual-block kernels (see
    ops/trunk_block_pallas.py for the exact correspondence to the XLA body
    below; the T==1 softmax is identically 1, so the attention half is the
    value projection + out-projection with per-(row, head) attn-dropout —
    the same algebra as attention.py's fast path)."""
    from .trunk_block_pallas import fused_residual_block

    cm = m.channel_mask
    h_, dh = hp.num_heads, hp.head_dim
    hdh = h_ * dh
    e_in = x.shape[-1]
    w_attn = lp["attn"]
    m_mid = (m.head_mask[:, None] * m.head_dim_mask[None, :]).reshape(hdh)
    have_rng = rngs[0] is not None
    dm_attn = train and have_rng and not hp.flash_zero_rates
    dr = train and have_rng and hp.res_dropout > 0
    dm_ffn = train and have_rng and hp.relu_dropout > 0
    self_mode = x_v is None
    x = fused_residual_block(
        x, x if self_mode else x_v,
        w_attn["in_proj_w"][2].reshape(hdh, e_in),
        w_attn["in_proj_b"][2].reshape(hdh),
        w_attn["out_w"].reshape(e_in, hdh), w_attn["out_b"],
        lp["ln0"]["g"], lp["ln0"]["b"],
        cm if self_mode else None, m_mid, cm if self_mode else None,
        act="id", mid_rep=dh, rate_mid=attn_rate, rate_res=hp.res_dropout,
        seed_mid=_seed_from_key(rngs[0]), seed_res=_seed_from_key(rngs[1]),
        use_drop_mid=dm_attn, use_drop_res=dr,
        block_rows=TRUNK_BLOCK_ROWS, interpret=TRUNK_INTERPRET)
    return fused_residual_block(
        x, x, lp["fc1"]["w"], lp["fc1"]["b"], lp["fc2"]["w"], lp["fc2"]["b"],
        lp["ln1"]["g"], lp["ln1"]["b"], cm, m.ffn_mask, cm,
        act="relu", mid_rep=1, rate_mid=hp.relu_dropout,
        rate_res=hp.res_dropout,
        seed_mid=_seed_from_key(rngs[2]), seed_res=_seed_from_key(rngs[3]),
        use_drop_mid=dm_ffn, use_drop_res=dr,
        block_rows=TRUNK_BLOCK_ROWS, interpret=TRUNK_INTERPRET)


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
    if tq == 1 and tk == 1 and attn_bias is None and \
            _trunk_resolved_impl() == "pallas":
        from .trunk_block_pallas import fits_vmem
        itemsize = jnp.dtype(x.dtype).itemsize
        hdh = hp.num_heads * hp.head_dim
        if (fits_vmem(x.shape[-1], hdh, itemsize, TRUNK_BLOCK_ROWS)
                and fits_vmem(x.shape[-1], 4 * hdh, itemsize,
                              TRUNK_BLOCK_ROWS)):
            return _layer_forward_fused(lp, x, x_v, hp, m, attn_rate, train,
                                        rngs)
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
