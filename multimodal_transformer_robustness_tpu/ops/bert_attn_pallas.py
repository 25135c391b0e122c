"""Dense block-diagonal attention kernel for the short-sequence frozen BERT.

The frozen text header runs BERT at L≈32 wordpieces (run.sh tokenizes to
32; cli/realtime buckets to powers of two).  At these shapes the flash
formulation LOSES (measured 52.7 ms vs 27.2 XLA at B=1024 L=32 — the
64→128 head-dim pad plus per-(b,h) program overhead, see
models/bert.ATTN_IMPL), while the XLA einsum path materializes the
[B, H, L, L] f32 logits in HBM (50 MB/layer at B=1024) and round-trips
them through the bias/softmax/cast fusions — the attention segment is most
of the measured 9.4 ms/fwd gap between production and the matmul-only
floor (BENCH_NOTES "BERT variants A/B").

This kernel packs UPB (batch, head) units of [L, dh] rows into one
[UPB*L, dh] block and computes, per grid program, entirely in VMEM:

    S   = (Q @ K^T) / sqrt(dh)            # ONE [UPB*L, UPB*L] MXU dot
    S  += key-padding bias  (HF additive (1-mask) * -10000 semantics)
    S   = -inf outside the unit block-diagonal
    P   = softmax_f32(S)                   # cross-unit weights EXACTLY 0
    out = P @ V                            # second MXU dot

The cross-unit logits are wasted FLOPs (UPB x the minimal attention
FLOPs — which are <2% of the layer's projection FLOPs, so the waste is
noise) but they buy full-width MXU tiles (the per-unit [L,dh]@[dh,L] dots
XLA dispatches are <10% MXU utilization at L=32, dh=64) and zero HBM
logits traffic.  Cross-unit softmax weights are exactly ``0.0`` (``exp(-inf
- m) == 0`` with a finite in-unit row max), and adding exact zeros cannot
perturb an f32 accumulation, so ``P @ V`` over the packed rows equals the
per-unit contraction.

Numerics replicate models/bert.bert_apply's XLA composition (which itself
matches the reference's frozen HF BertSelfAttention, torch softmax over
QK^T/sqrt(d) + additive mask bias — src/dynamic_models2.py:42-55): f32
logits/softmax, probabilities cast to the compute dtype before the V dot.
Equivalence is pinned by tests/test_bert_attn_pallas.py.

Forward-only by design: the text BERT is frozen (models/mult.py stops
gradients), so no VJP is needed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bert_ffn_pallas import _ln_epilogue


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _f32row(a):
    return a.reshape(1, -1).astype(jnp.float32)


def default_units_per_block(L: int, target_rows: int = 512) -> int:
    """~target_rows packed rows per program, rounded up so UPB*L is
    sublane-aligned (a multiple of 8 rows).  512 measured optimal for
    dense_attention_blockdiag (upb 16 beat 8/32 at L=32)."""
    upb = max(1, target_rows // L)
    g = math.gcd(L, 8)
    step = 8 // g
    return _cdiv(upb, step) * step


def default_block_items(L: int) -> int:
    """attention_block_fused block size: 128 rows measured optimal at
    L=32 (b4 14.52 ms vs b8 14.90 / b2 15.20 / b16 16.19 on-chip
    2026-08-18 — the VPU work on the [R, R] logits scales with R while
    the MXU projection dots saturate already at 128 rows)."""
    return default_units_per_block(L, target_rows=128)


def _dense_attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                       L: int, upb: int, dh: int):
    q = q_ref[...]                                   # [upb*L, dh]
    k = k_ref[...]
    v = v_ref[...]
    # NOTE no precision= on these dots: precision=HIGHEST with bf16
    # operands crashes the Mosaic compiler outright (remote_compile HTTP
    # 500, bisected 2026-08-18); it is meaningless for bf16 anyway, and
    # under the f32 test policy the kernel runs in interpret mode where
    # conftest pins the default matmul precision.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [upb*L, upb*L] f32
    # same op order as the XLA path: /sqrt(dh), then the additive HF bias
    # (bias block is sublane-replicated to 8 rows — Mosaic requires >=8-row
    # blocks — row 0 is the payload)
    s = s / jnp.float32(math.sqrt(dh)) + bias_ref[0:1, :]
    n = upb * L
    ru = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // L
    cu = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // L
    s = jnp.where(ru == cu, s, -jnp.inf)
    # jax.nn.softmax in f32; every row's in-unit columns are finite (padded
    # keys carry the finite -10000 bias), so the max and denominator are
    # finite and the -inf cross-unit entries exp to exactly 0.0
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("units_per_block", "interpret"))
def dense_attention_blockdiag(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              key_mask: jnp.ndarray, *,
                              units_per_block: int | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Multi-head attention with HF key-padding-bias semantics, fused.

    q/k/v: [B, L, H, dh] (bert_apply's projection layout, UNscaled — the
    1/sqrt(dh) happens in-kernel like the XLA path); key_mask: [B, L]
    (1 = attend).  Returns [B, L, H*dh] in q's dtype.
    """
    B, L, H, dh = q.shape
    upb = units_per_block or default_units_per_block(L)
    units = B * H
    n_blocks = _cdiv(units, upb)
    pad_units = n_blocks * upb - units

    def to_units(a):
        rows = a.transpose(0, 2, 1, 3).reshape(units * L, dh)
        if pad_units:
            rows = jnp.pad(rows, ((0, pad_units * L), (0, 0)))
        return rows

    qu, ku, vu = to_units(q), to_units(k), to_units(v)
    # per-key additive bias, one row per unit (padded units get ZERO-filled
    # bias rows from jnp.pad -> a uniform softmax over zero V rows ->
    # finite garbage rows that are sliced off; never NaN)
    bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0       # [B, L]
    bias_u = jnp.repeat(bias, H, axis=0)                         # [B*H, L]
    if pad_units:
        bias_u = jnp.pad(bias_u, ((0, pad_units), (0, 0)))
    # one [upb*L] bias row per block, sublane-replicated x8 (Mosaic block
    # shapes need the second-to-last dim divisible by 8); ~16 KB DMA per
    # program — noise next to the q/k/v blocks
    bias_rows = jnp.repeat(bias_u.reshape(n_blocks, upb * L), 8, axis=0)

    rows_blk = upb * L
    out = pl.pallas_call(
        functools.partial(_dense_attn_kernel, L=L, upb=upb, dh=dh),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((rows_blk, dh), lambda i: (i, 0))] * 3
        + [pl.BlockSpec((8, rows_blk), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows_blk, dh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * rows_blk, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qu, ku, vu, bias_rows)
    out = out[:units * L].reshape(B, H, L, dh)
    return out.transpose(0, 2, 1, 3).reshape(B, L, H * dh)


# ---------------------------------------------------------------------------
# Stage 2: the ENTIRE BertSelfAttention + BertSelfOutput block in one kernel.
#
# dense_attention_blockdiag still pays, per layer, the three q/k/v HBM
# round-trips plus four [B, L, H, dh] <-> unit-major relayouts.  This kernel
# removes all of them: it takes x in its NATURAL [rows, h] layout, computes
# the q/k/v projections as full-width [R, h] @ [h, h] dots in VMEM, runs the
# per-head block-diagonal attention with STATIC lane slices of q/k/v (heads
# are contiguous 64-lane column groups — no transpose anywhere), then the
# o-proj + residual + LN1 epilogue (absorbing bert_ffn_pallas.proj_ln_block).
# HBM sees the x block, the grid-invariant weights, and the output block —
# nothing else.  Units are batch ITEMS here (each program holds BI items x
# all heads), so the key-padding bias is one row per item.
# ---------------------------------------------------------------------------


def _attn_block_kernel(x_ref, bias_ref, diag_ref, wq_ref, qb_ref, wk_ref,
                       kb_ref, wv_ref, vb_ref, wo_ref, ob_ref, g_ref, bb_ref,
                       o_ref, *, L: int, n_heads: int, dh: int, eps: float,
                       softmax_dtype=jnp.float32):
    x = x_ref[...]                                    # [R, h]
    # NOTE no precision= on any dot here — precision=HIGHEST with bf16
    # operands crashes the Mosaic compiler (bisected 2026-08-18)
    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b_ref[...]).astype(x.dtype)

    q = proj(wq_ref, qb_ref)
    k = proj(wk_ref, kb_ref)
    v = proj(wv_ref, vb_ref)
    colbias = bias_ref[0:1, :]                        # [1, R] f32
    diag = diag_ref[...]                              # [R, R] f32 0/-inf
    scale = jnp.float32(math.sqrt(dh))
    parts = []
    for hd in range(n_heads):                         # static unroll
        sl = slice(hd * dh, (hd + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s / scale + colbias + diag
        # the max subtraction stays f32 (it sees the -inf/-10000 masks);
        # softmax_dtype=bf16 runs the exp/sum/div VPU tail half-width —
        # the measured "bf16 softmax" policy cell (BENCH_NOTES)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(softmax_dtype))
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        parts.append(jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
    attn = jnp.concatenate(parts, axis=1)             # [R, h]
    y = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    y = (y + ob_ref[...]).astype(x.dtype)
    o_ref[...] = _ln_epilogue(x + y, g_ref[...], bb_ref[...],
                              eps).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "eps", "block_items",
                                             "interpret", "softmax_dtype"))
def attention_block_fused(x: jnp.ndarray, key_mask: jnp.ndarray,
                          wq, qb, wk, kb, wv, vb, wo, ob, ln_g, ln_b, *,
                          n_heads: int, eps: float,
                          block_items: int | None = None,
                          interpret: bool = False,
                          softmax_dtype: str = "float32") -> jnp.ndarray:
    """``LayerNorm(x + o_proj(MHA(x)))`` — HF BertSelfAttention +
    BertSelfOutput — fused into one pallas_call.

    x: [B, L, h]; key_mask: [B, L] (1 = attend); weights [h, h] in
    ``x @ w.T`` orientation (HF state-dict layout); biases/LN params [h].
    Returns [B, L, h] in x's dtype.

    ``softmax_dtype="bfloat16"`` is the policy-gated cell from VERDICT r3
    #8: the exp/sum/div softmax tail runs in bf16 (the max subtraction and
    the masks stay f32).  Accuracy oracle in tests/test_bf16_softmax.py;
    accept/reject record in BENCH_NOTES — the default stays f32, the
    replicated reference numeric (torch softmax is f32).
    """
    B, L, h = x.shape
    dh = h // n_heads
    bi = block_items or default_block_items(L)
    n_blocks = _cdiv(B, bi)
    pad_b = n_blocks * bi - B

    rows = x.reshape(B * L, h)
    if pad_b:
        rows = jnp.pad(rows, ((0, pad_b * L), (0, 0)))
    bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0       # [B, L]
    if pad_b:
        bias = jnp.pad(bias, ((0, pad_b), (0, 0)))
    R = bi * L
    bias_rows = jnp.repeat(bias.reshape(n_blocks, R), 8, axis=0)
    # grid-invariant additive block-diag mask (0 on an item's own LxL
    # block, -inf across items) — fetched once, lives in VMEM
    ru = jnp.arange(R)[:, None] // L
    diag = jnp.where(ru == ru.T, 0.0, -jnp.inf).astype(jnp.float32)

    dt = x.dtype
    consts = [wq.T.astype(dt), _f32row(qb), wk.T.astype(dt), _f32row(kb),
              wv.T.astype(dt), _f32row(vb), wo.T.astype(dt), _f32row(ob),
              _f32row(ln_g), _f32row(ln_b)]
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, L=L, n_heads=n_heads, dh=dh,
                          eps=eps, softmax_dtype=jnp.dtype(softmax_dtype)),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((R, h), lambda i: (i, 0)),
                  pl.BlockSpec((8, R), lambda i: (i, 0)),
                  pl.BlockSpec((R, R), lambda i: (0, 0))]
        + [pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in consts],
        out_specs=pl.BlockSpec((R, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * R, h), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(rows, bias_rows, diag, *consts)
    return out[:B * L].reshape(B, L, h)
