"""Fused frozen-BERT FFN block — Pallas TPU kernel (forward-only).

One BERT encoder layer ends with

    out = LayerNorm(x + fc2(gelu(fc1(x))))            (HF BertLayer; the
                                                       reference runs it
                                                       frozen under
                                                       torch.no_grad,
                                                       src/dynamic_models2.py:46-55)

Under XLA this is two dots plus three separate elementwise/reduction
fusions, each round-tripping the [B*L, ffn] / [B*L, h] activations through
HBM, plus an exact-erf gelu over ~100M elements/layer on the VPU.  This
kernel computes the whole block for a row-block of ``x`` in one
``pallas_call``: the fc1 output, gelu, fc2 output, residual and LayerNorm
never leave VMEM — HBM sees only the input block, the (grid-resident)
weights and the output block.

Forward-only by design: the text BERT is FROZEN (no gradients flow through
it — models/mult.py stops them), so no VJP is needed.  The trainable trunk
never routes through this kernel.

Numerics match :func:`models.bert.bert_apply`'s FFN segment to bf16/f32
fusion-rounding tolerance (exact-erf gelu, f32 LayerNorm moments, residual
in the compute dtype); exactness is pinned by tests/test_bert_ffn_pallas.py
against the unfused composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ffn_ln_kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, g_ref, bb_ref,
                   o_ref, *, eps: float):
    x = x_ref[...]
    # fc1 + exact gelu; f32 MXU accumulation, bias in f32, then back to the
    # compute dtype like the unfused ``x @ w.T + b`` (bf16 dot rounds after
    # its f32 accumulation too)
    h1 = jnp.dot(x, w1t_ref[...], preferred_element_type=jnp.float32)
    h1 = (h1 + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    g1 = jax.nn.gelu(h1, approximate=False)
    y = jnp.dot(g1, w2t_ref[...], preferred_element_type=jnp.float32)
    y = (y + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    s = x + y
    # LayerNorm, f32 moments (models/bert._ln)
    mu = jnp.mean(s.astype(jnp.float32), axis=-1, keepdims=True)
    ms = jnp.mean(jnp.square(s.astype(jnp.float32)), axis=-1, keepdims=True)
    var = jnp.maximum(ms - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    out = ((s.astype(jnp.float32) - mu) * inv) * g_ref[...] + bb_ref[...]
    o_ref[...] = out.astype(x.dtype)


def _proj_ln_kernel(r_ref, a_ref, wt_ref, b_ref, g_ref, bb_ref, o_ref, *,
                    eps: float):
    """LN(resid + a @ w.T + b) — the attention epilogue (o-proj, residual,
    first LayerNorm) in one VMEM pass."""
    r = r_ref[...]
    y = jnp.dot(a_ref[...], wt_ref[...], preferred_element_type=jnp.float32)
    y = (y + b_ref[...].astype(jnp.float32)).astype(r.dtype)
    s = r + y
    mu = jnp.mean(s.astype(jnp.float32), axis=-1, keepdims=True)
    ms = jnp.mean(jnp.square(s.astype(jnp.float32)), axis=-1, keepdims=True)
    var = jnp.maximum(ms - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    out = ((s.astype(jnp.float32) - mu) * inv) * g_ref[...] + bb_ref[...]
    o_ref[...] = out.astype(r.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def proj_ln_block(resid: jnp.ndarray, a: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray, ln_g: jnp.ndarray, ln_b: jnp.ndarray, *,
                  eps: float, block_rows: int = 256, interpret: bool = False):
    """``LayerNorm(resid + a @ w.T + b)`` fused — BERT's attention-output
    block (HF BertSelfOutput).  ``resid``/``a``: [..., h] with identical
    leading dims; ``w``: [h, h]."""
    orig_shape = resid.shape
    h = resid.shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    r2 = resid.reshape(rows, h)
    a2 = a.reshape(rows, h)
    n_pad = _cdiv(rows, block_rows) * block_rows - rows
    if n_pad:
        r2 = jnp.pad(r2, ((0, n_pad), (0, 0)))
        a2 = jnp.pad(a2, ((0, n_pad), (0, 0)))
    wt = w.T.astype(a.dtype)
    grid = (r2.shape[0] // block_rows,)
    out = pl.pallas_call(
        functools.partial(_proj_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((h, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r2.shape[0], h), resid.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(r2, a2, wt, b.reshape(1, h).astype(jnp.float32),
      ln_g.reshape(1, h).astype(jnp.float32),
      ln_b.reshape(1, h).astype(jnp.float32))
    if n_pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def _qround(xf, eps=1e-8):
    """models/bert._qrows semantics: per-row symmetric int8 with f32 scale."""
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), eps) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _ffn_ln_kernel_q(x_ref, w1qt_ref, w1s_ref, b1_ref, w2qt_ref, w2s_ref,
                     b2_ref, g_ref, bb_ref, o_ref, *, eps: float):
    """int8 weights + dynamic per-row int8 activations (the --bert_int8
    path, models/bert._qrows/_qdot) with the same fused epilogue as the
    float kernel: int32 MXU accumulation, f32 dequant, gelu/residual/LN all
    VMEM-resident."""
    x = x_ref[...]
    xq, sx = _qround(x.astype(jnp.float32))
    acc = jnp.dot(xq, w1qt_ref[...], preferred_element_type=jnp.int32)
    h1 = (acc.astype(jnp.float32) * sx * w1s_ref[...]
          + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    g1 = jax.nn.gelu(h1, approximate=False)
    gq, sg = _qround(g1.astype(jnp.float32))
    acc2 = jnp.dot(gq, w2qt_ref[...], preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * sg * w2s_ref[...]
         + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    s = x + y
    mu = jnp.mean(s.astype(jnp.float32), axis=-1, keepdims=True)
    ms = jnp.mean(jnp.square(s.astype(jnp.float32)), axis=-1, keepdims=True)
    var = jnp.maximum(ms - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    out = ((s.astype(jnp.float32) - mu) * inv) * g_ref[...] + bb_ref[...]
    o_ref[...] = out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def ffn_ln_block_q(x: jnp.ndarray, w1: dict, b1: jnp.ndarray,
                   w2: dict, b2: jnp.ndarray, ln_g: jnp.ndarray,
                   ln_b: jnp.ndarray, *, eps: float,
                   block_rows: int = 128, interpret: bool = False):
    """Quantized-weight variant of :func:`ffn_ln_block` — ``w1``/``w2`` are
    ``{"q": int8 [out, in], "s": f32 [out]}`` dicts from
    models/bert.quantize_bert_params.  Matches the unfused
    ``_ln(x + _qproj(gelu(_qproj(x, w1, b1)), w2, b2))`` composition."""
    orig_shape = x.shape
    h = x.shape[-1]
    ffn = w1["q"].shape[0]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, h)
    n_pad = _cdiv(rows, block_rows) * block_rows - rows
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))

    w1qt = w1["q"].T          # [h, ffn] int8
    w2qt = w2["q"].T          # [ffn, h] int8

    grid = (x2.shape[0] // block_rows,)
    out = pl.pallas_call(
        functools.partial(_ffn_ln_kernel_q, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((h, ffn), lambda i: (0, 0)),
            pl.BlockSpec((1, ffn), lambda i: (0, 0)),
            pl.BlockSpec((1, ffn), lambda i: (0, 0)),
            pl.BlockSpec((ffn, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w1qt, w1["s"].reshape(1, ffn).astype(jnp.float32),
      b1.reshape(1, ffn).astype(jnp.float32),
      w2qt, w2["s"].reshape(1, h).astype(jnp.float32),
      b2.reshape(1, h).astype(jnp.float32),
      ln_g.reshape(1, h).astype(jnp.float32),
      ln_b.reshape(1, h).astype(jnp.float32))
    if n_pad:
        out = out[:rows]
    return out.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def ffn_ln_block(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                 w2: jnp.ndarray, b2: jnp.ndarray, ln_g: jnp.ndarray,
                 ln_b: jnp.ndarray, *, eps: float,
                 block_rows: int = 128, interpret: bool = False):
    """``LayerNorm(x + (gelu(x @ w1.T + b1) @ w2.T + b2))`` fused.

    x: [..., h] (leading dims flattened to rows); w1: [ffn, h]; w2: [h, ffn];
    LN params [h].  Rows are padded to ``block_rows`` (pad rows compute
    garbage that is sliced off — every row's FFN/LN is row-independent).
    """
    orig_shape = x.shape
    h = x.shape[-1]
    ffn = w1.shape[0]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, h)
    n_pad = _cdiv(rows, block_rows) * block_rows - rows
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))

    # pre-transpose once per call so the in-kernel dots are plain [R,h]@[h,F]
    # / [R,F]@[F,h] (no in-kernel relayout); XLA hoists these out of any
    # surrounding scan iteration over stacked frozen layers.
    w1t = w1.T.astype(x.dtype)
    w2t = w2.T.astype(x.dtype)

    grid = (x2.shape[0] // block_rows,)
    out = pl.pallas_call(
        functools.partial(_ffn_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((h, ffn), lambda i: (0, 0)),
            pl.BlockSpec((1, ffn), lambda i: (0, 0)),
            pl.BlockSpec((ffn, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w1t, b1.reshape(1, ffn).astype(jnp.float32),
      w2t, b2.reshape(1, h).astype(jnp.float32),
      ln_g.reshape(1, h).astype(jnp.float32),
      ln_b.reshape(1, h).astype(jnp.float32))
    if n_pad:
        out = out[:rows]
    return out.reshape(orig_shape)
