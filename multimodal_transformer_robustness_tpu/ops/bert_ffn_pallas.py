"""Fused frozen-BERT layer-epilogue kernels — Pallas TPU, forward-only.

A BERT encoder layer (HF BertLayer; the reference runs it frozen under
torch.no_grad, src/dynamic_models2.py:46-55) is

    x2  = LayerNorm(x + o_proj(attention))            # BertSelfOutput
    out = LayerNorm(x2 + fc2(gelu(fc1(x2))))          # Intermediate+Output

Under XLA these are dots plus separate elementwise/reduction fusions, each
round-tripping the [B*L, ffn] / [B*L, h] activations through HBM, plus an
exact-erf gelu over ~100M elements/layer on the VPU.  The kernels here
compute each block for a row-block of the input in one ``pallas_call``:
intermediates never leave VMEM — HBM sees only the input block, the
(grid-invariant) weights and the output block.

  * :func:`proj_ln_block`   — o-proj + residual + LN1
  * :func:`ffn_ln_block`    — fc1 + gelu + fc2 + residual + LN2
  * :func:`ffn_ln_block_q`  — same with --bert_int8 int8 weights and
                              in-kernel dynamic per-row int8 activations

Forward-only by design: the text BERT is FROZEN (no gradients flow through
it — models/mult.py stops them), so no VJP is needed.  The trainable trunk
never routes through these kernels.

Numerics match :func:`models.bert.bert_apply`'s unfused compositions to
bf16/f32 fusion-rounding tolerance (exact-erf gelu, f32 LayerNorm moments,
residual in the compute dtype); exactness is pinned by
tests/test_bert_ffn_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ln_epilogue(s, g, b, eps: float):
    """In-kernel LayerNorm with f32 moments (models/bert._ln semantics);
    shared by every kernel so a numerics fix lands in all of them."""
    # centered two-pass variance: E[x^2]-mu^2 cancels catastrophically when
    # mu^2 >> var (pretrained-BERT outlier channels); s is VMEM-resident
    # f32 here so the centered form costs nothing extra
    s32 = s.astype(jnp.float32)
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    sc = s32 - mu
    var = jnp.mean(jnp.square(sc), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (sc * inv) * g + b


# XLA's f32 erf rational approximation (xla/hlo/builder/lib/math.cc
# ErfImpl32): erf(x) = x * P(x^2)/Q(x^2) with x clamped to [-4, 4].  Inlined
# because Mosaic TPU has no erf/erfc lowering (jax.nn.gelu(approximate=False)
# routes through ndtr -> erfc and fails to lower in-kernel); this is the
# same polynomial XLA itself evaluates for lax.erf on f32, so the fused
# kernels stay within fusion-rounding distance of the unfused gelu.
_ERF_P = (0.00022905065861350646, 0.0034082910107109506,
          0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_Q = (-1.1791602954361697e-7, 2.3547966471313185e-5,
          0.0010179625278914885, 0.014070470171167667,
          0.11098505178285362, 0.49746925110067538, 1.0)


def _gelu_erf(x):
    """Exact-erf gelu, f32 internally, result in ``x.dtype`` like
    jax.nn.gelu(approximate=False)."""
    xf = x.astype(jnp.float32)
    w = jnp.clip(xf * jnp.float32(0.7071067811865476), -4.0, 4.0)
    w2 = w * w
    p = jnp.float32(_ERF_P[0])
    for c in _ERF_P[1:]:
        p = p * w2 + jnp.float32(c)
    q = jnp.float32(_ERF_Q[0])
    for c in _ERF_Q[1:]:
        q = q * w2 + jnp.float32(c)
    erf = w * p / q
    return (xf * 0.5 * (1.0 + erf)).astype(x.dtype)


def _qround(xf, eps=1e-8):
    """models/bert._qrows semantics: per-row symmetric int8 with f32 scale."""
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), eps) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _rows_call(kernel, rows_in, consts, h: int, out_dtype, block_rows: int,
               interpret: bool):
    """Shared pad/grid/unpad harness.  ``rows_in``: [rows, h] arrays blocked
    together along rows (pad rows compute garbage that is sliced off —
    every row is independent in these kernels); ``consts``: grid-invariant
    2-D operands (weights / biases / LN params), fetched once."""
    rows = rows_in[0].shape[0]
    padded = _cdiv(rows, block_rows) * block_rows
    if padded != rows:
        rows_in = [jnp.pad(a, ((0, padded - rows), (0, 0))) for a in rows_in]
    in_specs = (
        [pl.BlockSpec((block_rows, h), lambda i: (i, 0))] * len(rows_in)
        + [pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in consts])
    out = pl.pallas_call(
        kernel,
        grid=(padded // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, h), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*rows_in, *consts)
    return out[:rows] if padded != rows else out


def _flat_rows(x):
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return x.reshape(rows, x.shape[-1])


def _f32_row(a, n):
    return a.reshape(1, n).astype(jnp.float32)


# --------------------------------------------------------- float kernels

def _ffn_ln_kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, g_ref, bb_ref,
                   o_ref, *, eps: float):
    x = x_ref[...]
    # fc1 + exact gelu; f32 MXU accumulation, bias in f32, then back to the
    # compute dtype like the unfused ``x @ w.T + b`` (bf16 dot rounds after
    # its f32 accumulation too)
    h1 = jnp.dot(x, w1t_ref[...], preferred_element_type=jnp.float32)
    h1 = (h1 + b1_ref[...]).astype(x.dtype)
    g1 = _gelu_erf(h1)
    y = jnp.dot(g1, w2t_ref[...], preferred_element_type=jnp.float32)
    y = (y + b2_ref[...]).astype(x.dtype)
    out = _ln_epilogue(x + y, g_ref[...], bb_ref[...], eps)
    o_ref[...] = out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def ffn_ln_block(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                 w2: jnp.ndarray, b2: jnp.ndarray, ln_g: jnp.ndarray,
                 ln_b: jnp.ndarray, *, eps: float,
                 block_rows: int = 128, interpret: bool = False):
    """``LayerNorm(x + (gelu(x @ w1.T + b1) @ w2.T + b2))`` fused.
    x: [..., h]; w1: [ffn, h]; w2: [h, ffn]; LN params [h]."""
    h = x.shape[-1]
    ffn = w1.shape[0]
    # pre-transpose once per call so the in-kernel dots are plain [R,h]@[h,F]
    # / [R,F]@[F,h] (no in-kernel relayout); XLA hoists these out of any
    # surrounding scan iteration over stacked frozen layers.
    out = _rows_call(
        functools.partial(_ffn_ln_kernel, eps=eps),
        [_flat_rows(x)],
        [w1.T.astype(x.dtype), _f32_row(b1, ffn),
         w2.T.astype(x.dtype), _f32_row(b2, h),
         _f32_row(ln_g, h), _f32_row(ln_b, h)],
        h, x.dtype, block_rows, interpret)
    return out.reshape(x.shape)


def _proj_ln_kernel(r_ref, a_ref, wt_ref, b_ref, g_ref, bb_ref, o_ref, *,
                    eps: float):
    """LN(resid + a @ w.T + b) — the attention epilogue (o-proj, residual,
    first LayerNorm) in one VMEM pass."""
    r = r_ref[...]
    y = jnp.dot(a_ref[...], wt_ref[...], preferred_element_type=jnp.float32)
    y = (y + b_ref[...]).astype(r.dtype)
    out = _ln_epilogue(r + y, g_ref[...], bb_ref[...], eps)
    o_ref[...] = out.astype(r.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def proj_ln_block(resid: jnp.ndarray, a: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray, ln_g: jnp.ndarray, ln_b: jnp.ndarray, *,
                  eps: float, block_rows: int = 256, interpret: bool = False):
    """``LayerNorm(resid + a @ w.T + b)`` fused — BERT's attention-output
    block (HF BertSelfOutput).  ``resid``/``a``: [..., h] with identical
    leading dims; ``w``: [h, h]."""
    h = resid.shape[-1]
    out = _rows_call(
        functools.partial(_proj_ln_kernel, eps=eps),
        [_flat_rows(resid), _flat_rows(a)],
        [w.T.astype(a.dtype), _f32_row(b, h),
         _f32_row(ln_g, h), _f32_row(ln_b, h)],
        h, resid.dtype, block_rows, interpret)
    return out.reshape(resid.shape)


# ---------------------------------------------------------- int8 kernel

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
          + b1_ref[...]).astype(x.dtype)
    g1 = _gelu_erf(h1)
    gq, sg = _qround(g1.astype(jnp.float32))
    acc2 = jnp.dot(gq, w2qt_ref[...], preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * sg * w2s_ref[...]
         + b2_ref[...]).astype(x.dtype)
    out = _ln_epilogue(x + y, g_ref[...], bb_ref[...], eps)
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
    h = x.shape[-1]
    ffn = w1["q"].shape[0]
    out = _rows_call(
        functools.partial(_ffn_ln_kernel_q, eps=eps),
        [_flat_rows(x)],
        [w1["q"].T, _f32_row(w1["s"], ffn), _f32_row(b1, ffn),
         w2["q"].T, _f32_row(w2["s"], h), _f32_row(b2, h),
         _f32_row(ln_g, h), _f32_row(ln_b, h)],
        h, x.dtype, block_rows, interpret)
    return out.reshape(x.shape)
