"""Fused residual block for the T==1 trunk layers — Pallas TPU, trainable.

After the projection headers every MOSEI trunk stream is a single fused
step (models/mult.py: ``base`` is [M, B, 1, d]), so with the T==1 attention
fast path (ops/attention.py) each of the 18 trunk encoder layers reduces to
TWO structurally identical residual blocks:

  attention block:  y = x + d_res . (m_out . ((d_mid ⊗ ((LN(src, m_in) @ Wv^T
                         + bv) . hd)) @ Wo^T + bo))
  FFN block:        y = x + d_res . (m_out . ((relu((LN(x, m_in) @ W1^T
                         + b1) . m_ffn) . d_mid) @ W2^T + b2))

i.e. ONE template:  y = x + d_res . (m_out . ((d_mid . act((LN(src, m_in)
                         @ W1^T + b1) . m_mid)) @ W2^T + b2))

with ``act`` identity|relu, ``src`` = x (self) or the value stream (cross;
the T==1 softmax is identically 1, so the query/key never matter), and
``d_mid`` drawn per (row, head) for attention (broadcast over head_dim) or
per element for the FFN.  Under XLA each layer is ~16 small kernels
(LN moments, dot, bias, masks, 2 dropout draws + applies, residual) each
round-tripping [B, d]/[B, ffn] activations through HBM; here each block is
one ``pallas_call`` (one more for the backward) with everything VMEM-
resident.

Gradients: custom VJP.  The backward kernel recomputes the forward
intermediates from the saved inputs (recompute-over-reload, the
ops/bigru_pallas.py trade), derives every gradient in VMEM, writes dx/dsrc
per row-block and ACCUMULATES dW1/db1/dW2/db2/dgamma/dbeta across the grid
in revisited output blocks.

Dropout uses the counter-based murmur3 hash of ops/attention_pallas.py
(`_hash_uniform`) on (seed, global row, group column), regenerated
bit-identically in forward and backward — the realizations differ from the
XLA path's jax.random stream (as torch's differ from both); distribution,
not stream, is the contract (same policy as the flash kernel's in-softmax
dropout).  Masked LayerNorm matches ops/layernorm.py::masked_layer_norm
(masked f32 moments, biased variance, zero-safe count, output re-masked).

Semantics sources: ops/encoder.py::_layer_forward (reference
modules/dynamic_transformer.py:159-188) and the T==1 fast path in
ops/attention.py (reference modules/dynamic_multihead_attention.py:84-158).
RETIRED from the encoder dispatch surface 2026-08-19 (VERDICT r3 #7): the
on-chip A/B (benchmarks/stack_knobs_ab.py, BENCH_NOTES "staged trunk knobs")
measured it a loss at both production regimes — XLA's own fusion of the tiny
T==1 bodies wins.  Kept as a standalone library op (fused masked
LN -> dense -> act -> dense -> dropout -> residual block with a custom VJP)
with kernel-level oracle tests in tests/test_trunk_block_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _hash_uniform


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# shared in-kernel math (f32 registers; dots take the compute dtype)
# --------------------------------------------------------------------------


def _masked_ln_fwd(src32, m, g, b, n, eps: float):
    """ops/layernorm.py semantics: masked f32 moments, biased variance,
    output re-masked.  Returns (s32, t, inv) — t/inv feed the backward."""
    mu = jnp.sum(src32 * m, axis=-1, keepdims=True) / n
    diff = (src32 - mu) * m
    var = jnp.sum(diff * diff, axis=-1, keepdims=True) / n
    inv = jax.lax.rsqrt(var + eps)
    t = (src32 - mu) * inv
    s32 = (t * g + b) * m
    return s32, t, inv


def _drop_field(seed, rate, rows, cols):
    """Inverted-dropout field in {0, 1/(1-rate)} from the position hash —
    ops/dropout.py realization semantics (keep iff u >= rate), flash-kernel
    regeneration contract (identical fwd/bwd, block-decomposition-free)."""
    u = _hash_uniform(seed, rows, cols)
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _mid_cols(block_f: int, rep: int):
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_f), 1)
    return cols // rep if rep > 1 else cols


def _row_ids(block_rows: int, width: int):
    gid = pl.program_id(0)
    return (gid * block_rows
            + jax.lax.broadcasted_iota(jnp.int32, (block_rows, width), 0))


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(x_ref, src_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, g_ref,
                lb_ref, mi_ref, mm_ref, mo_ref, rm_ref, rr_ref, sm_ref,
                sr_ref, o_ref, *, act: str, mid_rep: int, use_dm: bool,
                use_dr: bool, eps: float, block_rows: int):
    x = x_ref[...]
    dt = x.dtype
    m = mi_ref[...]                                   # [1, E] f32
    n = jnp.maximum(jnp.sum(m), 1.0)
    s32, _, _ = _masked_ln_fwd(src_ref[...].astype(jnp.float32), m,
                               g_ref[...], lb_ref[...], n, eps)
    p = jnp.dot(s32.astype(dt), w1t_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    u = p * mm_ref[...]
    a = jnp.maximum(u, 0.0) if act == "relu" else u
    if use_dm:
        f1 = a.shape[-1]
        a = a * _drop_field(sm_ref[0, 0], rm_ref[0, 0],
                            _row_ids(block_rows, f1), _mid_cols(f1, mid_rep))
    z = jnp.dot(a.astype(dt), w2t_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    y0 = z * mo_ref[...]
    if use_dr:
        e = y0.shape[-1]
        y0 = y0 * _drop_field(sr_ref[0, 0], rr_ref[0, 0],
                              _row_ids(block_rows, e), _mid_cols(e, 1))
    o_ref[...] = (x.astype(jnp.float32) + y0).astype(dt)


# --------------------------------------------------------------------------
# backward kernel: recompute forward, emit dx/dsrc per block, accumulate
# dW/db/dLN across the (sequential) grid in revisited output blocks
# --------------------------------------------------------------------------


def _bwd_kernel(x_ref, src_ref, dout_ref, w1_ref, w1t_ref, b1_ref, w2_ref,
                w2t_ref, b2_ref, g_ref, lb_ref, mi_ref, mm_ref, mo_ref,
                rm_ref, rr_ref, sm_ref, sr_ref,
                dx_ref, dsrc_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dg_ref, dlb_ref, *, act: str, mid_rep: int, use_dm: bool,
                use_dr: bool, eps: float, block_rows: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    dt = x_ref.dtype
    m = mi_ref[...]
    g = g_ref[...]
    n = jnp.maximum(jnp.sum(m), 1.0)
    # ---- recompute forward intermediates (VMEM-resident)
    s32, t, inv = _masked_ln_fwd(src_ref[...].astype(jnp.float32), m,
                                 g, lb_ref[...], n, eps)
    s_c = s32.astype(dt)
    p = jnp.dot(s_c, w1t_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    u = p * mm_ref[...]
    a = jnp.maximum(u, 0.0) if act == "relu" else u
    f1 = a.shape[-1]
    e = x_ref.shape[-1]
    if use_dm:
        dm = _drop_field(sm_ref[0, 0], rm_ref[0, 0],
                         _row_ids(block_rows, f1), _mid_cols(f1, mid_rep))
        ad = a * dm
    else:
        ad = a
    ad_c = ad.astype(dt)

    # ---- backward
    dout = dout_ref[...].astype(jnp.float32)
    if use_dr:
        dr = _drop_field(sr_ref[0, 0], rr_ref[0, 0],
                         _row_ids(block_rows, e), _mid_cols(e, 1))
        dy0 = dout * dr
    else:
        dy0 = dout
    dz = dy0 * mo_ref[...]
    dz_c = dz.astype(dt)
    ct_rows = (((0,), (0,)), ((), ()))  # contract the row axis of both
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(dz_c, ad_c, ct_rows,
                                        preferred_element_type=jnp.float32)
    dad = jnp.dot(dz_c, w2_ref[...], preferred_element_type=jnp.float32)
    da = dad * dm if use_dm else dad
    du = da * (u > 0).astype(jnp.float32) if act == "relu" else da
    dp = du * mm_ref[...]
    dp_c = dp.astype(dt)
    db1_ref[...] += jnp.sum(dp, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(dp_c, s_c, ct_rows,
                                        preferred_element_type=jnp.float32)
    ds = jnp.dot(dp_c, w1_ref[...], preferred_element_type=jnp.float32)

    # ---- masked-LN backward (ds -> dsrc, dgamma, dbeta)
    dsm = ds * m
    dg_ref[...] += jnp.sum(dsm * t, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dsm, axis=0, keepdims=True)
    dtn = dsm * g
    mean1 = jnp.sum(dtn, axis=-1, keepdims=True) / n
    mean2 = jnp.sum(dtn * t, axis=-1, keepdims=True) / n
    dsrc = m * inv * (dtn - mean1 - t * mean2)
    dsrc_ref[...] = dsrc.astype(dt)
    dx_ref[...] = dout.astype(dt)


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

_VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(e: int, f1: int, itemsize: int, block_rows: int) -> bool:
    """Conservative backward-pass footprint: four weight copies in the
    compute dtype, two f32 dW accumulators, ~8 live [R, max(E,F)] f32
    register blocks."""
    w = e * f1
    bytes_ = w * (4 * itemsize + 2 * 4) + block_rows * max(e, f1) * 4 * 8
    return bytes_ <= _VMEM_BUDGET


def _row1(a, dtype=jnp.float32):
    return a.reshape(1, -1).astype(dtype)


def _scalar(a, dtype):
    return jnp.asarray(a, dtype).reshape(1, 1)


def _const_specs(consts):
    # bind ndim per-spec: a bare closure over the loop variable would give
    # every index_map the LAST const's rank
    return [pl.BlockSpec(c.shape, lambda i, n=c.ndim: (0,) * n)
            for c in consts]


def _pad_rows(arr, padded):
    rows = arr.shape[0]
    return jnp.pad(arr, ((0, padded - rows), (0, 0))) if padded != rows else arr


@functools.lru_cache(maxsize=None)
def _make_block_fn(act: str, mid_rep: int, use_dm: bool, use_dr: bool,
                   eps: float, block_rows: int, interpret: bool):
    """custom_vjp-wrapped fused block for one static configuration."""

    kw = dict(act=act, mid_rep=mid_rep, use_dm=use_dm, use_dr=use_dr,
              eps=eps, block_rows=block_rows)

    def fwd(x, src, w1, b1, w2, b2, g, lb, m_in, m_mid, m_out,
            rate_mid, rate_res, seed_mid, seed_res):
        rows, e = x.shape
        f1 = w1.shape[0]
        padded = _cdiv(rows, block_rows) * block_rows
        xp, srcp = _pad_rows(x, padded), _pad_rows(src, padded)
        consts = [w1.T.astype(x.dtype), _row1(b1), w2.T.astype(x.dtype),
                  _row1(b2), _row1(g), _row1(lb), _row1(m_in), _row1(m_mid),
                  _row1(m_out), _scalar(rate_mid, jnp.float32),
                  _scalar(rate_res, jnp.float32),
                  _scalar(seed_mid, jnp.int32), _scalar(seed_res, jnp.int32)]
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(padded // block_rows,),
            in_specs=([pl.BlockSpec((block_rows, e), lambda i: (i, 0))] * 2
                      + _const_specs(consts)),
            out_specs=pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((padded, e), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(xp, srcp, *consts)
        return out[:rows] if padded != rows else out

    def bwd_impl(res, dout):
        (x, src, w1, b1, w2, b2, g, lb, m_in, m_mid, m_out,
         rate_mid, rate_res, seed_mid, seed_res) = res
        rows, e = x.shape
        f1 = w1.shape[0]
        padded = _cdiv(rows, block_rows) * block_rows
        xp, srcp = _pad_rows(x, padded), _pad_rows(src, padded)
        doutp = _pad_rows(dout, padded)
        consts = [w1.astype(x.dtype), w1.T.astype(x.dtype), _row1(b1),
                  w2.astype(x.dtype), w2.T.astype(x.dtype), _row1(b2),
                  _row1(g), _row1(lb), _row1(m_in), _row1(m_mid),
                  _row1(m_out), _scalar(rate_mid, jnp.float32),
                  _scalar(rate_res, jnp.float32),
                  _scalar(seed_mid, jnp.int32), _scalar(seed_res, jnp.int32)]
        rows_spec = pl.BlockSpec((block_rows, e), lambda i: (i, 0))
        acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
        out_shapes = (
            jax.ShapeDtypeStruct((padded, e), x.dtype),      # dx
            jax.ShapeDtypeStruct((padded, e), x.dtype),      # dsrc
            jax.ShapeDtypeStruct((f1, e), jnp.float32),      # dW1
            jax.ShapeDtypeStruct((1, f1), jnp.float32),      # db1
            jax.ShapeDtypeStruct((e, f1), jnp.float32),      # dW2
            jax.ShapeDtypeStruct((1, e), jnp.float32),       # db2
            jax.ShapeDtypeStruct((1, e), jnp.float32),       # dgamma
            jax.ShapeDtypeStruct((1, e), jnp.float32),       # dbeta
        )
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(padded // block_rows,),
            in_specs=([rows_spec] * 3 + _const_specs(consts)),
            out_specs=(rows_spec, rows_spec, acc((f1, e)), acc((1, f1)),
                       acc((e, f1)), acc((1, e)), acc((1, e)), acc((1, e))),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),  # revisited accumulators
            interpret=interpret,
        )(xp, srcp, doutp, *consts)
        dx, dsrc, dw1, db1, dw2, db2, dg, dlb = outs
        if padded != rows:
            dx, dsrc = dx[:rows], dsrc[:rows]
        f0 = lambda v: np.zeros(np.shape(v), jax.dtypes.float0)
        return (dx, dsrc,
                dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
                dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
                dg[0].astype(g.dtype), dlb[0].astype(lb.dtype),
                jnp.zeros_like(m_in), jnp.zeros_like(m_mid),
                jnp.zeros_like(m_out), jnp.zeros_like(
                    jnp.asarray(rate_mid, jnp.float32)),
                jnp.zeros_like(jnp.asarray(rate_res, jnp.float32)),
                f0(seed_mid), f0(seed_res))

    f = jax.custom_vjp(fwd)
    f.defvjp(lambda *args: (fwd(*args), args), bwd_impl)
    return f


def fused_residual_block(
    x: jnp.ndarray,            # [..., E]
    src: jnp.ndarray,          # [..., E]; pass x itself for self mode
    w1: jnp.ndarray,           # [F1, E] (torch [out, in] layout)
    b1: jnp.ndarray,           # [F1]
    w2: jnp.ndarray,           # [E, F1]
    b2: jnp.ndarray,           # [E]
    ln_g: jnp.ndarray,         # [E]
    ln_b: jnp.ndarray,         # [E]
    m_in, m_mid, m_out,        # [E] / [F1] / [E] masks or None
    *,
    act: str = "id",           # "id" | "relu"
    mid_rep: int = 1,          # mid-dropout group width along F1 (Dh for attn)
    rate_mid=0.0,
    rate_res=0.0,
    seed_mid=0,
    seed_res=0,
    use_drop_mid: bool = False,
    use_drop_res: bool = False,
    block_rows: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x + d_res.(m_out.((d_mid.act((LN(src,m_in)@w1.T+b1).m_mid))@w2.T+b2))``

    One VMEM pass forward, one backward (custom VJP; gradients to x, src —
    pass ``src=x`` for self mode and JAX sums the two cotangents — and all
    six parameter leaves).  See module docstring for the exact
    correspondence to ops/encoder.py::_layer_forward's two halves."""
    e = x.shape[-1]
    f1 = w1.shape[0]
    lead = x.shape[:-1]
    ones_e = jnp.ones((e,), jnp.float32)
    fn = _make_block_fn(act, int(mid_rep), bool(use_drop_mid),
                        bool(use_drop_res), 1e-5, int(block_rows),
                        bool(interpret))
    out = fn(x.reshape(-1, e), src.reshape(-1, e), w1, b1, w2, b2,
             ln_g, ln_b,
             ones_e if m_in is None else jnp.asarray(m_in),
             jnp.ones((f1,), jnp.float32) if m_mid is None
             else jnp.asarray(m_mid),
             ones_e if m_out is None else jnp.asarray(m_out),
             rate_mid, rate_res, seed_mid, seed_res)
    return out.reshape(*lead, e)


# --------------------------------------------------------------------------
# dense XLA reference with the SAME hash-dropout realization (test oracle,
# mirrors attention_pallas.dropout_uniform's role for the flash kernel)
# --------------------------------------------------------------------------


def fused_residual_block_reference(
        x, src, w1, b1, w2, b2, ln_g, ln_b, m_in, m_mid, m_out, *,
        act="id", mid_rep=1, rate_mid=0.0, rate_res=0.0, seed_mid=0,
        seed_res=0, use_drop_mid=False, use_drop_res=False):
    e = x.shape[-1]
    f1 = w1.shape[0]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, e)
    src2 = src.reshape(-1, e)
    rows = x2.shape[0]
    m = (jnp.ones((e,), jnp.float32) if m_in is None
         else jnp.asarray(m_in, jnp.float32)).reshape(1, e)
    mm = (jnp.ones((f1,), jnp.float32) if m_mid is None
          else jnp.asarray(m_mid, jnp.float32)).reshape(1, f1)
    mo = (jnp.ones((e,), jnp.float32) if m_out is None
          else jnp.asarray(m_out, jnp.float32)).reshape(1, e)
    n = jnp.maximum(jnp.sum(m), 1.0)
    s32, _, _ = _masked_ln_fwd(src2.astype(jnp.float32), m, ln_g.reshape(1, e),
                               ln_b.reshape(1, e), n, 1e-5)
    p = (jnp.dot(s32.astype(x.dtype), w1.T.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1.reshape(1, f1))
    u = p * mm
    a = jnp.maximum(u, 0.0) if act == "relu" else u
    rids = jax.lax.broadcasted_iota(jnp.int32, (rows, f1), 0)
    if use_drop_mid:
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, f1), 1) // mid_rep
        a = a * _drop_field(jnp.asarray(seed_mid, jnp.int32),
                            jnp.asarray(rate_mid, jnp.float32), rids, cols)
    z = (jnp.dot(a.astype(x.dtype), w2.T.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b2.reshape(1, e))
    y0 = z * mo
    if use_drop_res:
        ridse = jax.lax.broadcasted_iota(jnp.int32, (rows, e), 0)
        colse = jax.lax.broadcasted_iota(jnp.int32, (rows, e), 1)
        y0 = y0 * _drop_field(jnp.asarray(seed_res, jnp.int32),
                              jnp.asarray(rate_res, jnp.float32),
                              ridse, colse)
    out = (x2.astype(jnp.float32) + y0).astype(x.dtype)
    return out.reshape(*lead, e)
