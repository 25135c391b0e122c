"""Fused blockwise attention (flash-style) Pallas TPU kernel.

Replaces the bmm -> add-mask -> softmax -> bmm chain of the reference
(modules/dynamic_multihead_attention.py:99-116) for the already-projected
q/k/v.  The reference's future mask is generated INSIDE the kernel from its
rule — ``masked where col - row >= 1 + |Tk - Tq|`` (modules/transformer.py:
150-157) — so no [Tq, Tk] bias tensor ever touches HBM.

Structure: grid (batch*heads, q-blocks, k-blocks) with the key axis
innermost; Pallas streams k/v blocks through VMEM with double buffering while
the flash recurrence (running max / renormalized accumulator) lives in VMEM
scratch across k steps.  Causal masking skips work twice over:
  * the k/v BlockSpec index maps CLAMP the k index for fully-masked blocks,
    so their HBM->VMEM DMAs collapse into repeats of an already-resident
    block (no bandwidth spent);
  * ``@pl.when`` skips their compute.

Written blockwise so sequence length scales past the current 1-token regime
(SURVEY.md §5: today's headers collapse sequences; the kernel serves the
sequence-preserving header variants and any long-context extension).

Differentiable: a custom VJP (ops/attention_pallas_bwd.py) recomputes the
blockwise softmax from the saved log-sum-exp, so training can run through the
kernel — but the kernel has NO in-softmax dropout, so training use is gated
to stacks whose effective attention-dropout rate is zero (including the
reference's hard-coded 0.1 on cross stacks idx>0 — see models/mult.py
``_group_rates``).  Stacks with nonzero rates keep the XLA path (exact
dropout semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # finite fill keeps padded/fully-masked rows NaN-free


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                  l_ref, *, blk_q: int, blk_k: int, tk: int, causal: bool,
                  offset: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    if causal:
        # last key column this q block can see (exclusive): (qi+1)*blk_q-1+offset
        needed = ki * blk_k < (qi + 1) * blk_q - 1 + offset
    else:
        needed = ki >= 0

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [blk_q, blk_k]
        row_ids = qi * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 0)
        col_ids = ki * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1)
        mask = col_ids < tk  # key padding (Tk rounded up to blk_k)
        if causal:
            mask = jnp.logical_and(mask, col_ids - row_ids < offset)
        logits = jnp.where(mask, logits, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l_safe = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # log-sum-exp residual for the backward pass
        lse_ref[0, 0] = (m_ref[:, 0] + jnp.log(l_safe[:, 0]))


@functools.partial(jax.jit, static_argnames=("causal", "offset", "blk_q",
                                             "blk_k", "interpret"))
def _flash_fwd_impl(q, k, v, causal, offset, blk_q, blk_k, interpret):
    """Returns (out [B,H,Tq,D], lse [B*H, Tq_pad])."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    blk_q = min(blk_q, max(8, 1 << (tq - 1).bit_length()))
    blk_k = min(blk_k, max(128, 1 << (tk - 1).bit_length()))
    d_pad = _cdiv(d, 128) * 128
    tq_pad = _cdiv(tq, blk_q) * blk_q
    tk_pad = _cdiv(tk, blk_k) * blk_k
    n_k = tk_pad // blk_k

    def pad(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]),
                           (0, d_pad - d)))

    qp = pad(q, tq_pad).reshape(b * h, tq_pad, d_pad)
    kp = pad(k, tk_pad).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).reshape(b * h, tk_pad, d_pad)

    if causal:
        # clamp fully-masked k blocks to the last needed block: consecutive
        # identical indices make Pallas skip the DMA entirely
        def kv_index(i, qi, ki):
            last = ((qi + 1) * blk_q - 2 + offset) // blk_k
            return (i, jnp.minimum(ki, last), 0)
    else:
        def kv_index(i, qi, ki):
            return (i, ki, 0)

    grid = (b * h, tq_pad // blk_q, n_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, blk_q=blk_q, blk_k=blk_k, tk=tk,
                          causal=causal, offset=offset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d_pad), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d_pad), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d_pad), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d_pad), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            # lse layout [bh, 1, tq_pad]: keeps every block shape legal
            # under the TPU (8, 128) tiling rules for all blk_q values
            pl.BlockSpec((1, 1, blk_q), lambda i, qi, ki: (i, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, tq_pad), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d_pad), jnp.float32),   # acc
            pltpu.VMEM((blk_q, 128), jnp.float32),     # running max
            pltpu.VMEM((blk_q, 128), jnp.float32),     # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, offset, blk_q, blk_k, interpret):
    return _flash_fwd_impl(q, k, v, causal, offset, blk_q, blk_k, interpret)[0]


def _flash_vjp_fwd(q, k, v, causal, offset, blk_q, blk_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, causal, offset, blk_q, blk_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_vjp_bwd(causal, offset, blk_q, blk_k, interpret, res, do):
    from .attention_pallas_bwd import flash_attention_bwd

    q, k, v, out, lse = res
    return flash_attention_bwd(q, k, v, out, lse, do, causal, offset, blk_q,
                               blk_k, interpret)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray,             # [B, H, Tq, D] — PRE-SCALED
    k: jnp.ndarray,             # [B, H, Tk, D]
    v: jnp.ndarray,             # [B, H, Tk, D]
    causal: bool = True,
    offset: int | None = None,  # defaults to 1 + |Tk - Tq| (reference rule)
    blk_q: int = 256,
    blk_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention (custom VJP; see
    attention_pallas_bwd.py for the backward kernels)."""
    if offset is None:
        offset = 1 + abs(k.shape[2] - q.shape[2])
    return _flash(q, k, v, causal, offset, blk_q, blk_k, interpret)
