"""Backward pass for the fused Pallas flash attention (custom VJP).

Standard flash backward with blockwise recomputation from the forward's
log-sum-exp: ``p = exp(s - lse)``, ``dV += p^T dO``, ``dP = dO V^T``,
``dS = p (dP - delta)`` with ``delta = rowsum(dO * O)``, ``dQ += dS K``,
``dK += dS^T Q``.  Two kernels: dq iterates key blocks per query block;
dk/dv iterates query blocks per key block.  The reference future-mask rule
(col - row >= offset masks) is regenerated in-kernel; fully-masked blocks
skip compute via ``@pl.when`` and collapse their DMAs via index-map clamping.

With fused in-softmax dropout (see attention_pallas.py docstring), the
inverted-dropout mask ``M`` is REGENERATED from the same position-based hash
(global row/col + per-(batch·head) seed — blocking-invariant, so the fwd and
both bwd kernels agree bit-exactly), and the chain rule becomes:
``dV += (M∘p)^T dO``, ``dP = M ∘ (dO V^T)``, ``dS = p (dP - delta)`` — the
``delta = rowsum(dO·O)`` identity is unchanged because
``Σ_k P∘dP = Σ_k (M∘P)∘(dO Vᵀ) = dO·O`` row-wise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def flash_block_geometry(tq: int, tk: int, d: int, blk_q: int, blk_k: int):
    """Clamped block sizes and padded extents: ``(blk_q, blk_k, d_pad,
    tq_pad, tk_pad)``.  ONE definition shared by the forward, the
    key-padding-mask forward and the backward kernels (attention_pallas.py
    imports it from here — this module is the import leaf): the backward
    re-slices the forward's lse with this geometry and regenerates the
    in-softmax dropout mask at the same block coordinates, so a divergent
    clamp or pad rule between the two files would silently corrupt
    gradients."""
    blk_q = min(blk_q, max(8, 1 << (tq - 1).bit_length()))
    blk_k = min(blk_k, max(128, 1 << (tk - 1).bit_length()))
    d_pad = _cdiv(d, 128) * 128
    tq_pad = _cdiv(tq, blk_q) * blk_q
    tk_pad = _cdiv(tk, blk_k) * blk_k
    return blk_q, blk_k, d_pad, tq_pad, tk_pad


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _masked_p(q, k_blk, lse_col, qi, ki, blk_q, blk_k, tq, tk, causal, offset):
    """Recompute the probability block with masking; exponent is computed
    only where the mask holds (padded-q rows included in the mask so no
    inf*0 NaNs can leak into the accumulators)."""
    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    row_ids = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    col_ids = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
    mask = jnp.logical_and(col_ids < tk, row_ids < tq)
    if causal:
        mask = jnp.logical_and(mask, col_ids - row_ids < offset)
    return jnp.exp(jnp.where(mask, s - lse_col, NEG_INF))


def _inv_dropout_mask(seed_ref, rate_ref, qi, ki, blk_q, blk_k):
    """Regenerate the forward's inverted-dropout mask M (keep/(1-rate))."""
    from .attention_pallas import _block_uniform

    rate = rate_ref[0, 0, 0]
    u = _block_uniform(seed_ref[0, 0, 0], qi, ki, blk_q, blk_k)
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _dq_kernel(*refs, blk_q, blk_k, tq, tk, causal, offset, use_dropout):
    if use_dropout:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref, rate_ref,
         dq_ref, acc_ref) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref = refs
        seed_ref = rate_ref = None
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    needed = ki * blk_k < (qi + 1) * blk_q - 1 + offset if causal else ki >= 0

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse_col = lse_ref[0, 0][:, None]
        p = _masked_p(q, k, lse_col, qi, ki, blk_q, blk_k, tq, tk, causal,
                      offset)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        if use_dropout:
            dp = dp * _inv_dropout_mask(seed_ref, rate_ref, qi, ki,
                                        blk_q, blk_k)
        ds = p * (dp - delta_ref[0, 0][:, None])
        acc_ref[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(*refs, blk_q, blk_k, tq, tk, causal, offset, use_dropout):
    if use_dropout:
        (k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, seed_ref, rate_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        seed_ref = rate_ref = None
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # this q block contributes iff its LAST row can see the k block's first
    # column: (qi+1)*blk_q - 1 + offset > ki*blk_k
    needed = (qi + 1) * blk_q - 1 + offset > ki * blk_k if causal else qi >= 0

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse_col = lse_ref[0, 0][:, None]
        p = _masked_p(q, k, lse_col, qi, ki, blk_q, blk_k, tq, tk, causal,
                      offset)
        p_v = p
        if use_dropout:
            m = _inv_dropout_mask(seed_ref, rate_ref, qi, ki, blk_q, blk_k)
            p_v = p * m
        dv_acc[:] += jax.lax.dot_general(
            p_v, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        if use_dropout:
            dp = dp * m
        ds = p * (dp - delta_ref[0, 0][:, None])
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "offset", "blk_q",
                                             "blk_k", "use_dropout",
                                             "interpret"))
def flash_attention_bwd(q, k, v, seeds, rates, out, lse, do, causal, offset,
                        blk_q, blk_k, use_dropout, interpret):
    """Returns (dq, dk, dv).  q is the PRE-SCALED query (as in the forward);
    lse is [B, H, Tq_pad] from the forward; seeds/rates are the forward's
    per-(batch·head) dropout streams (ignored unless ``use_dropout``)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    blk_q, blk_k, d_pad, tq_pad, tk_pad = flash_block_geometry(
        tq, tk, d, blk_q, blk_k)
    n_q = tq_pad // blk_q
    n_k = tk_pad // blk_k

    def pad(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]),
                           (0, d_pad - x.shape[3])))

    qp = pad(q, tq_pad).reshape(b * h, tq_pad, d_pad)
    kp = pad(k, tk_pad).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).reshape(b * h, tk_pad, d_pad)
    dop = pad(do, tq_pad).reshape(b * h, tq_pad, d_pad)
    # delta = rowsum(dO * O) — cheap elementwise+reduce, done in XLA
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, tq_pad - tq))
                    ).reshape(b * h, 1, tq_pad)
    lse = lse.reshape(b * h, 1, -1)[:, :, :tq_pad]

    q_spec_q = pl.BlockSpec((1, blk_q, d_pad), lambda i, qi, ki: (i, qi, 0),
                            memory_space=pltpu.VMEM)
    row_spec_q = pl.BlockSpec((1, 1, blk_q), lambda i, qi, ki: (i, 0, qi),
                              memory_space=pltpu.VMEM)
    if causal:
        def kv_index(i, qi, ki):
            last = ((qi + 1) * blk_q - 2 + offset) // blk_k
            return (i, jnp.minimum(ki, last), 0)
    else:
        def kv_index(i, qi, ki):
            return (i, ki, 0)

    dq_in_specs = [q_spec_q,
                   pl.BlockSpec((1, blk_k, d_pad), kv_index,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, blk_k, d_pad), kv_index,
                                memory_space=pltpu.VMEM),
                   q_spec_q, row_spec_q, row_spec_q]
    dq_operands = [qp, kp, vp, dop, lse, delta]
    if use_dropout:
        # [bh, 1, 1]/(1,1,1): trailing dims equal the array dims (legal
        # under the TPU block-tiling rule); see attention_pallas.py
        scalar_spec = pl.BlockSpec((1, 1, 1), lambda i, qi, ki: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        dq_in_specs += [scalar_spec, scalar_spec]
        seeds2 = seeds.reshape(b * h, 1, 1).astype(jnp.int32)
        rates2 = rates.reshape(b * h, 1, 1).astype(jnp.float32)
        dq_operands += [seeds2, rates2]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, blk_q=blk_q, blk_k=blk_k, tq=tq, tk=tk,
                          causal=causal, offset=offset,
                          use_dropout=use_dropout),
        grid=(b * h, n_q, n_k),
        in_specs=dq_in_specs,
        out_specs=q_spec_q,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*dq_operands)

    kv_spec = pl.BlockSpec((1, blk_k, d_pad), lambda i, ki, qi: (i, ki, 0),
                           memory_space=pltpu.VMEM)
    if causal:
        # clamp not-yet-needed q blocks (conservative: the exact @pl.when
        # guard decides compute; clamping only dedups DMA)
        def q_index(i, ki, qi):
            first = jnp.maximum(0, (ki * blk_k + 1 - offset) // blk_q - 1)
            return (i, jnp.maximum(qi, first), 0)

        def row_index(i, ki, qi):
            first = jnp.maximum(0, (ki * blk_k + 1 - offset) // blk_q - 1)
            return (i, 0, jnp.maximum(qi, first))
    else:
        def q_index(i, ki, qi):
            return (i, qi, 0)

        def row_index(i, ki, qi):
            return (i, 0, qi)

    dkv_in_specs = [kv_spec, kv_spec,
                    pl.BlockSpec((1, blk_q, d_pad), q_index,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, blk_q, d_pad), q_index,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, blk_q), row_index,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, blk_q), row_index,
                                 memory_space=pltpu.VMEM)]
    dkv_operands = [kp, vp, qp, dop, lse, delta]
    if use_dropout:
        scalar_spec_kv = pl.BlockSpec((1, 1, 1), lambda i, ki, qi: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
        dkv_in_specs += [scalar_spec_kv, scalar_spec_kv]
        dkv_operands += [seeds2, rates2]

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, blk_q=blk_q, blk_k=blk_k, tq=tq, tk=tk,
                          causal=causal, offset=offset,
                          use_dropout=use_dropout),
        grid=(b * h, n_k, n_q),
        in_specs=dkv_in_specs,
        out_specs=(kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((b * h, tk_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, tk_pad, d_pad), v.dtype)),
        scratch_shapes=[pltpu.VMEM((blk_k, d_pad), jnp.float32),
                        pltpu.VMEM((blk_k, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*dkv_operands)

    dq = dq.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
    dk = dk.reshape(b, h, tk_pad, d_pad)[:, :, :tk, :d]
    dv = dv.reshape(b, h, tk_pad, d_pad)[:, :, :tk, :d]
    return dq, dk, dv
