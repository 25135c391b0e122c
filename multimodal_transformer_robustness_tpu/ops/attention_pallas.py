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
blockwise softmax from the saved log-sum-exp, so training can run through
the kernel.

In-softmax DROPOUT (the reference applies ``F.dropout`` to the softmax
weights, modules/dynamic_multihead_attention.py:111) is fused into the
kernel: the keep/drop decision for attention weight (row, col) is a pure
counter-based hash of ``(per-(batch·head) seed, global row, global col)``
(murmur3 finalizer — `_dropout_uniform`), so
  * the forward and BOTH backward kernels regenerate bit-identical masks
    with no [Tq, Tk] mask tensor in HBM and no cross-kernel state;
  * the mask is independent of the block decomposition (global positions),
    so any blk_q/blk_k pairing of fwd and bwd agrees;
  * the softmax NORMALIZER stays dropout-free (torch drops AFTER the
    softmax): ``l`` accumulates raw ``p``; only the value accumulation sees
    ``keep * p / (1 - rate)``.
The flash ``delta = rowsum(dO · O)`` backward identity survives dropout
unchanged: with ``A = M∘P`` (M the inverted-dropout mask), ``Σ_k P∘dP =
Σ_k A∘(dO Vᵀ) = dO·O`` row-wise, so ``dS = P ∘ (M∘(dO Vᵀ) − delta)``.
Draw realizations differ from the XLA path's ``jax.random.bernoulli`` (as
torch's differ from both) — the distribution, not the stream, is the
contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas_bwd import flash_block_geometry

NEG_INF = -1e30  # finite fill keeps padded/fully-masked rows NaN-free


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _i32(c: int) -> jnp.int32:
    """int32 literal from a uint32 bit pattern (two's complement wrap)."""
    return jnp.int32(c - (1 << 32) if c >= (1 << 31) else c)


def _hash_uniform(seed, rows, cols):
    """Counter-based uniform in [0, 1): murmur3 fmix32 of
    ``seed ^ row·P1 ^ col·P2``.  Plain int32 jnp ops (wraparound multiply +
    logical shifts) so the SAME function runs inside Pallas kernels, in
    interpret mode on CPU, and as a dense XLA computation (the test oracle).
    ``seed``: int32 scalar; ``rows``/``cols``: int32 arrays (global
    positions) — the result is independent of any block decomposition."""
    sr = jax.lax.shift_right_logical
    h = (rows * _i32(0x9E3779B1)) ^ (cols * _i32(0x85EBCA77)) ^ seed
    h = h ^ sr(h, 16)
    h = h * _i32(0x85EBCA6B)
    h = h ^ sr(h, 13)
    h = h * _i32(0xC2B2AE35)
    h = h ^ sr(h, 16)
    # top-24 logical bits -> exact f32 in [0, 1)
    return sr(h, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def dropout_uniform(seed, tq: int, tk: int) -> jnp.ndarray:
    """Dense [tq, tk] uniform field for one (batch·head) slice — the test
    oracle / dense-reference view of the in-kernel draws."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return _hash_uniform(jnp.asarray(seed, jnp.int32), rows, cols)


def _block_uniform(seed, qi, ki, blk_q: int, blk_k: int) -> jnp.ndarray:
    rows = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    cols = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
    return _hash_uniform(seed, rows, cols)


def _flash_init(acc_ref, m_ref, l_ref):
    """k-block 0: reset the running (accumulator, max, normalizer) scratch.
    Shared by the causal and key-padding-mask kernels so the recurrence
    can never diverge between them."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)


def _flash_step(logits, v, acc_ref, m_ref, l_ref, p_scale=None):
    """One k-block of the flash recurrence: already-masked logits ->
    running (max, normalizer, accumulator) update.  ``p_scale`` optionally
    transforms the post-softmax weights for the VALUE accumulation only
    (the in-softmax dropout path); the normalizer always accumulates raw
    ``p`` (torch drops AFTER the softmax)."""
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :1] = m_new
    p_v = p if p_scale is None else p_scale(p)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p_v, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _flash_l_safe(l_ref):
    """Final normalizer, floored so fully-masked/padded rows divide by a
    positive number instead of producing NaN (they are sliced off)."""
    return jnp.maximum(l_ref[:, :1], 1e-30)


def _flash_kernel(*refs, blk_q: int, blk_k: int, tk: int, causal: bool,
                  offset: int, use_dropout: bool):
    if use_dropout:
        (q_ref, k_ref, v_ref, seed_ref, rate_ref, o_ref, lse_ref, acc_ref,
         m_ref, l_ref) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
        seed_ref = rate_ref = None
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        _flash_init(acc_ref, m_ref, l_ref)

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

        p_scale = None
        if use_dropout:
            rate = rate_ref[0, 0, 0]
            u = _block_uniform(seed_ref[0, 0, 0], qi, ki, blk_q, blk_k)
            # scale inside the where: rate == 1 yields zeros, not 0·inf NaNs
            # (matches ops/dropout.py)
            p_scale = lambda p: jnp.where(u >= rate, p / (1.0 - rate), 0.0)
        _flash_step(logits, v, acc_ref, m_ref, l_ref, p_scale)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l_safe = _flash_l_safe(l_ref)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # log-sum-exp residual for the backward pass
        lse_ref[0, 0] = (m_ref[:, 0] + jnp.log(l_safe[:, 0]))


@functools.partial(jax.jit, static_argnames=("causal", "offset", "blk_q",
                                             "blk_k", "use_dropout",
                                             "interpret"))
def _flash_fwd_impl(q, k, v, seeds, rates, causal, offset, blk_q, blk_k,
                    use_dropout, interpret):
    """Returns (out [B,H,Tq,D], lse [B*H, Tq_pad]).  ``seeds``/``rates``:
    per-(batch·head) [B*H] int32 / float32 dropout streams (ignored unless
    ``use_dropout``)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    blk_q, blk_k, d_pad, tq_pad, tk_pad = flash_block_geometry(
        tq, tk, d, blk_q, blk_k)
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

    in_specs = [
        pl.BlockSpec((1, blk_q, d_pad), lambda i, qi, ki: (i, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d_pad), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d_pad), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]
    if use_dropout:
        # [bh, 1, 1] with (1, 1, 1) blocks: the trailing dims equal the
        # array dims, satisfying the TPU (8, 128) block-tiling rule
        scalar_spec = pl.BlockSpec((1, 1, 1), lambda i, qi, ki: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        in_specs += [scalar_spec, scalar_spec]
        operands += [seeds.reshape(b * h, 1, 1).astype(jnp.int32),
                     rates.reshape(b * h, 1, 1).astype(jnp.float32)]

    grid = (b * h, tq_pad // blk_q, n_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, blk_q=blk_q, blk_k=blk_k, tk=tk,
                          causal=causal, offset=offset,
                          use_dropout=use_dropout),
        grid=grid,
        in_specs=in_specs,
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
    )(*operands)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, seeds, rates, causal, offset, blk_q, blk_k, use_dropout,
           interpret):
    return _flash_fwd_impl(q, k, v, seeds, rates, causal, offset, blk_q,
                           blk_k, use_dropout, interpret)[0]


def _flash_vjp_fwd(q, k, v, seeds, rates, causal, offset, blk_q, blk_k,
                   use_dropout, interpret):
    out, lse = _flash_fwd_impl(q, k, v, seeds, rates, causal, offset, blk_q,
                               blk_k, use_dropout, interpret)
    return out, (q, k, v, seeds, rates, out, lse)


def _flash_vjp_bwd(causal, offset, blk_q, blk_k, use_dropout, interpret,
                   res, do):
    import numpy as np

    from .attention_pallas_bwd import flash_attention_bwd

    q, k, v, seeds, rates, out, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, seeds, rates, out, lse, do,
                                     causal, offset, blk_q, blk_k,
                                     use_dropout, interpret)
    # int32 seeds carry float0 tangents; rates are non-differentiable inputs
    return dq, dk, dv, np.zeros(seeds.shape, jax.dtypes.float0), \
        jnp.zeros_like(rates)


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
    dropout_seeds: jnp.ndarray | None = None,  # [B*H] int32
    dropout_rates: jnp.ndarray | None = None,  # [B*H] f32 (may be traced)
) -> jnp.ndarray:
    """Differentiable fused attention (custom VJP; see
    attention_pallas_bwd.py for the backward kernels).  Pass
    ``dropout_seeds`` + ``dropout_rates`` to enable fused in-softmax
    dropout (torch ``F.dropout``-after-softmax semantics; see module
    docstring)."""
    if offset is None:
        offset = 1 + abs(k.shape[2] - q.shape[2])
    # the causal DMA index maps clamp block indices assuming the reference's
    # offset rule (>= 1); a large negative offset would emit out-of-range
    # k/v block indices (unspecified out-of-bounds DMA) — reject it
    assert not causal or offset >= 1, (
        f"causal flash_attention requires offset >= 1 (got {offset}); the "
        f"reference mask rule is offset = 1 + |Tk - Tq|")
    use_dropout = dropout_seeds is not None
    if use_dropout:
        assert dropout_rates is not None
        seeds, rates = dropout_seeds, dropout_rates
    else:
        bh = q.shape[0] * q.shape[1]
        seeds = jnp.zeros((bh,), jnp.int32)
        rates = jnp.zeros((bh,), jnp.float32)
    return _flash(q, k, v, seeds, rates, causal, offset, blk_q, blk_k,
                  use_dropout, interpret)


# ---------------------------------------------------------------------------
# Forward-only variant with a per-sample key-padding mask — serves the
# FROZEN text BERT (models/bert.py), whose attention takes the HuggingFace
# additive bias ``(1 - mask) * -10000`` (reference src/models2.py BertModel
# via transformers; our bert_apply:199-200).  No causal rule, no dropout
# (the BERT runs eval-mode) and no VJP (frozen params + integer data inputs
# mean autodiff never traverses it).
# ---------------------------------------------------------------------------


def _flash_kpm_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                      acc_ref, m_ref, l_ref, *, blk_q: int, blk_k: int,
                      tk: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        _flash_init(acc_ref, m_ref, l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [blk_q, blk_k]
    col_ids = ki * blk_k + jax.lax.broadcasted_iota(
        jnp.int32, (blk_q, blk_k), 1)
    # per-sample key mask ([1, blk_k], 1 = attend) AND the Tk round-up pad
    valid = jnp.logical_and(mask_ref[0] > 0, col_ids < tk)
    logits = jnp.where(valid, logits, NEG_INF)

    _flash_step(logits, v, acc_ref, m_ref, l_ref)

    @pl.when(ki == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / _flash_l_safe(l_ref)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention_masked(
    q: jnp.ndarray,         # [B, H, Tq, D] — PRE-SCALED
    k: jnp.ndarray,         # [B, H, Tk, D]
    v: jnp.ndarray,         # [B, H, Tk, D]
    key_mask: jnp.ndarray,  # [B, Tk] int, 1 = attend (HF attention_mask)
    blk_q: int = 256,
    blk_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention with HuggingFace key-padding-mask semantics.

    Equivalence to the additive-bias path ``softmax(logits + (1-mask)
    * -10000)`` it replaces:

    * a partially masked column's weight is ``exp(x)`` with ``x < -9000``
      after the max shift — that underflows to exactly ``0.0`` in f32, the
      same value the hard ``NEG_INF`` mask produces;
    * an ALL-zero mask row shifts every logit by the same -10000, which
      softmax cancels — so it is rewritten to all-ones here (the zero-fill
      missing-text eval hits this; train/loop.py zero-fills the wordpiece
      mask).  The additive path pays one rounding of ``logit - 10000``
      (~1e-4 relative) that this kernel does not, so all-masked rows are
      equal only to ~1e-4 — the kernel is the more precise of the two.

    Softmax statistics and the p @ V accumulation run in f32 (the XLA path
    casts the softmax output to bf16 before the V dot under the bf16
    compute policy, so outputs agree to bf16 rounding there; under f32 the
    streaming softmax's summation order leaves ~1e-5 formulation noise —
    tests/test_flash_kpm.py).

    MEASURED at BERT shapes (variants bench `flash_attn` cell,
    2026-08-18): B=1024 L=32 52.7 ms vs 27.2 ms XLA; B=128 L=256 28.6 vs
    20.2 — the 64 -> 128 head-dim padding and per-(b,h) program overhead
    drown the fusion win at BERT dims (unlike the trunk shapes, where the
    flash formulation wins at T >= 512).  bert_apply therefore defaults to
    the XLA path (models/bert.ATTN_IMPL); this kernel's value there is the
    O(T) memory footprint for very long text, not speed.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]

    blk_q, blk_k, d_pad, tq_pad, tk_pad = flash_block_geometry(
        tq, tk, d, blk_q, blk_k)
    n_k = tk_pad // blk_k

    def pad(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]),
                           (0, d_pad - d)))

    qp = pad(q, tq_pad).reshape(b * h, tq_pad, d_pad)
    kp = pad(k, tk_pad).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).reshape(b * h, tk_pad, d_pad)

    key_mask = key_mask.astype(jnp.int32)
    # all-zero mask row == uniform -10000 bias == no bias (softmax shift
    # invariance); rewrite so the hard mask can't zero the denominator
    any_key = (jnp.sum(key_mask, axis=1, keepdims=True) > 0)
    mask_eff = jnp.where(any_key, key_mask, jnp.ones_like(key_mask))
    mask_eff = jnp.pad(mask_eff, ((0, 0), (0, tk_pad - tk)))
    # [B, 1, Tk_pad]: Mosaic requires the block's last-two dims to divide
    # (8, 128) or EQUAL the array dims — a 2-D mask with a (1, blk_k)
    # block fails that check on hardware (interpret mode doesn't enforce
    # it), so carry an explicit singleton row axis the block matches
    mask_eff = mask_eff[:, None, :]

    grid = (b * h, tq_pad // blk_q, n_k)
    out = pl.pallas_call(
        functools.partial(_flash_kpm_kernel, blk_q=blk_q, blk_k=blk_k,
                          tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d_pad), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d_pad), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d_pad), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            # one mask row per sample, shared across that sample's heads
            pl.BlockSpec((1, 1, blk_k),
                         lambda i, qi, ki, h=h: (i // h, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d_pad),
                               lambda i, qi, ki: (i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d_pad), jnp.float32),   # acc
            pltpu.VMEM((blk_q, 128), jnp.float32),     # running max
            pltpu.VMEM((blk_q, 128), jnp.float32),     # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, mask_eff)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
