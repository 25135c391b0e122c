"""Fused GRU recurrence — Pallas TPU kernel with custom VJP.

The reference's projection headers run torch ``nn.GRU`` scans
(src/dynamic_models2.py:23-39 RNN_Header); in the TPU rebuild the
recurrence's backward pass dominates the train step (BENCH_NOTES.md train
anatomy), because an ``lax.scan`` stores every per-step gate tensor to HBM
for autodiff and pays while-loop overhead per step.

This kernel runs the WHOLE recurrence (all T steps) in one ``pallas_call``:

  * grid ``(G, N-blocks, T/KT)`` with time innermost — the hidden state
    lives in a VMEM scratch buffer across time steps, never touching HBM;
  * each grid step processes ``KT`` consecutive timesteps from one resident
    block (statically unrolled), amortizing per-step grid/DMA overhead;
  * ``G`` batches independent recurrences with *different weights* (the two
    directions of a bidirectional GRU, and every same-length header in a
    group) into ONE kernel launch;
  * gates are pre-split into three ``[G, T, N, H]`` arrays (r, z, n) so all
    in-kernel tensors are clean ``[Nblk, H]`` tiles — no unaligned lane
    slicing of a packed ``[·, 3H]`` layout;
  * the backward kernel RECOMPUTES r/z/n from ``h_{t-1}`` (three extra
    [N,H]x[H,H] matmuls) instead of loading stored gates — trading cheap
    MXU FLOPs for the HBM round-trips that dominate at these sizes.  It
    emits per-step gate gradients; the weight-gradient reduction
    ``dW = Σ_t h_{t-1}^T dgh_t`` is ONE big XLA einsum outside the kernel
    (MXU-shaped, fusable), not an in-kernel accumulation.

Measured on TPU v5e (G=4, T=50, H=100 — the MOSEI header recurrence):
fwd+bwd 3.6x over the lax.scan path at N=256 (see BENCH_NOTES.md).

Gate math matches torch exactly (see ops/gru.py):
    r = σ(gi_r + h W_hr^T + b_hr)         gh_x := h W_hx^T + b_hx
    z = σ(gi_z + gh_z)
    n = tanh(gi_n + r * gh_n)
    h' = (1-z) n + z h
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_kt(t: int, cap: int = 8) -> int:
    # largest divisor of T in [1, cap]: timesteps per grid block (static
    # unroll).  A divisor keeps time blocks exact — padding the time axis
    # would corrupt the recurrence (a zero-gi step still updates h).
    for k in range(min(cap, t), 1, -1):
        if t % k == 0:
            return k
    return 1


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB scoped limit


def _pick_blocks(t: int, n: int, h: int, n_bufs: int, itemsize: int = 4):
    """(kt, nblk) such that the pipeline's resident block buffers
    (``n_bufs`` arrays, double-buffered) fit the VMEM budget.  Without this
    cap, large-batch configs blow the 16 MB scoped-vmem limit at compile
    time (seen at [2, 32, 1024, 100] f32)."""
    kt = _pick_kt(t)
    nblk = min(512, max(8, -(-n // 8) * 8))

    def cost(kt_, nblk_):
        return kt_ * nblk_ * h * itemsize * n_bufs * 2

    while cost(kt, nblk) > _VMEM_BUDGET and nblk > 8:
        nblk = max(8, (nblk // 2 + 7) // 8 * 8)
    while cost(kt, nblk) > _VMEM_BUDGET and kt > 1:
        kt = _pick_kt(t, kt - 1)
    return kt, nblk


def _gates_f32(gi_r, gi_z, gi_n, h, wr, wz, wn, br, bz, bn):
    f32 = jnp.float32
    gh_r = jnp.dot(h, wr, preferred_element_type=f32) + br
    gh_z = jnp.dot(h, wz, preferred_element_type=f32) + bz
    gh_n = jnp.dot(h, wn, preferred_element_type=f32) + bn
    r = jax.nn.sigmoid(gi_r.astype(f32) + gh_r)
    z = jax.nn.sigmoid(gi_z.astype(f32) + gh_z)
    n = jnp.tanh(gi_n.astype(f32) + r * gh_n)
    return r, z, n, gh_n


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn, o_ref, h_ref,
                *, kt: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    for k in range(kt):  # static unroll over the resident time block
        r, z, n, _ = _gates_f32(gi_r[0, k], gi_z[0, k], gi_n[0, k], h,
                                wr[0], wz[0], wn[0], br[0], bz[0], bn[0])
        h = (1.0 - z) * n + z * h
        o_ref[0, k] = h.astype(o_ref.dtype)
    h_ref[:] = h


def _recurrence_fwd_impl(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                         *, interpret: bool = False) -> jnp.ndarray:
    g, t, n, h = gi_r.shape
    # 3 gi inputs + 1 output resident per pipeline stage
    kt, nblk = _pick_blocks(t, n, h, n_bufs=4, itemsize=gi_r.dtype.itemsize)
    grid = (g, _cdiv(n, nblk), t // kt)

    gi_spec = pl.BlockSpec((1, kt, nblk, h), lambda gg, bb, tt: (gg, tt, bb, 0))
    w_spec = pl.BlockSpec((1, h, h), lambda gg, bb, tt: (gg, 0, 0))
    # biases ride as [G, 1, H] so the trailing block dims match the array
    b_spec = pl.BlockSpec((1, 1, h), lambda gg, bb, tt: (gg, 0, 0))
    br, bz, bn = (a[:, None, :] for a in (br, bz, bn))

    return pl.pallas_call(
        functools.partial(_fwd_kernel, kt=kt),
        grid=grid,
        in_specs=[gi_spec, gi_spec, gi_spec, w_spec, w_spec, w_spec,
                  b_spec, b_spec, b_spec],
        out_specs=pl.BlockSpec((1, kt, nblk, h), lambda gg, bb, tt: (gg, tt, bb, 0)),
        out_shape=jax.ShapeDtypeStruct((g, t, n, h), gi_r.dtype),
        scratch_shapes=[pltpu.VMEM((nblk, h), jnp.float32)],
        interpret=interpret,
    )(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(gi_r, gi_z, gi_n, hs, hs_left, dhs, wr, wz, wn, br, bz, bn,
                dar_ref, daz_ref, dan_ref, dghn_ref, dh_ref, *, kt: int):
    ti = pl.program_id(2)
    nbt = pl.num_programs(2)

    @pl.when(ti == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    f32 = jnp.float32
    # h before this block's first step: last row of the left-neighbor block
    # (the index map clamps at block 0 — mask it to zeros there)
    first_block = (ti == nbt - 1)  # reversed time order
    h_left = hs_left[0, kt - 1].astype(f32) * (1.0 - first_block.astype(f32))

    dh = dh_ref[:]
    for k in reversed(range(kt)):  # static unroll, newest step first
        h_prev = hs[0, k - 1].astype(f32) if k > 0 else h_left
        r, z, n, gh_n = _gates_f32(gi_r[0, k], gi_z[0, k], gi_n[0, k], h_prev,
                                   wr[0], wz[0], wn[0], br[0], bz[0], bn[0])
        dh_total = dhs[0, k].astype(f32) + dh
        dz = dh_total * (h_prev - n)
        dn = dh_total * (1.0 - z)
        da_n = dn * (1.0 - n * n)
        dghn = da_n * r
        dr = da_n * gh_n
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)

        contract = (((1,), (1,)), ((), ()))  # d/dh of (h @ w): grad @ w^T
        dh = (dh_total * z
              + jax.lax.dot_general(da_r, wr[0], contract,
                                    preferred_element_type=f32)
              + jax.lax.dot_general(da_z, wz[0], contract,
                                    preferred_element_type=f32)
              + jax.lax.dot_general(dghn, wn[0], contract,
                                    preferred_element_type=f32))

        dar_ref[0, k] = da_r.astype(dar_ref.dtype)
        daz_ref[0, k] = da_z.astype(daz_ref.dtype)
        dan_ref[0, k] = da_n.astype(dan_ref.dtype)
        dghn_ref[0, k] = dghn.astype(dghn_ref.dtype)
    dh_ref[:] = dh


def _recurrence_bwd_impl(gi_r, gi_z, gi_n, hs, dhs, wr, wz, wn, br, bz, bn,
                         *, interpret: bool = False):
    g, t, n, h = gi_r.shape
    # 6 inputs (3 gi, hs, hs_left, dhs) + 4 outputs resident per stage
    kt, nblk = _pick_blocks(t, n, h, n_bufs=10, itemsize=gi_r.dtype.itemsize)
    nbt = t // kt
    grid = (g, _cdiv(n, nblk), nbt)

    def rev(gg, bb, tt):
        return (gg, nbt - 1 - tt, bb, 0)

    def rev_left(gg, bb, tt):  # left-neighbor time block, clamped at 0
        return (gg, jnp.maximum(nbt - 1 - tt - 1, 0), bb, 0)

    gi_spec = pl.BlockSpec((1, kt, nblk, h), rev)
    w_spec = pl.BlockSpec((1, h, h), lambda gg, bb, tt: (gg, 0, 0))
    b_spec = pl.BlockSpec((1, 1, h), lambda gg, bb, tt: (gg, 0, 0))
    br, bz, bn = (a[:, None, :] for a in (br, bz, bn))
    out_sd = jax.ShapeDtypeStruct((g, t, n, h), gi_r.dtype)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, kt=kt),
        grid=grid,
        in_specs=[gi_spec, gi_spec, gi_spec, gi_spec,
                  pl.BlockSpec((1, kt, nblk, h), rev_left), gi_spec,
                  w_spec, w_spec, w_spec, b_spec, b_spec, b_spec],
        out_specs=[gi_spec] * 4,
        out_shape=[out_sd] * 4,
        scratch_shapes=[pltpu.VMEM((nblk, h), jnp.float32)],
        interpret=interpret,
    )(gi_r, gi_z, gi_n, hs, hs, dhs, wr, wz, wn, br, bz, bn)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def gru_recurrence_pallas(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                          interpret: bool = False) -> jnp.ndarray:
    """All-timestep GRU recurrence.

    Args: per-gate input projections ``gi_{r,z,n} [G, T, N, H]`` (already
    ``x W_ix^T + b_ix``), transposed recurrent weights ``w{r,z,n} [G, H, H]``
    (``W_hx^T``), recurrent biases ``b{r,z,n} [G, H]``.
    Returns hidden states ``[G, T, N, H]`` (h0 = 0).
    """
    return _recurrence_fwd_impl(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                                interpret=interpret)


def _vjp_fwd(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn, interpret=False):
    hs = _recurrence_fwd_impl(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                              interpret=interpret)
    return hs, (gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn, hs)


def _vjp_bwd(interpret, res, dhs):
    gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn, hs = res
    da_r, da_z, da_n, dghn = _recurrence_bwd_impl(
        gi_r, gi_z, gi_n, hs, dhs, wr, wz, wn, br, bz, bn,
        interpret=interpret)
    # dW^T[g] = Σ_{t>=1} h_{t-1}^T dgh_t  (t=0 has h_prev = 0);
    # one MXU-shaped einsum per gate, fused by XLA
    f32 = jnp.float32
    hsl = hs[:, :-1]
    dwr = jnp.einsum("gtnh,gtnk->ghk", hsl, da_r[:, 1:],
                     preferred_element_type=f32)
    dwz = jnp.einsum("gtnh,gtnk->ghk", hsl, da_z[:, 1:],
                     preferred_element_type=f32)
    dwn = jnp.einsum("gtnh,gtnk->ghk", hsl, dghn[:, 1:],
                     preferred_element_type=f32)
    dbr = jnp.sum(da_r.astype(f32), axis=(1, 2))
    dbz = jnp.sum(da_z.astype(f32), axis=(1, 2))
    dbn = jnp.sum(dghn.astype(f32), axis=(1, 2))
    return (da_r, da_z, da_n,
            dwr.astype(wr.dtype), dwz.astype(wz.dtype), dwn.astype(wn.dtype),
            dbr.astype(br.dtype), dbz.astype(bz.dtype), dbn.astype(bn.dtype))


gru_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)
