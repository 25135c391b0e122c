"""Fully-fused bidirectional-GRU level — input projection, recurrence and
(in the backward kernel) every gradient reduction inside Pallas.

Motivation (BENCH_NOTES step profile, 2026-08-17): with the original
recurrence-only kernel (gru_pallas.py), the XLA *glue* around it — the
per-direction gate-projection einsums and their bias adds, stacking the
packed ``[·, 3H]`` gates, splitting them per gate, transposing
``[B, T, ·]`` to the kernel's ``[T, N, H]`` layout, reversing the backward
direction's time axis, re-concatenating the outputs, and the backward-pass
mirrors of all of it — cost several ms/step at B=1024, more than the
recurrence itself.  This kernel removes the glue *and* the intermediate:

  * the input projection ``x W_ix^T`` happens INSIDE the kernel (one MXU
    matmul per gate over the resident ``[kt·nblk, in]`` time-block), so the
    ``[T, B, 3H]`` gate tensor never exists in HBM — forward HBM traffic is
    "read x, write h" and nothing else;
  * each direction is one ``pallas_call`` with a *static* time mapping
    (the backward direction's BlockSpecs index time-reversed blocks and the
    in-block step order flips), so no data reversal is ever materialized;
  * input biases fold into the recurrence update (``b_ix + b_hx`` for the
    sigmoid gates, ``b_in`` beside the projection, ``b_hn`` inside the
    ``r ·`` term) — no ``[B, T, 3H]`` bias pass;
  * the backward kernel recomputes the gates from ``h_{t-1}`` (gru_pallas'
    recompute-over-reload trade), derives the per-gate pre-activation
    gradients in registers, immediately contracts them: ``dx`` is written
    per block, and ``dW_ih`` / ``dW_hh`` / ``db`` ACCUMULATE across the
    whole grid in revisited output blocks — the per-step gradient tensors
    also never exist in HBM.

All block lane dimensions equal the full array dimension (``in`` or ``H``),
which satisfies the TPU lowering's tiling constraint for ANY hidden width —
no 128-padding, no unaligned slab reads.

Gate math matches torch exactly (see ops/gru.py):
    r = σ(x W_ir^T + (b_ir + b_hr) + h W_hr^T)
    z = σ(x W_iz^T + (b_iz + b_hz) + h W_hz^T)
    n = tanh(x W_in^T + b_in + r · (h W_hn^T + b_hn))
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
    # largest divisor of T in [1, cap] — a non-divisor would need a padded
    # time block, and a zero-input step still updates h
    for k in range(min(cap, t), 1, -1):
        if t % k == 0:
            return k
    return 1


_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_blocks(t: int, n: int, h: int, in_dim: int, itemsize: int,
                 big_bufs: int, small_bufs: int):
    """(kt, nblk) fitting the pipeline in VMEM: ``big_bufs`` double-buffered
    [kt, nblk, in] blocks (x-dtype) plus ``small_bufs`` [kt, nblk, h]-sized
    live values counted at f32 (the in-kernel gate/gradient register
    stacks dominate the H-sized footprint)."""
    kt = _pick_kt(t)
    nblk = min(512, max(8, _cdiv(n, 8) * 8))

    def cost(kt_, nblk_):
        return kt_ * nblk_ * (big_bufs * in_dim * itemsize * 2
                              + small_bufs * h * 4)

    while cost(kt, nblk) > _VMEM_BUDGET and nblk > 8:
        nblk = max(8, (nblk // 2 + 7) // 8 * 8)
    while cost(kt, nblk) > _VMEM_BUDGET and kt > 1:
        kt = _pick_kt(t, kt - 1)
    return kt, nblk


# ---------------------------------------------------------------------------
# forward (one direction)
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, wp, wt, bc, bhn, o_ref, h_ref, *, kt: int,
                reverse: bool):
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    f32 = jnp.float32
    xb = x_ref[:]                                     # (kt, nblk, in)
    k_, n_, i_ = xb.shape
    xf = xb.reshape(k_ * n_, i_)
    # all-timestep input projections for the resident block: 3 MXU matmuls
    gr = jnp.dot(xf, wp[0], preferred_element_type=f32).reshape(k_, n_, -1)
    gz = jnp.dot(xf, wp[1], preferred_element_type=f32).reshape(k_, n_, -1)
    gn = jnp.dot(xf, wp[2], preferred_element_type=f32).reshape(k_, n_, -1)

    h = h_ref[:]
    order = reversed(range(kt)) if reverse else range(kt)
    for k in order:  # static unroll; the block's storage rows, in
        #              this direction's processing order
        # recurrent dots run in the weight dtype (bf16 in production: an
        # f32 h against bf16 wt would promote to an f32 MXU matmul, ~4x
        # slower; the scan path's carry is bf16 there too) — f32 scratch
        # keeps the h accumulation itself full-precision
        hm = h.astype(wt.dtype)
        r = jax.nn.sigmoid(
            gr[k] + bc[0] + jnp.dot(hm, wt[0], preferred_element_type=f32))
        z = jax.nn.sigmoid(
            gz[k] + bc[1] + jnp.dot(hm, wt[1], preferred_element_type=f32))
        n = jnp.tanh(
            gn[k] + bc[2]
            + r * (jnp.dot(hm, wt[2], preferred_element_type=f32) + bhn[:]))
        h = (1.0 - z) * n + z * h
        o_ref[k] = h.astype(o_ref.dtype)
    h_ref[:] = h


def _fwd_impl(x, wp, wt, bc, bhn, *, reverse: bool, interpret: bool):
    t, n, in_dim = x.shape
    h = wt.shape[-1]
    kt, nblk = _pick_blocks(t, n, h, in_dim, x.dtype.itemsize,
                            big_bufs=1, small_bufs=5)
    nt = t // kt
    grid = (_cdiv(n, nblk), nt)

    def tmap(b, tt):
        return ((nt - 1 - tt) if reverse else tt, b, 0)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, kt=kt, reverse=reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, nblk, in_dim), tmap),
            pl.BlockSpec((3, in_dim, h), lambda b, tt: (0, 0, 0)),
            pl.BlockSpec((3, h, h), lambda b, tt: (0, 0, 0)),
            pl.BlockSpec((3, h), lambda b, tt: (0, 0)),
            pl.BlockSpec((h,), lambda b, tt: (0,)),
        ],
        out_specs=pl.BlockSpec((kt, nblk, h), tmap),
        out_shape=jax.ShapeDtypeStruct((t, n, h), x.dtype),
        scratch_shapes=[pltpu.VMEM((nblk, h), jnp.float32)],
        interpret=interpret,
    )(x, wp, wt, bc, bhn)


# ---------------------------------------------------------------------------
# backward (one direction)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, hs, hs_nbr, dhs, wp, wt, bc, bhn, *refs,
                kt: int, reverse: bool, n_rows: int, nblk: int,
                need_dx: bool):
    if need_dx:
        dx_ref, dwp_ref, dwt_ref, dbc_ref, dbhn_ref, dh_ref = refs
    else:
        # input-gradient output elided: the caller declared x's cotangent
        # structurally dead (see gru_dir_pallas docstring) — the dx dots
        # (projection-sized, the largest backward matmuls) and the [T, N, in]
        # HBM writes are skipped entirely
        dwp_ref, dwt_ref, dbc_ref, dbhn_ref, dh_ref = refs
    bb = pl.program_id(0)
    tt = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(tt == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when((bb == 0) & (tt == 0))
    def _():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dwt_ref[:] = jnp.zeros_like(dwt_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    f32 = jnp.float32
    mmt = x_ref.dtype  # matmul operand dtype: native (bf16 in production —
    #                    upcasting would force ~4x-slower f32 MXU matmuls
    #                    and desync the recomputed gates from the forward's,
    #                    which multiplies in bf16 too); accumulation stays
    #                    f32 via preferred_element_type
    xb = x_ref[:]
    k_, n_, i_ = xb.shape
    # padded batch rows must not poison the in-kernel dW/db reductions —
    # and they must be neutralized with where() at the SOURCE, not by
    # multiplying downstream (out-of-bounds block reads are unspecified
    # memory: a NaN there survives any ``· 0``)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_, 1), 0) + bb * nblk
    ok = rows < n_rows                                     # [nblk, 1] bool
    xf = jnp.where(ok[None], xb, jnp.zeros_like(xb)).reshape(k_ * n_, i_)
    gr = jnp.dot(xf, wp[0], preferred_element_type=f32).reshape(k_, n_, -1)
    gz = jnp.dot(xf, wp[1], preferred_element_type=f32).reshape(k_, n_, -1)
    gn = jnp.dot(xf, wp[2], preferred_element_type=f32).reshape(k_, n_, -1)

    # h before this block's earliest-processed step: the neighbor block's
    # edge row, zeroed at the sequence-start block (processed LAST by the
    # grad sweep: tt == nt-1 for both directions)
    start = tt == nt - 1
    edge = hs_nbr[0 if reverse else kt - 1]
    h_edge = jnp.where(jnp.logical_and(ok, jnp.logical_not(start)),
                       edge, jnp.zeros_like(edge))

    dh = dh_ref[:]
    das, dzs, dns, dghns, hprevs = [], [], [], [], []
    # grad sweep: this direction's steps, newest first
    order = range(kt) if reverse else reversed(range(kt))
    for k in order:
        later = (k + 1) if reverse else (k - 1)  # processing-previous step
        # native dtype: hs stores the forward's post-cast h, so bf16 dots
        # here recompute the forward's gates BIT-identically
        h_prev = (jnp.where(ok, hs[later], jnp.zeros_like(hs[later]))
                  if 0 <= later < kt else h_edge)
        r = jax.nn.sigmoid(
            gr[k] + bc[0] + jnp.dot(h_prev, wt[0], preferred_element_type=f32))
        z = jax.nn.sigmoid(
            gz[k] + bc[1] + jnp.dot(h_prev, wt[1], preferred_element_type=f32))
        gh_n = jnp.dot(h_prev, wt[2], preferred_element_type=f32) + bhn[:]
        n = jnp.tanh(gn[k] + bc[2] + r * gh_n)

        h_prev = h_prev.astype(f32)
        dh_total = jnp.where(ok, dhs[k].astype(f32), 0.0) + dh
        dz = dh_total * (h_prev - n)
        dn = dh_total * (1.0 - z)
        da_n = dn * (1.0 - n * n)
        dghn = da_n * r
        dr = da_n * gh_n
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)

        ct = (((1,), (1,)), ((), ()))  # grad @ W (W is already W^T)
        dh = (dh_total * z
              + jax.lax.dot_general(da_r.astype(mmt), wt[0], ct,
                                    preferred_element_type=f32)
              + jax.lax.dot_general(da_z.astype(mmt), wt[1], ct,
                                    preferred_element_type=f32)
              + jax.lax.dot_general(dghn.astype(mmt), wt[2], ct,
                                    preferred_element_type=f32))

        das.append(da_r.astype(mmt)); dzs.append(da_z.astype(mmt))
        dns.append(da_n.astype(mmt)); dghns.append(dghn.astype(mmt))
        hprevs.append(h_prev.astype(mmt))
    dh_ref[:] = dh

    if reverse:  # stacks below want storage order (k ascending)
        lists = [das, dzs, dns, dghns, hprevs]
    else:
        lists = [lst[::-1] for lst in [das, dzs, dns, dghns, hprevs]]
    da_r, da_z, da_n, dghn, h_prev = [
        jnp.stack(lst).reshape(k_ * n_, -1) for lst in lists]

    if need_dx:
        # dx for the block: three contractions against the projection weights
        ct_in = (((1,), (1,)), ((), ()))
        dx = (jax.lax.dot_general(da_r, wp[0], ct_in, preferred_element_type=f32)
              + jax.lax.dot_general(da_z, wp[1], ct_in, preferred_element_type=f32)
              + jax.lax.dot_general(da_n, wp[2], ct_in, preferred_element_type=f32))
        dx_ref[:] = dx.reshape(k_, n_, i_).astype(dx_ref.dtype)

    # weight/bias gradients accumulate across the whole grid (revisited
    # constant-index output blocks stay VMEM-resident between steps; the
    # accumulators are f32 regardless of operand dtype)
    ct_red = (((0,), (0,)), ((), ()))  # contract the kt·nblk rows
    dwp_ref[0] += jax.lax.dot_general(xf, da_r, ct_red, preferred_element_type=f32)
    dwp_ref[1] += jax.lax.dot_general(xf, da_z, ct_red, preferred_element_type=f32)
    dwp_ref[2] += jax.lax.dot_general(xf, da_n, ct_red, preferred_element_type=f32)
    dwt_ref[0] += jax.lax.dot_general(h_prev, da_r, ct_red, preferred_element_type=f32)
    dwt_ref[1] += jax.lax.dot_general(h_prev, da_z, ct_red, preferred_element_type=f32)
    dwt_ref[2] += jax.lax.dot_general(h_prev, dghn, ct_red, preferred_element_type=f32)
    dbc_ref[0] += jnp.sum(da_r.astype(f32), axis=0)
    dbc_ref[1] += jnp.sum(da_z.astype(f32), axis=0)
    dbc_ref[2] += jnp.sum(da_n.astype(f32), axis=0)
    dbhn_ref[:] += jnp.sum(dghn.astype(f32), axis=0)


def _bwd_impl(x, hs, dhs, wp, wt, bc, bhn, *, reverse: bool, interpret: bool,
              need_dx: bool = True):
    t, n, in_dim = x.shape
    h = wt.shape[-1]
    # big: x, dx; small: hs, hs_nbr, dhs (+ per-step register stacks)
    kt, nblk = _pick_blocks(t, n, h, in_dim, x.dtype.itemsize,
                            big_bufs=2 if need_dx else 1, small_bufs=14)
    nt = t // kt
    grid = (_cdiv(n, nblk), nt)

    def smap(b, tt):  # storage block of the grad step (newest first)
        return (tt if reverse else nt - 1 - tt, b, 0)

    def nmap(b, tt):  # processing-previous neighbor block, edge-clamped
        s = tt if reverse else nt - 1 - tt
        nxt = (jnp.minimum(s + 1, nt - 1) if reverse
               else jnp.maximum(s - 1, 0))
        return (nxt, b, 0)

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((3, in_dim, h), f32),       # dwp
        jax.ShapeDtypeStruct((3, h, h), f32),            # dwt
        jax.ShapeDtypeStruct((3, h), f32),               # dbc
        jax.ShapeDtypeStruct((h,), f32),                 # dbhn
    ]
    const = lambda *shape: pl.BlockSpec(shape, lambda b, tt: (0,) * len(shape))
    out_specs = [const(3, in_dim, h), const(3, h, h), const(3, h), const(h)]
    if need_dx:
        out_shapes.insert(0, jax.ShapeDtypeStruct((t, n, in_dim), x.dtype))
        out_specs.insert(0, pl.BlockSpec((kt, nblk, in_dim), smap))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, kt=kt, reverse=reverse, n_rows=n,
                          nblk=nblk, need_dx=need_dx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, nblk, in_dim), smap),
            pl.BlockSpec((kt, nblk, h), smap),
            pl.BlockSpec((kt, nblk, h), nmap),
            pl.BlockSpec((kt, nblk, h), smap),
            pl.BlockSpec((3, in_dim, h), lambda b, tt: (0, 0, 0)),
            pl.BlockSpec((3, h, h), lambda b, tt: (0, 0, 0)),
            pl.BlockSpec((3, h), lambda b, tt: (0, 0)),
            pl.BlockSpec((h,), lambda b, tt: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((nblk, h), jnp.float32)],
        interpret=interpret,
    )(x, hs, hs, dhs, wp, wt, bc, bhn)
    return outs if need_dx else (None, *outs)


# ---------------------------------------------------------------------------
# custom-VJP single-direction GRU
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_dir_pallas(x, wp, wt, bc, bhn, reverse: bool = False,
                   interpret: bool = False, need_dx: bool = True):
    """One direction of a GRU layer, fully fused (projection + recurrence).

    Args:
      x:   [T, B, in] T-major input, UN-reversed (``reverse=True`` walks it
           backward internally).
      wp:  [3, in, H] per-gate transposed projection weights ``W_ix^T``
           (gate order r, z, n).
      wt:  [3, H, H] per-gate transposed recurrent weights ``W_hx^T``.
      bc:  [3, H] input-side biases: combined ``b_ix + b_hx`` for r and z,
           ``b_in`` alone for n.
      bhn: [H] ``b_hn`` (applied inside the ``r ·`` term).
      need_dx: STATIC.  False declares x's cotangent structurally dead —
           nothing trainable sits upstream of x (a first-level GRU over raw
           features or frozen-BERT outputs, the production header wiring).
           The backward kernel then skips the three projection-sized dx
           contractions and the [T, B, in] dx write (the largest backward
           matmuls + HBM traffic at header shapes), and the VJP returns a
           symbolic-zero cotangent (``jnp.zeros_like(x)``) that XLA DCEs
           when — per the caller's declaration — nobody consumes it.
           Setting it False under an x that DOES need gradients silently
           zeroes them; only set it where deadness is an architectural
           invariant.
    Returns hidden states ``[T, B, H]`` in storage (un-reversed) time order.
    """
    return _fwd_impl(x, wp, wt, bc, bhn, reverse=reverse, interpret=interpret)


def _vjp_fwd(x, wp, wt, bc, bhn, reverse, interpret, need_dx):
    hs = _fwd_impl(x, wp, wt, bc, bhn, reverse=reverse, interpret=interpret)
    return hs, (x, wp, wt, bc, bhn, hs)


def _vjp_bwd(reverse, interpret, need_dx, res, dhs):
    x, wp, wt, bc, bhn, hs = res
    dx, dwp, dwt, dbc, dbhn = _bwd_impl(
        x, hs, dhs, wp, wt, bc, bhn, reverse=reverse, interpret=interpret,
        need_dx=need_dx)
    if dx is None:
        dx = jnp.zeros_like(x)
    return (dx, dwp.astype(wp.dtype), dwt.astype(wt.dtype),
            dbc.astype(bc.dtype), dbhn.astype(bhn.dtype))


gru_dir_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# level wrapper
# ---------------------------------------------------------------------------

def _dir_operands(p: dict):
    """torch-layout single-direction params (ops/gru.py init_gru) -> kernel
    operands.  Weight-sized reshapes; autodiff routes gradients back."""
    h = p["w_hh"].shape[1]
    wp = jnp.swapaxes(p["w_ih"].reshape(3, h, -1), 1, 2)   # [3, in, H]
    wt = jnp.swapaxes(p["w_hh"].reshape(3, h, h), 1, 2)    # [3, H, H]
    bi = p["b_ih"].reshape(3, h)
    bh = p["b_hh"].reshape(3, h)
    bc = jnp.stack([bi[0] + bh[0], bi[1] + bh[1], bi[2]])  # [3, H]
    return wp, wt, bc, bh[2]


def bigru_level_tmajor(params: dict, x_t: jnp.ndarray,
                       interpret: bool = False,
                       need_dx: bool = True) -> jnp.ndarray:
    """One bidirectional GRU level, T-major: ``x_t [T, B, in]`` ->
    ``hs [T, B, 2H]`` (fwd‖bwd, storage time order — torch's
    ``bidirectional=True`` output layout).  ``need_dx=False`` declares
    ``x_t``'s gradient structurally dead (see gru_dir_pallas)."""
    hs_f = gru_dir_pallas(x_t, *_dir_operands(params["fwd"]),
                          False, interpret, need_dx)
    hs_b = gru_dir_pallas(x_t, *_dir_operands(params["bwd"]),
                          True, interpret, need_dx)
    return jnp.concatenate([hs_f, hs_b], axis=-1)


def bigru_finals_tmajor(hs: jnp.ndarray) -> jnp.ndarray:
    """[T, B, 2H] -> torch ``cat((h[0], h[1]), dim=1)`` final hidden
    [B, 2H]: forward final after t=T-1, backward final after t=0."""
    h = hs.shape[-1] // 2
    return jnp.concatenate([hs[-1, :, :h], hs[0, :, h:]], axis=-1)
