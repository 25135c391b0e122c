"""GRU matching ``torch.nn.GRU`` semantics, MXU-friendly.

The reference's projection headers run two 1-layer bidirectional GRUs and
keep only the final hidden state (src/dynamic_models2.py:23-39 RNN_Header) —
this is what collapses every modality to one token before the transformer
stacks (SURVEY.md §3.2).

TPU design: the input-side gate projections for *all* timesteps are computed
as one large matmul up front (MXU); the sequential part carries only the
[N, H] hidden state and three small ``[H, H]`` recurrent matmuls.  The
recurrence itself has two interchangeable implementations behind
:func:`gru_recurrence`:

  * ``pallas`` (default on TPU): the fused whole-scan kernel in
    ops/gru_pallas.py — hidden state VMEM-resident across all T steps, a
    recomputing backward, and a leading ``G`` axis that batches every
    direction/header with its own weights into one launch;
  * ``xla``: a plain ``lax.scan`` (CPU tests, interpret-free fallback).

Gate order and update equations follow torch exactly:

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(  x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

with packed weights ``w_ih [3H, in]`` / ``w_hh [3H, H]`` in (r, z, n) row
order and torch's U(-1/sqrt(H), 1/sqrt(H)) default init.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .gru_pallas import gru_recurrence_pallas

# "auto" = pallas on TPU, xla elsewhere; tests may set "xla" /
# "pallas_interpret" (interpreter-mode kernel on CPU) explicitly.
RECURRENCE_IMPL = "auto"


def resolved_impl() -> str:
    """The concrete recurrence implementation for this trace: resolves
    "auto" to "pallas" on TPU and "xla" elsewhere."""
    impl = RECURRENCE_IMPL
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def init_gru(rng: jax.Array, input_dim: int, hidden_dim: int) -> dict:
    k = math.sqrt(1.0 / hidden_dim)
    ks = jax.random.split(rng, 4)
    return {
        "w_ih": jax.random.uniform(ks[0], (3 * hidden_dim, input_dim), jnp.float32, -k, k),
        "w_hh": jax.random.uniform(ks[1], (3 * hidden_dim, hidden_dim), jnp.float32, -k, k),
        "b_ih": jax.random.uniform(ks[2], (3 * hidden_dim,), jnp.float32, -k, k),
        "b_hh": jax.random.uniform(ks[3], (3 * hidden_dim,), jnp.float32, -k, k),
    }


_SCAN_UNROLL = 4  # xla path: amortizes per-step scan overhead (and its
#                   transpose in the backward pass).  8 was faster still, but
#                   the unrolled program crossed the axon compile tunnel's
#                   request-size limit (HTTP 413) for full train-step graphs.


def _recurrence_xla(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn) -> jnp.ndarray:
    """lax.scan recurrence, same [G, T, N, H] contract as the kernel."""
    g, t, n, h = gi_r.shape
    seq = (jnp.moveaxis(gi_r, 1, 0), jnp.moveaxis(gi_z, 1, 0),
           jnp.moveaxis(gi_n, 1, 0))

    def cell(hc, gis):
        ir, iz, in_ = gis
        gh_r = jnp.einsum("gnh,ghk->gnk", hc, wr) + br[:, None]
        gh_z = jnp.einsum("gnh,ghk->gnk", hc, wz) + bz[:, None]
        gh_n = jnp.einsum("gnh,ghk->gnk", hc, wn) + bn[:, None]
        r = jax.nn.sigmoid(ir + gh_r)
        z = jax.nn.sigmoid(iz + gh_z)
        nn = jnp.tanh(in_ + r * gh_n)
        h_new = (1.0 - z) * nn + z * hc
        return h_new, h_new

    h0 = jnp.zeros((g, n, h), gi_r.dtype)
    _, hs = jax.lax.scan(cell, h0, seq, unroll=_SCAN_UNROLL)
    return jnp.moveaxis(hs, 0, 1)


def gru_recurrence(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn) -> jnp.ndarray:
    """Dispatch the [G, T, N, H] recurrence to the configured impl."""
    impl = RECURRENCE_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return gru_recurrence_pallas(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn)
    if impl == "pallas_interpret":
        return gru_recurrence_pallas(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                                     True)
    return _recurrence_xla(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn)


def _gate_views(w_hh: jnp.ndarray, b_hh: jnp.ndarray):
    """w_hh [..., 3H, H] -> per-gate transposed weights [..., H, H] (r, z, n)
    and biases [..., H]."""
    h = w_hh.shape[-1]
    w3 = w_hh.reshape(w_hh.shape[:-2] + (3, h, h))
    wt = jnp.swapaxes(w3, -1, -2)  # h @ W^T needs [in, out]
    b3 = b_hh.reshape(b_hh.shape[:-1] + (3, h))
    return (wt[..., 0, :, :], wt[..., 1, :, :], wt[..., 2, :, :],
            b3[..., 0, :], b3[..., 1, :], b3[..., 2, :])


def _gi_gates(gi: jnp.ndarray, h: int):
    """gi [..., T, 3H] -> three [..., T, H] per-gate arrays."""
    g3 = gi.reshape(gi.shape[:-1] + (3, h))
    return g3[..., 0, :], g3[..., 1, :], g3[..., 2, :]


def gru_forward(params: dict, x: jnp.ndarray, reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, in].  Returns (outputs [B, T, H], final hidden [B, H]).

    ``reverse=True`` runs t = T-1 .. 0 (torch's backward direction: its final
    hidden is the state after processing t=0, and outputs[t] is the state the
    backward pass had at time t)."""
    h = params["w_hh"].shape[1]
    # all-timestep input projection in one MXU matmul
    gi = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]  # [B, T, 3H]
    if reverse:
        gi = gi[:, ::-1]
    gi_r, gi_z, gi_n = _gi_gates(gi, h)  # [B, T, H] each
    gates = [jnp.moveaxis(a, 0, 1)[None] for a in (gi_r, gi_z, gi_n)]  # [1, T, B, H]
    wr, wz, wn, br, bz, bn = _gate_views(params["w_hh"][None], params["b_hh"][None])
    hs = gru_recurrence(*gates, wr, wz, wn, br, bz, bn)  # [1, T, B, H]
    outs = jnp.moveaxis(hs[0], 0, 1)  # [B, T, H]
    h_final = hs[0, -1]
    if reverse:
        outs = outs[:, ::-1]
    return outs, h_final


def init_bigru(rng: jax.Array, input_dim: int, hidden_dim: int) -> dict:
    """Bidirectional single-layer GRU with per-direction hidden width
    ``hidden_dim`` (callers pass d//2 to mirror torch
    ``GRU(hidden_size=d//2, bidirectional=True)``)."""
    kf, kb = jax.random.split(rng)
    return {"fwd": init_gru(kf, input_dim, hidden_dim),
            "bwd": init_gru(kb, input_dim, hidden_dim)}


def bigru_forward(params: dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (outputs [B, T, 2H] fwd||bwd, final hidden [B, 2H]).

    The final hidden concatenates forward-final (after t=T-1) and
    backward-final (after t=0), matching ``torch.cat((h[0], h[1]), dim=1)``
    in the reference RNN_Header (src/dynamic_models2.py:38).

    Both directions run in ONE recurrence call on the leading G axis (the
    backward direction is the forward recurrence on the time-flipped
    sequence) — one kernel launch / one scan instead of two."""
    h = params["fwd"]["w_hh"].shape[1]
    gi_f = jnp.einsum("bti,gi->btg", x, params["fwd"]["w_ih"]) + params["fwd"]["b_ih"]
    gi_b = jnp.einsum("bti,gi->btg", x[:, ::-1], params["bwd"]["w_ih"]) + params["bwd"]["b_ih"]
    gi = jnp.stack([gi_f, gi_b])                         # [2, B, T, 3H]
    gi_r, gi_z, gi_n = _gi_gates(gi, h)
    gates = [jnp.moveaxis(a, 1, 2) for a in (gi_r, gi_z, gi_n)]  # [2, T, B, H]
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    b_hh = jnp.stack([params["fwd"]["b_hh"], params["bwd"]["b_hh"]])
    wr, wz, wn, br, bz, bn = _gate_views(w_hh, b_hh)
    hs = gru_recurrence(*gates, wr, wz, wn, br, bz, bn)  # [2, T, B, H]
    out_f = jnp.moveaxis(hs[0], 0, 1)                    # [B, T, H]
    out_b = jnp.moveaxis(hs[1], 0, 1)[:, ::-1]           # un-flip backward
    return (jnp.concatenate([out_f, out_b], axis=-1),
            jnp.concatenate([hs[0, -1], hs[1, -1]], axis=-1))
