"""GRU matching ``torch.nn.GRU`` semantics, MXU-friendly.

The reference's projection headers run two 1-layer bidirectional GRUs and
keep only the final hidden state (src/dynamic_models2.py:23-39 RNN_Header) —
this is what collapses every modality to one token before the transformer
stacks (SURVEY.md §3.2).

TPU design: the input-side gate projections for *all* timesteps are computed
as one large matmul up front (MXU); the sequential ``lax.scan`` carries only
the [B, H] hidden state and the small ``[3H, H]`` recurrent matmul.  Gate
order and update equations follow torch exactly:

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


def init_gru(rng: jax.Array, input_dim: int, hidden_dim: int) -> dict:
    k = math.sqrt(1.0 / hidden_dim)
    ks = jax.random.split(rng, 4)
    return {
        "w_ih": jax.random.uniform(ks[0], (3 * hidden_dim, input_dim), jnp.float32, -k, k),
        "w_hh": jax.random.uniform(ks[1], (3 * hidden_dim, hidden_dim), jnp.float32, -k, k),
        "b_ih": jax.random.uniform(ks[2], (3 * hidden_dim,), jnp.float32, -k, k),
        "b_hh": jax.random.uniform(ks[3], (3 * hidden_dim,), jnp.float32, -k, k),
    }


_SCAN_UNROLL = 4  # amortizes per-step scan overhead (and its transpose in
#                   the backward pass, which dominates the training step).
#                   8 was faster still, but the unrolled program crossed the
#                   axon compile tunnel's request-size limit (HTTP 413) for
#                   full train-step graphs; 4 keeps most of the win.


def gru_forward(params: dict, x: jnp.ndarray, reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, in].  Returns (outputs [B, T, H], final hidden [B, H]).

    ``reverse=True`` runs t = T-1 .. 0 (torch's backward direction: its final
    hidden is the state after processing t=0, and outputs[t] is the state the
    backward pass had at time t)."""
    h_dim = params["w_hh"].shape[1]
    # all-timestep input projection in one MXU matmul
    gi = jnp.einsum("bti,gi->btg", x, params["w_ih"]) + params["b_ih"]  # [B, T, 3H]
    gi = jnp.moveaxis(gi, 1, 0)  # [T, B, 3H] scan-major
    w_hh = params["w_hh"]
    b_hh = params["b_hh"]

    def cell(h, gi_t):
        gh = jnp.matmul(h, w_hh.T) + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((x.shape[0], h_dim), x.dtype)
    h_final, outs = jax.lax.scan(cell, h0, gi, reverse=reverse,
                                 unroll=_SCAN_UNROLL)
    return jnp.moveaxis(outs, 0, 1), h_final


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

    Both directions run in ONE scan: the backward direction is the forward
    recurrence on the time-flipped sequence, so fwd/bwd stack on the batch
    axis (halves the number of sequential scans — scan count, not FLOPs,
    dominates the tiny-step recurrence and especially its backward pass)."""
    b = x.shape[0]
    p2 = jax.tree.map(lambda a, c: jnp.stack([a, c]), params["fwd"], params["bwd"])
    h_dim = params["fwd"]["w_hh"].shape[1]

    # per-direction input projections, then merge on the batch axis
    gi_f = jnp.einsum("bti,gi->btg", x, params["fwd"]["w_ih"]) + params["fwd"]["b_ih"]
    gi_b = jnp.einsum("bti,gi->btg", x[:, ::-1], params["bwd"]["w_ih"]) + params["bwd"]["b_ih"]
    gi = jnp.concatenate([gi_f, gi_b], axis=0)          # [2B, T, 3H]
    gi = jnp.moveaxis(gi, 1, 0)                          # [T, 2B, 3H]
    w_hh = jnp.concatenate([jnp.broadcast_to(params["fwd"]["w_hh"], (1, 3 * h_dim, h_dim)),
                            jnp.broadcast_to(params["bwd"]["w_hh"], (1, 3 * h_dim, h_dim))])
    b_hh = jnp.stack([params["fwd"]["b_hh"], params["bwd"]["b_hh"]])

    def cell(h, gi_t):
        # h: [2B, H]; per-direction recurrent matmul via batched dot
        h2 = h.reshape(2, b, h_dim)
        gh = jnp.einsum("dbh,dgh->dbg", h2, w_hh) + b_hh[:, None, :]
        gh = gh.reshape(2 * b, 3 * h_dim)
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2 * b, h_dim), x.dtype)
    h_final, outs = jax.lax.scan(cell, h0, gi, unroll=_SCAN_UNROLL)
    outs = jnp.moveaxis(outs, 0, 1)                      # [2B, T, H]
    out_f, out_b = outs[:b], outs[b:, ::-1]              # un-flip backward
    h_f, h_b = h_final[:b], h_final[b:]
    del p2
    return (jnp.concatenate([out_f, out_b], axis=-1),
            jnp.concatenate([h_f, h_b], axis=-1))
