"""Per-modality projection headers.

Reference (src/dynamic_models2.py:14-70,138-149):
  * ``RNN_Header``: two 1-layer bidirectional GRUs with a non-affine LN
    between; returns the second GRU's final hidden state — i.e. the whole
    sequence collapses to ONE token of width d.  (The header also constructs
    a Dropout(0.2) and a second LN that its forward never uses; we do not.)
  * ``CNN_Header``: one 3x3 same-padding conv (1->1 channel, no bias) +
    4x4 patchify to [B, 16, (H/4)*(W/4)], then an RNN_Header over patches.
  * ``BertTextEncoder``: frozen BERT-base last hidden states, then an
    RNN_Header.  NOTE the replicated reference quirk: the collate stacks
    [input_ids, token_type_ids, attention_mask] (src/dataset.py:51-55) but
    the forward unpacks [ids, attention_mask, token_type_ids]
    (src/dynamic_models2.py:49) — type ids are used as the attention mask.

Header choice per modality char (src/dynamic_models2.py:141-146):
'i'/'A' -> CNN+RNN, 't' -> BERT+RNN, else RNN.

All headers emit [B, 1, d] (batch-major; the reference permutes to
seq-major [1, B, d]).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelSpec
from ..ops.gru import bigru_forward, init_bigru
from ..ops.layernorm import masked_layer_norm
from . import bert as bert_mod


def _init_rnn_header(rng: jax.Array, input_dim: int, d: int) -> dict:
    k1, k2 = jax.random.split(rng)
    assert d % 2 == 0, "RNN header width must be even (bidirectional halves)"
    return {
        "gru1": init_bigru(k1, input_dim, d // 2),
        "gru2": init_bigru(k2, d, d // 2),
    }


def _rnn_header_tmajor(params: dict, x: jnp.ndarray,
                       interpret: bool = False,
                       live_input: bool = False) -> jnp.ndarray:
    """Fused-kernel header path (TPU): the whole two-level pipeline runs
    T-major so each level's single packed projection einsum feeds the
    bidirectional recurrence kernel with ZERO layout fixup (no gate
    stack/split/transpose/reverse/bias passes — see ops/bigru_pallas.py;
    the step profile measured that glue at several ms at B=1024)."""
    from ..ops.bigru_pallas import (bigru_finals_tmajor, bigru_level_tmajor)

    x_t = jnp.swapaxes(x, 0, 1)                       # [T, B, in] once
    # need_dx=False (live_input=False): gru1's input is raw modality data or
    # frozen/stop_gradient'd BERT features, so its input-gradient is
    # structurally dead and the backward kernel skips the projection-sized
    # dx dots + [T, B, in] writes (~5 ms/step at the B=4096 cached operating
    # point).  cnn_rnn headers pass live_input=True: their trainable Conv2d
    # sits UPSTREAM of gru1 (header_apply feeds _cnn_apply output here) and
    # needs the cotangent — eliding it there silently froze the conv weight
    # on TPU (found by the r5 self code-review; tests/test_gru.py
    # test_cnn_header_conv_grad_live_on_tmajor_path guards it now).
    hs1 = bigru_level_tmajor(params["gru1"], x_t, interpret,
                             need_dx=live_input)      # [T, B, d]
    d = hs1.shape[-1]
    hs1 = masked_layer_norm(hs1, jnp.ones((d,), hs1.dtype),
                            jnp.zeros((d,), hs1.dtype))
    hs2 = bigru_level_tmajor(params["gru2"], hs1, interpret)
    return bigru_finals_tmajor(hs2)[:, None, :]       # [B, 1, d]


def _rnn_header_apply(params: dict, x: jnp.ndarray,
                      live_input: bool = False) -> jnp.ndarray:
    """x: [B, T, input_dim] -> [B, 1, d].  live_input: x carries gradients
    from trainable upstream params (cnn_rnn's conv) — see _rnn_header_tmajor."""
    from ..ops.gru import resolved_impl

    impl = resolved_impl()
    if impl in ("pallas", "pallas_interpret"):
        return _rnn_header_tmajor(params, x, impl == "pallas_interpret",
                                  live_input=live_input)
    out1, _ = bigru_forward(params["gru1"], x)
    # non-affine LayerNorm over d (reference nn.LayerNorm(hidden_dim,
    # elementwise_affine=False))
    d = out1.shape[-1]
    out1 = masked_layer_norm(out1, jnp.ones((d,), out1.dtype), jnp.zeros((d,), out1.dtype))
    _, h2 = bigru_forward(params["gru2"], out1)
    return h2[:, None, :]


def _init_cnn(rng: jax.Array) -> dict:
    # torch Conv2d(1,1,3,bias=False) default: kaiming_uniform(a=sqrt(5)) ->
    # U(-sqrt(1/fan_in), ...) with fan_in = 9
    bound = math.sqrt(1.0 / 9.0)
    return {"w": jax.random.uniform(rng, (1, 1, 3, 3), jnp.float32, -bound, bound)}


def _cnn_apply(params: dict, x: jnp.ndarray, n_patches: int = 4) -> jnp.ndarray:
    """x: [B, 1, H, W] -> [B, n_patches^2, (H/P)*(W/P)]
    (reference CNN_Header.forward, src/dynamic_models2.py:65-70)."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b, c, h, w = y.shape
    p = n_patches
    y = y.reshape(b, c, p, h // p, p, w // p)
    y = y.transpose(0, 2, 4, 1, 3, 5)
    return y.reshape(b, p * p, -1)


def _grouped_bigru_level(gru_params: list, xs: list) -> list:
    """One bidirectional-GRU *level* for several headers in ONE recurrence
    call: every (header, direction) pair becomes a row of the kernel's G
    axis (its own weights), so n headers cost one launch instead of n scans.

    Inputs must share T; widths may differ (inputs zero-pad to the max and
    the matching ``w_ih`` columns pad with zeros — padded inputs are zero so
    the recurrence is unchanged).  Returns per-header (outputs [B, T, d],
    final hidden [B, d])."""
    from ..ops.gru import _gate_views, _gi_gates, gru_recurrence

    n = len(xs)
    h = gru_params[0]["fwd"]["w_hh"].shape[1]
    in_max = max(x.shape[-1] for x in xs)

    def pad_w(w):
        return jnp.pad(w, ((0, 0), (0, in_max - w.shape[-1])))

    # G axis layout: [hdr0-fwd, hdr0-bwd, hdr1-fwd, ...]
    gi_list = []
    for p, x in zip(gru_params, xs):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, in_max - x.shape[-1])))
        gi_list.append(jnp.einsum("bti,gi->btg", xp, pad_w(p["fwd"]["w_ih"]))
                       + p["fwd"]["b_ih"])
        gi_list.append(jnp.einsum("bti,gi->btg", xp[:, ::-1],
                                  pad_w(p["bwd"]["w_ih"])) + p["bwd"]["b_ih"])
    gi = jnp.stack(gi_list)                              # [2n, B, T, 3H]
    gi_r, gi_z, gi_n = _gi_gates(gi, h)
    gates = [jnp.moveaxis(a, 1, 2) for a in (gi_r, gi_z, gi_n)]  # [2n, T, B, H]
    w_hh = jnp.stack([p[d]["w_hh"] for p in gru_params for d in ("fwd", "bwd")])
    b_hh = jnp.stack([p[d]["b_hh"] for p in gru_params for d in ("fwd", "bwd")])
    hs = gru_recurrence(*gates, *_gate_views(w_hh, b_hh))  # [2n, T, B, H]
    outs, finals = [], []
    for k in range(n):
        out_f = jnp.moveaxis(hs[2 * k], 0, 1)
        out_b = jnp.moveaxis(hs[2 * k + 1], 0, 1)[:, ::-1]
        outs.append(jnp.concatenate([out_f, out_b], axis=-1))
        finals.append(jnp.concatenate([hs[2 * k, -1], hs[2 * k + 1, -1]], -1))
    return outs, finals


def grouped_rnn_header_apply(rnn_params: list, xs: list) -> list:
    """Run several same-length RNN_Headers' GRUs together.

    On the fused-kernel path each header is one T-major pipeline (the
    kernel batches both directions internally; per-header calls need no
    cross-header width padding).  Elsewhere the stacked-G-axis grouping
    below shares the recurrence launches."""
    from ..ops.gru import resolved_impl

    impl = resolved_impl()
    if impl in ("pallas", "pallas_interpret"):
        return [_rnn_header_tmajor(p, x, impl == "pallas_interpret")
                for p, x in zip(rnn_params, xs)]
    n = len(xs)
    if n == 1:
        return [_rnn_header_apply(rnn_params[0], xs[0])]
    out1, _ = _grouped_bigru_level([p["gru1"] for p in rnn_params], xs)
    d = out1[0].shape[-1]
    ones, zeros = jnp.ones((d,), out1[0].dtype), jnp.zeros((d,), out1[0].dtype)
    out1 = [masked_layer_norm(o, ones, zeros) for o in out1]
    _, finals = _grouped_bigru_level([p["gru2"] for p in rnn_params], out1)
    return [f[:, None, :] for f in finals]


def init_header(rng: jax.Array, spec: ModelSpec, i: int,
                bert_cfg: Optional[bert_mod.BertConfig] = None) -> dict:
    ch = spec.modality_set[i]
    kind = spec.header_kind(ch)
    d = spec.dimension
    orig = spec.orig_dimensions[i]
    if kind == "cnn_rnn":
        k1, k2 = jax.random.split(rng)
        return {"cnn": _init_cnn(k1),
                "rnn": _init_rnn_header(k2, (orig // 4) * (orig // 4), d)}
    if kind == "bert_rnn":
        cfg = bert_cfg or bert_mod.BertConfig()
        return {"rnn": _init_rnn_header(rng, cfg.hidden_size, d)}
    return {"rnn": _init_rnn_header(rng, orig, d)}


def bert_text_features(frozen: dict, bert_cfg: Optional[bert_mod.BertConfig],
                       x: jnp.ndarray) -> jnp.ndarray:
    """[3, B, L] stacked token tensor -> [B, L, H] frozen-BERT last hidden
    states.  One definition serves the online header path AND the
    feature-precompute path (train/features.py) so the replicated reference
    quirk — slot 1 of the stack is used as the attention mask
    (dynamic_models2.py:49, see module docstring) — cannot diverge."""
    ids = x[0].astype(jnp.int32)
    attn_mask = x[1].astype(jnp.float32)
    type_ids = x[2].astype(jnp.int32)
    hidden = bert_mod.bert_apply(frozen["bert"], ids, attn_mask, type_ids,
                                 bert_cfg or bert_mod.BertConfig())
    return jax.lax.stop_gradient(hidden)  # frozen (torch.no_grad at
    #                                       dynamic_models2.py:50)


def header_apply(kind: str, params: dict, x: jnp.ndarray,
                 frozen: Optional[dict] = None,
                 bert_cfg: Optional[bert_mod.BertConfig] = None) -> jnp.ndarray:
    """Dispatch on header kind (static string, not part of the param pytree);
    returns [B, 1, d]."""
    if kind == "cnn_rnn":
        feats = _cnn_apply(params["cnn"], x)
        # live_input: the conv is trainable, so gru1's input cotangent must
        # flow back through feats
        return _rnn_header_apply(params["rnn"], feats, live_input=True)
    if kind == "bert_rnn":
        if jnp.issubdtype(x.dtype, jnp.floating):
            # precomputed frozen-BERT features [B, L, H] (train/features.py).
            # The reference freezes BERT (dynamic_models2.py:50) so its
            # output is a deterministic function of the tokens; running it
            # once per dataset instead of once per step is SURVEY §7.4's
            # "feature-extractor stage of the input pipeline".  Dtype is the
            # static dispatch: token stacks are int, features are float.
            return _rnn_header_apply(params["rnn"], x)
        assert frozen is not None and "bert" in frozen, "text modality needs frozen BERT params"
        return _rnn_header_apply(params["rnn"],
                                 bert_text_features(frozen, bert_cfg, x))
    return _rnn_header_apply(params["rnn"], x)
