"""The elastic multimodal-transformer supernet ("dynamic MulT"), TPU-native.

Dataflow (mirrors reference src/dynamic_models2.py:222-291, see SURVEY.md
§3.2):

    inputs (one per modality)
      -> projection headers (each collapses its sequence to [B, 1, d])
      -> per-modality self-attention stacks  (``mems0``)
      -> crossmodal stacks, one per combination string (``cross``)
      -> per-branch fused concat + channel-masked top stacks (``mems``)
      -> masked head MLP (proj1 -> ReLU -> dropout -> proj2 + residual
         -> out_layer)

TPU re-design vs the reference:
  * one static execution plan: ALL cross stacks run every step; topology
    masks gate which streams reach the fused outputs.  No Python branching
    on configuration inside the trace -> one compiled program for every
    (modality subset × fusion topology × depth × width) configuration.
  * same-shaped stacks are stacked on a leading axis and vmapped: the M
    ``mems0`` stacks in one batch, each cross *level* (pairs, triples, ...)
    in one batch, the M top stacks in one batch.  The reference runs 18
    sequential module calls (MOSEI config); here it is 2 + #levels vmapped
    calls.
  * parameters are full-size; elasticity is masks (see ops/, masks.py).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelSpec
from ..masks import SupernetMasks
from ..ops.dropout import dropout
from ..ops.encoder import EncoderHParams, EncoderMasks, encoder_forward, init_encoder
from ..ops.linear import init_linear, masked_linear
from . import bert as bert_mod
from .headers import header_apply, init_header


class SupernetParams(NamedTuple):
    proj: Tuple[dict, ...]      # per-modality header params
    mems0: dict                 # encoder params stacked on [M, ...]
    cross: Optional[dict]       # encoder params stacked on [n_cross, ...]
    mems: dict                  # encoder params stacked on [M, ...]
    translation: dict           # [n_cross, d, d] linears — dead weights kept
    #                             for checkpoint parity (reference constructs
    #                             but never calls them: dynamic_models2.py:
    #                             161-162, forward block commented at 259-268)
    proj1: dict
    proj2: dict
    out_layer: dict


def _stack_trees(trees: Sequence[dict]) -> dict:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _group_rates(spec: ModelSpec, group: str) -> Tuple[float, ...]:
    """Static effective attention-dropout rates of an encoder group.

    Cross stacks with index > 0 always run at the reference's hard-coded 0.1
    (dynamic_models2.py:201-207 via ``attn_dropout_for_cross``) even when the
    --attn_dropout flags are all zero — the flash zero-rate hint must see
    those effective rates, not the raw flag values."""
    if group == "mems0":
        return tuple(spec.attn_dropout[:spec.modality_num])
    if group == "cross":
        return tuple(spec.attn_dropout_for_cross(i)
                     for i in range(len(spec.cross_strings)))
    assert group == "top"
    return (spec.attn_dropout[-1],)


def _hp_stream(spec: ModelSpec, layers: int, group: str) -> EncoderHParams:
    # static hint: a group whose every stack has zero effective attention
    # dropout skips the flash kernel's in-kernel dropout machinery; groups
    # with nonzero rates (e.g. cross idx>0's hard-coded 0.1) train through
    # the kernel's fused position-hash dropout
    zero = all(r == 0.0 for r in _group_rates(spec, group))
    return EncoderHParams(
        embed_dim_in=spec.dimension, num_heads=spec.num_heads,
        head_dim=spec.head_dim, layers=layers,
        relu_dropout=spec.relu_dropout, res_dropout=spec.res_dropout,
        embed_dropout=spec.embed_dropout, attn_mask=spec.attn_mask,
        attn_impl=spec.attn_impl, flash_zero_rates=zero)


def _hp_top(spec: ModelSpec) -> EncoderHParams:
    zero = all(r == 0.0 for r in _group_rates(spec, "top"))
    return EncoderHParams(
        embed_dim_in=spec.top_dim, num_heads=spec.num_heads,
        head_dim=spec.head_dim, layers=spec.layers_self_attn,
        relu_dropout=spec.relu_dropout, res_dropout=spec.res_dropout,
        embed_dropout=spec.embed_dropout, attn_mask=spec.attn_mask,
        attn_impl=spec.attn_impl, flash_zero_rates=zero)


def init_supernet(
    rng: jax.Array,
    spec: ModelSpec,
    bert_cfg: Optional[bert_mod.BertConfig] = None,
    bert_dir: Optional[str] = None,
    use_jit: bool = True,
) -> Tuple[SupernetParams, dict]:
    """Returns (trainable params, frozen params).

    ``frozen`` holds the BERT encoder weights when a text modality exists
    (the reference freezes BERT with torch.no_grad — dynamic_models2.py:50);
    they are jit arguments but excluded from the optimizer.

    ``use_jit`` fuses the hundreds of per-parameter init ops into one
    compiled program — on a remote-tunnel TPU backend, eager init pays a
    round-trip per op (~50 s for the MOSEI supernet; ~2 s jitted).  Disabled
    automatically when loading pretrained BERT from disk.
    """
    if use_jit and bert_dir is None:
        return jax.jit(
            lambda key: init_supernet(key, spec, bert_cfg, None, use_jit=False)
        )(rng)
    M = spec.modality_num
    n_cross = len(spec.cross_strings)
    n_keys = 1 + M + M + max(n_cross, 1) + M + max(n_cross, 1) + 1
    keys = iter(jax.random.split(rng, n_keys))

    frozen = {}
    bert_key = next(keys)
    if any(spec.header_kind(c) == "bert_rnn" for c in spec.modality_set):
        loaded = bert_mod.load_hf_bert_params(bert_dir) if bert_dir else None
        if loaded is not None:
            frozen["bert"], bert_cfg = loaded
        else:
            bert_cfg = bert_cfg or bert_mod.BertConfig()
            frozen["bert"] = bert_mod.init_bert(bert_key, bert_cfg)
    proj = tuple(init_header(next(keys), spec, i, bert_cfg) for i in range(M))
    mems0 = _stack_trees(
        [init_encoder(next(keys), _hp_stream(spec, spec.layers_single_attn, "mems0"))
         for _ in range(M)])
    cross = None
    if n_cross:
        cross = _stack_trees(
            [init_encoder(next(keys), _hp_stream(spec, spec.layers_cross_attn, "cross"))
             for _ in range(n_cross)])
    else:
        for _ in range(max(n_cross, 1)):
            next(keys)
    mems = _stack_trees(
        [init_encoder(next(keys), _hp_top(spec)) for _ in range(M)])

    d = spec.dimension
    translation = _stack_trees(
        [init_linear(next(keys), d, d, init="torch")
         for _ in range(max(n_cross, 1))])
    k1, k2, k3 = jax.random.split(next(keys), 3)
    cdim = spec.combined_dim
    return (
        SupernetParams(
            proj=proj, mems0=mems0, cross=cross, mems=mems,
            translation=translation,
            proj1=init_linear(k1, cdim, cdim, init="torch"),
            proj2=init_linear(k2, cdim, cdim, init="torch"),
            out_layer=init_linear(k3, cdim, spec.output_dim, init="torch"),
        ),
        frozen,
    )


def _compute_cast(spec: ModelSpec):
    """bf16 compute policy boundary cast: float32 leaves -> compute dtype
    (int token ids / mask index arrays keep their dtypes); identity under
    float32.  Master params stay f32 in the optimizer, and the f32
    cast-back in astype's VJP gives f32 gradients automatically."""
    if spec.compute_dtype == "float32":
        return lambda t: t
    cdt = jnp.dtype(spec.compute_dtype)
    return lambda t: jax.tree.map(
        lambda x: x.astype(cdt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)


def supernet_headers(
    spec: ModelSpec,
    params: SupernetParams,
    inputs: Sequence[jnp.ndarray],
    *,
    frozen: Optional[dict] = None,
    bert_cfg: Optional[bert_mod.BertConfig] = None,
) -> jnp.ndarray:
    """Projection headers only: ``inputs`` -> stacked ``base`` [M, B, T, d]
    (T == 1 with RNN headers).

    This is the CONFIG-INVARIANT prefix of the forward pass: no elastic
    mask enters before mems0 (masks gate attention/FFN/topology only,
    masks.py), headers take no rng (the reference header dropout is dead
    code — dynamic_models2.py:24-39), and the frozen BERT is deterministic.
    The sweep / EA hoist this out of their config axes
    (train/loop.py::eval_step_sweep): one header pass per DATA batch instead
    of one per (config × batch) — at the MOSEI flagship that removes ~860
    redundant frozen-BERT forwards per batch (VERDICT r4 #1)."""
    M = spec.modality_num
    cast = _compute_cast(spec)
    proj_params = cast(params.proj)
    inputs = cast(list(inputs))
    if frozen is not None:
        frozen = cast(frozen)

    # all modalities run, even inactive ones — reference
    # dynamic_models2.py:224-229 runs proj + mems0 unconditionally.
    # Plain-RNN headers whose inputs share a sequence length run as ONE
    # vmapped group (fewer sequential GRU scans).
    proj_x: List[Optional[jnp.ndarray]] = [None] * M
    rnn_groups: dict = {}
    for i in range(M):
        kind = spec.header_kind(spec.modality_set[i])
        if kind == "rnn":
            rnn_groups.setdefault(inputs[i].shape[1], []).append(i)
        else:
            proj_x[i] = header_apply(kind, proj_params[i], inputs[i], frozen,
                                     bert_cfg)
    from .headers import grouped_rnn_header_apply

    for _, idxs in rnn_groups.items():
        outs = grouped_rnn_header_apply(
            [proj_params[i]["rnn"] for i in idxs], [inputs[i] for i in idxs])
        for i, o in zip(idxs, outs):
            proj_x[i] = o
    return jnp.stack(proj_x)


def supernet_apply(
    spec: ModelSpec,
    params: SupernetParams,
    masks: SupernetMasks,
    inputs: Sequence[jnp.ndarray],
    *,
    frozen: Optional[dict] = None,
    bert_cfg: Optional[bert_mod.BertConfig] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Forward pass.  ``inputs``: one array per modality (text: [3, B, L]
    int stack; images: [B, 1, H, W]; sequences: [B, T, feat]).

    Returns [B, output_dim], or [B, T, output_dim] when ``spec.all_steps``
    (reference returns ``(out, translation_pair=[])``; the empty translation
    list is dropped — the reference's translation loss is dead code).

    Composition of :func:`supernet_headers` (config-invariant) and
    :func:`supernet_trunk` (mask-dependent) — the split exists so batched
    config evaluation hoists the header work out of the config axis."""
    base = supernet_headers(spec, params, inputs, frozen=frozen,
                            bert_cfg=bert_cfg)
    return supernet_trunk(spec, params, masks, base, train=train, rng=rng)


def supernet_trunk(
    spec: ModelSpec,
    params: SupernetParams,
    masks: SupernetMasks,
    base: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Mask-dependent remainder of the forward pass: stacked header outputs
    ``base`` [M, B, T, d] -> mems0 -> cross -> top -> head MLP ->
    predictions.  ``base`` arrives in the compute dtype (headers cast at
    their boundary); params/masks cast here."""
    M = spec.modality_num
    d = spec.dimension
    if rng is None:
        rng = jax.random.PRNGKey(0)
    n_cross = len(spec.cross_strings)
    # k_head is RESERVED, deliberately unconsumed: headers take no rng —
    # the reference RNN_Header's nn.Dropout is dead code (constructed,
    # never called in forward, dynamic_models2.py:24-39), so wiring header
    # dropout here would BREAK parity.  The split stays 5-way because the
    # downstream key assignments are part of the seeded-run contract.
    k_head, k_m0, k_cr, k_top, k_out = jax.random.split(rng, 5)

    out_dtype = jnp.result_type(jnp.float32)
    cast = _compute_cast(spec)
    params = cast(params)
    masks = cast(masks)
    base = cast(base)  # no-op when already computed in the compute dtype

    # ---- per-modality self-attention stacks, one vmapped batch -------------
    hp0 = _hp_stream(spec, spec.layers_single_attn, "mems0")
    mems0_rates = jnp.asarray(spec.attn_dropout[:M], jnp.float32)

    def m0_fwd(p, x, gates, rate, key):
        m = EncoderMasks(gates, masks.head_mask, masks.head_dim_mask,
                         masks.ffn_mask, None)
        return encoder_forward(p, x, hp=hp0, masks=m, attn_rate=rate,
                               train=train, rng=key)

    h_base = jax.vmap(m0_fwd)(
        params.mems0, base, masks.mems0_gates, mems0_rates,
        jax.random.split(k_m0, M))

    # ---- cross stacks, one vmapped batch per level -------------------------
    order = spec.stream_order()
    pos = {s: i for i, s in enumerate(order)}
    streams: List[jnp.ndarray] = [h_base[i] for i in range(M)]

    if n_cross:
        hp_c = _hp_stream(spec, spec.layers_cross_attn, "cross")
        cross_rates = jnp.asarray(
            [spec.attn_dropout_for_cross(i) for i in range(n_cross)], jnp.float32)
        cross_keys = jax.random.split(k_cr, n_cross)

        def cr_fwd(p, q, kv, rate, key):
            m = EncoderMasks(masks.cross_gates, masks.head_mask,
                             masks.head_dim_mask, masks.ffn_mask, None)
            return encoder_forward(p, q, kv, hp=hp_c, masks=m, attn_rate=rate,
                                   train=train, rng=key)

        for lo, hi in spec.cross_level_ranges():
            # query = last char's stream (always a base stream); key/value =
            # the prefix chain's stream (reference dynamic_models2.py:240)
            q = jnp.stack([streams[pos[spec.cross_strings[j][-1]]]
                           for j in range(lo, hi)])
            kv = jnp.stack([streams[pos[spec.cross_strings[j][:-1]]]
                            for j in range(lo, hi)])
            p_level = jax.tree.map(lambda a: a[lo:hi], params.cross)
            out = jax.vmap(cr_fwd)(p_level, q, kv, cross_rates[lo:hi],
                                   cross_keys[lo:hi])
            streams.extend(out[j] for j in range(hi - lo))

    # ---- fused per-branch features + top stacks ----------------------------
    all_streams = jnp.stack(streams)  # [n_streams, B, T, d]
    slot_idx = jnp.asarray([[pos[s] for s in spec.slot_lists[i]] for i in range(M)])
    gated_slots = masks.slot_mask * masks.branch_gate[:, None]      # [M, S]
    x_top = all_streams[slot_idx]                                   # [M, S, B, T, d]
    x_top = x_top * gated_slots[:, :, None, None, None]
    m_, s_, b_, t_, _ = x_top.shape
    x_top = x_top.transpose(0, 2, 3, 1, 4).reshape(m_, b_, t_, s_ * d)

    hp_t = _hp_top(spec)
    ch_masks = masks.channel_mask(d)  # [M, E_top]

    def top_fwd(p, x, cm, key):
        m = EncoderMasks(masks.mems_gates, masks.head_mask,
                         masks.head_dim_mask, masks.ffn_mask, cm)
        return encoder_forward(p, x, hp=hp_t, masks=m,
                               attn_rate=spec.attn_dropout[-1],
                               train=train, rng=key)

    h_top = jax.vmap(top_fwd)(params.mems, x_top, ch_masks,
                              jax.random.split(k_top, M))  # [M, B, T, E_top]

    # ---- global fused feature + head MLP -----------------------------------
    if spec.all_steps:
        out = h_top.transpose(1, 2, 0, 3).reshape(b_, t_, -1)  # [B, T, comb]
    else:
        out = h_top[:, :, -1, :].transpose(1, 0, 2).reshape(b_, -1)  # [B, comb]

    ch = masks.output_channel_mask(d)
    h1 = jax.nn.relu(masked_linear(out, params.proj1["w"], params.proj1["b"]))
    h1 = dropout(k_out, h1, spec.out_dropout, train)
    h2 = masked_linear(h1, params.proj2["w"], params.proj2["b"], mask_out=ch)
    h2 = h2 + out
    y = masked_linear(h2, params.out_layer["w"], params.out_layer["b"])
    return y.astype(out_dtype)  # predictions/loss in f32 under any policy
