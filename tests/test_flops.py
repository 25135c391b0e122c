"""Validate the analytic FLOP model (flops.py) against XLA's cost analysis.

XLA's ``cost_analysis`` is only trustworthy where no ``lax.scan`` hides trip
counts and no Pallas kernel hides dots — so each component formula is
checked on a closure whose scans have trip count 1 (single layer / single
time step).  The analytic number must bracket XLA's within a few percent
(XLA adds elementwise/softmax FLOPs the matmul-only model excludes, so XLA
may read slightly HIGHER; it must never read meaningfully lower)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import flops as F
from multimodal_transformer_robustness_tpu.models import bert as bert_mod
from multimodal_transformer_robustness_tpu.ops.encoder import (
    EncoderHParams, EncoderMasks, encoder_forward, init_encoder)
from multimodal_transformer_robustness_tpu.ops.gru import bigru_forward, init_bigru


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    return float(compiled.cost_analysis().get("flops", 0.0))


def test_bert_layer_flops_matches_xla():
    cfg = bert_mod.BertConfig(vocab_size=128, num_layers=1, hidden_size=64,
                              num_heads=4, intermediate_size=256,
                              max_position=64)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    B, L = 4, 16
    ids = jnp.zeros((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)

    def fn(p, ids, mask):
        return bert_mod.bert_apply(p, ids, mask, jnp.zeros_like(ids), cfg)

    xla = _xla_flops(fn, params, ids, mask)
    analytic = F.bert_fwd(B, L, cfg)
    # analytic counts matmuls only; XLA adds LN/softmax/gelu elementwise
    assert analytic <= xla * 1.02
    assert xla <= analytic * 1.25


def test_encoder_layer_flops_matches_xla():
    hp = EncoderHParams(embed_dim_in=32, num_heads=4, head_dim=8, layers=1,
                        relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0,
                        attn_mask=True)
    params = init_encoder(jax.random.PRNGKey(0), hp)
    B, T, E = 8, 1, 32
    x = jnp.ones((B, T, E), jnp.float32)
    masks = EncoderMasks(
        jnp.ones((hp.layers,), jnp.float32), jnp.ones((hp.num_heads,)),
        jnp.ones((hp.head_dim,)), jnp.ones((4 * hp.num_heads * hp.head_dim,)),
        None)

    def fn(p, x):
        return encoder_forward(p, x, hp=hp, masks=masks, attn_rate=0.0,
                               train=False)

    xla = _xla_flops(fn, params, x)
    analytic = F.encoder_layer_fwd(B, T, T, E, hp.num_heads, hp.head_dim)
    assert analytic <= xla * 1.02
    assert xla <= analytic * 1.35  # masks/PE/LN elementwise rides on top


def test_bigru_level_flops_matches_xla_at_T1():
    # T=1 makes the recurrence scan's trip count 1, so XLA's count is honest
    B, n_in, h = 8, 24, 16
    params = init_bigru(jax.random.PRNGKey(0), n_in, h)
    x = jnp.ones((B, 1, n_in), jnp.float32)

    def fn(p, x):
        return bigru_forward(p, x)[0]

    xla = _xla_flops(fn, params, x)
    analytic = F.bigru_level_fwd(B, 1, n_in, h)
    assert analytic <= xla * 1.02
    assert xla <= analytic * 1.35


def test_train_step_components_sum():
    from __graft_entry__ import _mosei_spec

    spec = _mosei_spec()
    cfg = bert_mod.BertConfig(num_layers=4)
    fl = F.train_step_flops(spec, cfg, 1024, [32, 50, 50], n_params=10_000)
    assert fl.total == pytest.approx(
        fl.bert_fwd + fl.headers_fwd + fl.trunk_fwd + fl.head_mlp_fwd
        + fl.bwd + fl.optimizer)
    # frozen BERT is fwd-only: bwd covers exactly the trainable parts twice
    assert fl.bwd == pytest.approx(
        2 * (fl.headers_fwd + fl.trunk_fwd + fl.head_mlp_fwd))
    # headline magnitude pin: ~2.76 TFLOP/step online at B=1024 (the r2/r3
    # XLA numbers 1079.8 / 204.1 were scan-body + Pallas undercounts)
    assert 2.5e12 < fl.total < 3.0e12
    cached = F.train_step_flops(spec, cfg, 1024, [32, 50, 50],
                                cached_text=True, n_params=10_000)
    assert cached.total == pytest.approx(fl.total - fl.bert_fwd)


def test_full_tiny_step_flops_lower_bounds_xla():
    """End-to-end cross-check: at T=1 inputs and 1-layer stacks every scan
    has trip count 1, so XLA's full-step count must bracket the analytic
    model (mask elementwise + PE on top)."""
    import dataclasses

    from multimodal_transformer_robustness_tpu import (build_masks,
                                                       full_active_config)
    from multimodal_transformer_robustness_tpu.config import ModelSpec
    from multimodal_transformer_robustness_tpu.models import (init_supernet,
                                                              supernet_apply)

    spec = ModelSpec(
        modality_set=("a", "v"), orig_dimensions=(12, 10), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0),
        relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
        embed_dropout=0.0, attn_mask=True, output_dim=1)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    masks = build_masks(spec, full_active_config(spec))
    B, T = 4, 1
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
          for d in spec.orig_dimensions]

    def fn(p, xs0, xs1):
        return supernet_apply(spec, p, masks, [xs0, xs1], train=False)

    xla = _xla_flops(fn, params, *xs)
    fl = F.train_step_flops(spec, None, B, [T, T], train=False)
    assert fl.fwd <= xla * 1.02
    assert xla <= fl.fwd * 1.6  # small dims -> elementwise share is larger
