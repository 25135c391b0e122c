"""bf16 compute-policy tests (ModelSpec.compute_dtype="bfloat16").

Tolerance story (documented here, referenced from config.py):
  * the policy casts params/inputs/masks to bf16 at the supernet_apply
    boundary; softmax, LayerNorm moments and the final predictions stay f32;
  * bf16 has ~3 decimal digits, so eval forwards agree with f32 to a few
    percent RELATIVE — the parity suite (parent==subnet, torch parity) runs
    the default f32 policy where agreement is ~1e-7;
  * gradients come back f32 (astype's VJP) and must be finite and close in
    direction (cosine similarity) rather than elementwise-equal.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import (
    ActiveConfig,
    ModelSpec,
    build_masks,
    full_active_config,
    gen_active_cross,
)
from multimodal_transformer_robustness_tpu.models import init_supernet, supernet_apply


def _spec(**kw):
    base = dict(
        modality_set=("t", "a", "v"), orig_dimensions=(12, 10, 8),
        dimension=8, num_heads=2, head_dim=4, layers_single_attn=2,
        layers_cross_attn=2, layers_self_attn=1,
        attn_dropout=(0.1, 0.1, 0.0, 0.0), relu_dropout=0.1,
        res_dropout=0.1, out_dropout=0.1, embed_dropout=0.3,
        attn_mask=True, output_dim=1, header_overrides={"t": "rnn"})
    base.update(kw)
    return ModelSpec(**base)


@pytest.fixture(scope="module")
def setup():
    spec32 = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec32)
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.standard_normal((4, 6, d)), jnp.float32)
              for d in spec32.orig_dimensions]
    return spec32, params, frozen, inputs


def test_bf16_eval_close_to_f32(setup):
    spec32, params, frozen, inputs = setup
    spec16 = dataclasses.replace(spec32, compute_dtype="bfloat16")
    masks = build_masks(spec32, full_active_config(spec32))
    o32 = supernet_apply(spec32, params, masks, inputs, frozen=frozen)
    o16 = supernet_apply(spec16, params, masks, inputs, frozen=frozen)
    assert o16.dtype == jnp.float32  # predictions come back f32
    denom = np.maximum(np.abs(np.asarray(o32)), 1e-2)
    rel = np.abs(np.asarray(o16) - np.asarray(o32)) / denom
    assert rel.max() < 0.05, f"bf16 eval deviates {rel.max():.3f} rel"


def test_bf16_elastic_config_finite_and_close(setup):
    spec32, params, frozen, inputs = setup
    spec16 = dataclasses.replace(spec32, compute_dtype="bfloat16")
    r = np.random.default_rng(3)
    am = [0, 2]
    ac, aco = gen_active_cross(spec32, am, rng=r)
    cfg = ActiveConfig(
        active_modality=am, active_cross=ac, active_cross_output=aco,
        active_single_attn_layer_num=[1, 0, 2], active_self_attn_layer_num=1,
        active_hybrid_attn_layer_num=1, active_dimension=spec32.dimension,
        active_head_num=1, active_head_dim=3)
    masks = build_masks(spec32, cfg)
    o32 = np.asarray(supernet_apply(spec32, params, masks, inputs, frozen=frozen))
    o16 = np.asarray(supernet_apply(spec16, params, masks, inputs, frozen=frozen))
    assert np.isfinite(o16).all()
    rel = np.abs(o16 - o32) / np.maximum(np.abs(o32), 1e-2)
    assert rel.max() < 0.05


def test_bf16_train_grads_f32_finite_and_aligned(setup):
    spec32, params, frozen, inputs = setup
    spec16 = dataclasses.replace(spec32, compute_dtype="bfloat16")
    masks = build_masks(spec32, full_active_config(spec32))
    labels = jnp.ones((4, 1), jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss(p, spec):
        preds = supernet_apply(spec, p, masks, inputs, frozen=frozen,
                               train=True, rng=key)
        return jnp.mean(jnp.abs(preds - labels))

    l32, g32 = jax.value_and_grad(lambda p: loss(p, spec32))(params)
    l16, g16 = jax.value_and_grad(lambda p: loss(p, spec16))(params)
    # losses close; same dropout draws (same key, same graph shape)
    assert abs(float(l16) - float(l32)) / max(float(l32), 1e-3) < 0.05
    flat32 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
    flat16 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g16)])
    assert flat16.dtype == jnp.float32  # master-grad dtype
    assert bool(jnp.isfinite(flat16).all())
    cos = float(jnp.vdot(flat32, flat16)
                / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12))
    assert cos > 0.99, f"bf16 gradient direction diverged: cos={cos:.4f}"


def test_precast_feed_bit_identical(setup):
    """Feeding float modality inputs ALREADY cast to the compute dtype (the
    device-resident pipeline's store_dtype="bfloat16" and the r5 bench/host
    feed, data/loaders.cast_float_inputs) is bit-identical to feeding f32:
    supernet_apply's boundary cast is the first op to touch these inputs,
    so cast(bf16(x)) == bf16(x) exactly — forward AND gradients."""
    spec32, params, frozen, inputs = setup
    spec16 = dataclasses.replace(spec32, compute_dtype="bfloat16")
    masks = build_masks(spec32, full_active_config(spec32))
    pre = [x.astype(jnp.bfloat16) for x in inputs]
    o_f32feed = supernet_apply(spec16, params, masks, inputs, frozen=frozen)
    o_prefeed = supernet_apply(spec16, params, masks, pre, frozen=frozen)
    np.testing.assert_array_equal(np.asarray(o_f32feed),
                                  np.asarray(o_prefeed))

    labels = jnp.ones((4, 1), jnp.float32)
    key = jax.random.PRNGKey(3)

    def loss(p, feed):
        preds = supernet_apply(spec16, p, masks, feed, frozen=frozen,
                               train=True, rng=key)
        return jnp.mean(jnp.abs(preds - labels))

    g_a = jax.grad(lambda p: loss(p, inputs))(params)
    g_b = jax.grad(lambda p: loss(p, pre))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cast_float_inputs_dataset_helper():
    """data/loaders.cast_float_inputs: float arrays cast in place (plain and
    CachedTextDataset-wrapped), integer token stacks untouched."""
    import ml_dtypes

    from multimodal_transformer_robustness_tpu.data.loaders import (
        ArrayDataset, cast_float_inputs)

    rng = np.random.default_rng(0)
    text = rng.integers(0, 50, (8, 3, 6))
    audio = rng.standard_normal((8, 6, 5)).astype(np.float32)
    ds = ArrayDataset([text, audio], rng.standard_normal((8, 1)),
                      dims=[6, 5], seq_len=6)
    cast_float_inputs(ds, ml_dtypes.bfloat16)
    assert ds.inputs[0].dtype == text.dtype
    assert ds.inputs[1].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        ds.inputs[1], audio.astype(ml_dtypes.bfloat16))
    assert ds.labels.dtype == np.float64 or ds.labels.dtype == np.float32
