"""Model-level parent/subnet equivalence — the reference's behavioural
contract (SURVEY.md §4): an elastic parent under ``set_active(cfg)`` computes
exactly what the extracted dense subnet computes, for every random
configuration.  Reference oracle harnesses: dynamic_multihead_attention.py:
370-388 and dynamic_models2.py:522-531; here it is a real property test."""

import functools

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
from multimodal_transformer_robustness_tpu.models import (
    extract_subnet,
    init_supernet,
    subnet_apply,
    supernet_apply,
)

ATOL = 5e-5


def tiny_spec(**kw):
    base = dict(
        modality_set=("t", "a", "v"), orig_dimensions=(12, 10, 8), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=2, layers_cross_attn=2,
        layers_self_attn=1, attn_dropout=(0.1, 0.1, 0.0, 0.0), relu_dropout=0.1,
        res_dropout=0.1, out_dropout=0.1, embed_dropout=0.3, attn_mask=True,
        output_dim=1, header_overrides={"t": "rnn"})
    base.update(kw)
    return ModelSpec(**base)


@pytest.fixture(scope="module")
def model():
    spec = tiny_spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    fwd = jax.jit(functools.partial(supernet_apply, spec),
                  static_argnames=("train",))
    rng = np.random.default_rng(7)
    inputs = [jnp.asarray(rng.standard_normal((3, 5, d)), jnp.float32)
              for d in spec.orig_dimensions]
    return spec, params, fwd, inputs


def _random_cfg(spec, r):
    am = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]][r.integers(0, 7)]
    ac, aco = gen_active_cross(spec, am, rng=r)
    return ActiveConfig(
        active_modality=am, active_cross=ac, active_cross_output=aco,
        active_single_attn_layer_num=list(r.integers(0, spec.layers_single_attn + 1, size=3)),
        active_self_attn_layer_num=int(r.integers(0, spec.layers_self_attn + 1)),
        active_hybrid_attn_layer_num=int(r.integers(1, spec.layers_cross_attn + 1)),
        active_dimension=int(r.integers(1, spec.ffn_dim + 1)),
        active_head_num=int(r.integers(1, spec.num_heads + 1)),
        active_head_dim=int(r.integers(1, spec.head_dim + 1)))


def test_full_config_parent_equals_subnet(model):
    spec, params, fwd, inputs = model
    cfg = full_active_config(spec)
    o_parent = fwd(params, build_masks(spec, cfg), inputs)
    o_sub = subnet_apply(extract_subnet(spec, params, cfg), inputs)
    np.testing.assert_allclose(np.asarray(o_parent), np.asarray(o_sub), atol=ATOL)


@pytest.mark.parametrize("seed", range(6))
def test_random_config_parent_equals_subnet(model, seed):
    spec, params, fwd, inputs = model
    r = np.random.default_rng(seed + 50)
    cfg = _random_cfg(spec, r)
    o_parent = fwd(params, build_masks(spec, cfg), inputs)
    o_sub = subnet_apply(extract_subnet(spec, params, cfg),
                         [inputs[i] for i in cfg.active_modality])
    np.testing.assert_allclose(np.asarray(o_parent), np.asarray(o_sub), atol=ATOL)


def test_no_retrace_across_configs(model):
    spec, params, fwd, inputs = model
    r = np.random.default_rng(0)
    _ = fwd(params, build_masks(spec, full_active_config(spec)), inputs)
    n0 = fwd._cache_size()
    for seed in range(4):
        rr = np.random.default_rng(seed)
        _ = fwd(params, build_masks(spec, _random_cfg(spec, rr)), inputs)
    assert fwd._cache_size() == n0, "config changes must not retrace the step"


def test_branch_off_is_finite(model):
    spec, params, fwd, inputs = model
    cfg = ActiveConfig(
        active_modality=[1], active_cross=[[], [], []],
        active_cross_output=[[], ["a"], []],
        active_single_attn_layer_num=[0, 2, 0], active_self_attn_layer_num=1,
        active_hybrid_attn_layer_num=2, active_dimension=8,
        active_head_num=2, active_head_dim=4)
    out = fwd(params, build_masks(spec, cfg), inputs)
    assert bool(jnp.isfinite(out).all())


def test_train_mode_runs(model):
    spec, params, fwd, inputs = model
    out = fwd(params, build_masks(spec, full_active_config(spec)), inputs,
              train=True, rng=jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(out).all())


def test_all_steps_shape():
    spec = tiny_spec(all_steps=True, modality_set=("a", "v"),
                     orig_dimensions=(6, 4), attn_dropout=(0.0, 0.0, 0.0),
                     header_overrides=None, output_dim=2)
    params, _ = init_supernet(jax.random.PRNGKey(1), spec)
    inputs = [jnp.zeros((2, 4, d), jnp.float32) for d in spec.orig_dimensions]
    out = supernet_apply(spec, params, build_masks(spec, full_active_config(spec)), inputs)
    # headers collapse T to 1; all_steps keeps the (length-1) sequence axis
    assert out.shape == (2, 1, 2)
