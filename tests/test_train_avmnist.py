"""End-to-end minimum slice (SURVEY.md §7): avMNIST-shaped test_single /
random_sample training + missing-modality sweep on synthetic data."""

import jax
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import ModelSpec, build_masks, full_active_config
from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
from multimodal_transformer_robustness_tpu.models import init_supernet
from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
from multimodal_transformer_robustness_tpu.train.sweep import (
    masking_inputs_sweep,
    missing_modality_sweep,
)

from _synth import synth_avmnist


def small_spec():
    return ModelSpec(
        modality_set=("i", "A"), orig_dimensions=(28, 112), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.1, 0.0, 0.0), relu_dropout=0.1,
        res_dropout=0.1, out_dropout=0.1, embed_dropout=0.1, attn_mask=True,
        output_dim=10)


@pytest.fixture(scope="module")
def setup():
    spec = small_spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    train_ds = synth_avmnist(48, seed=0)
    valid_ds = synth_avmnist(24, seed=1)
    test_ds = synth_avmnist(24, seed=2)
    hp = TrainHParams(batch_size=16, lr=2e-3, clip=1.0, num_epochs=2, when=5,
                      experiment_type="random_sample",
                      modality_pool=[[0], [1], [0, 1]],
                      criterion="CrossEntropyLoss", dataset="avmnist",
                      log_interval=1000)
    trainer = Trainer(spec, params, frozen, hp)
    return spec, trainer, train_ds, valid_ds, test_ds


def test_train_runs_and_improves(setup):
    spec, trainer, train_ds, valid_ds, test_ds = setup
    train_iter = BatchIterator(train_ds, 16, shuffle=True, seed=0)
    masks = build_masks(spec, full_active_config(spec))
    losses = []
    for epoch in range(3):
        loss, masks = trainer.train_epoch(train_iter, masks, epoch)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not improve: {losses}"


def test_evaluate_and_zero_fill(setup):
    spec, trainer, _, valid_ds, _ = setup
    loader = BatchIterator(valid_ds, 16)
    masks = build_masks(spec, full_active_config(spec))
    acc, preds, truths = trainer.evaluate(loader, masks, [0, 1])
    assert preds.shape == (24, 10) and truths.shape == (24,)
    assert 0.0 <= acc <= 1.0
    # zero-filling one modality changes predictions but stays finite
    acc0, preds0, _ = trainer.evaluate(loader, masks, [0])
    assert np.isfinite(preds0).all()
    assert not np.allclose(preds, preds0)


def test_missing_modality_sweep_batched(setup):
    spec, trainer, _, valid_ds, test_ds = setup
    res = missing_modality_sweep(
        trainer, BatchIterator(valid_ds, 16), BatchIterator(test_ds, 16),
        quiet=True)
    # subsets: (0,), (1,), (0,1)
    assert set(res.keys()) == {(0,), (1,), (0, 1)}
    for v in res.values():
        assert np.isfinite(v["valid_acc"]) and np.isfinite(v["test_acc"])
    # the 2-modality subset swept 13 topologies x 3 depth combos = 39 configs
    cfg = res[(0, 1)]["best_cfg"]
    assert cfg.active_modality == [0, 1]


def test_masking_inputs_sweep(setup):
    spec, trainer, _, _, test_ds = setup
    res = masking_inputs_sweep(trainer, BatchIterator(test_ds, 16), quiet=True)
    assert set(res.keys()) == {(), (0,), (1,), (0, 1)}


def test_fit_one_epoch(setup):
    spec, trainer, train_ds, valid_ds, test_ds = setup
    trainer.hp.num_epochs = 1
    saved = []
    curve = trainer.fit(
        BatchIterator(train_ds, 16, shuffle=True, seed=1),
        BatchIterator(valid_ds, 16), BatchIterator(test_ds, 16),
        save_fn=lambda p, e, v: saved.append(e))
    assert len(curve) >= 1
    assert saved, "best-val checkpoint hook never fired"


def test_sweep_batched_equals_serial_eval(setup):
    """The lax.map whole-grid eval must produce the same predictions as the
    single-config eval step, config by config."""
    import jax
    import jax.numpy as jnp

    from multimodal_transformer_robustness_tpu import (
        ActiveConfig, build_masks, gen_active_cross)
    from multimodal_transformer_robustness_tpu.masks import stack_masks

    spec, trainer, _, valid_ds, _ = setup
    rng = np.random.default_rng(3)
    cfgs = []
    for _ in range(5):
        am = [[0], [1], [0, 1]][rng.integers(0, 3)]
        ac, aco = gen_active_cross(spec, am, rng=rng)
        cfgs.append(ActiveConfig(
            active_modality=am, active_cross=ac, active_cross_output=aco,
            active_single_attn_layer_num=list(rng.integers(0, 2, size=2)),
            active_self_attn_layer_num=1, active_hybrid_attn_layer_num=1,
            active_dimension=8, active_head_num=2, active_head_dim=4))
    masks_list = [build_masks(spec, c) for c in cfgs]
    batch = next(iter(BatchIterator(valid_ds, 16)))
    inputs = [jnp.asarray(x) for x in batch.inputs]
    flags = jnp.ones((2,), jnp.float32)

    trainer.cfg_chunk = 2  # exercise the device-side chunking with remainder
    stacked = jax.tree.map(jnp.asarray, stack_masks(masks_list))
    batched = np.asarray(trainer.eval_step_sweep(
        trainer.params, stacked, inputs, flags))
    for k, m in enumerate(masks_list):
        single = np.asarray(trainer.eval_step(
            trainer.params, jax.tree.map(jnp.asarray, m), inputs, flags))
        np.testing.assert_allclose(batched[k], single, atol=2e-5)
