"""Exact training resume: save/restore of the FULL training state
(optimizer moments, plateau scheduler, host+device RNG streams, curve,
best-valid) continues a run bit-exactly.

The reference saves only the pickled model and restarts optimization on
``--pretrain`` (train.py:31-33, 508-511); exact resume is a deliberate
beyond-reference capability (checkpoint.save/restore_training_state).
"""

import dataclasses

import jax
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import ModelSpec
from multimodal_transformer_robustness_tpu.checkpoint import (
    restore_training_state,
    save_training_state,
)
from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
from multimodal_transformer_robustness_tpu.models import init_supernet
from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer

from _synth import synth_avmnist


def _spec():
    return ModelSpec(
        modality_set=("i", "A"), orig_dimensions=(28, 112), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.1, 0.0, 0.0), relu_dropout=0.1,
        res_dropout=0.1, out_dropout=0.1, embed_dropout=0.1, attn_mask=True,
        output_dim=10)


def _hp(num_epochs, experiment_type="random_sample",
        modality_pool=([0], [1], [0, 1])):
    return TrainHParams(batch_size=16, lr=2e-3, clip=1.0,
                        num_epochs=num_epochs, when=5,
                        experiment_type=experiment_type,
                        modality_pool=[list(p) for p in modality_pool]
                        if modality_pool else None,
                        criterion="CrossEntropyLoss", dataset="avmnist",
                        log_interval=1000)


def _fit(trainer, data, start_epoch=1, epoch_fn=None):
    train_ds, valid_ds, test_ds = data
    train_iter = BatchIterator(train_ds, 16, shuffle=True, seed=0)
    train_iter.set_epoch(start_epoch - 1)
    trainer.fit(train_iter, BatchIterator(valid_ds, 16),
                BatchIterator(test_ds, 16), epoch_fn=epoch_fn,
                start_epoch=start_epoch)
    return trainer


# test_single / baseline_ia carry a non-full mask config across the epoch
# boundary (fit sets eval_masks / leaves the last sampled config active) —
# the resume state must include it (ADVICE r2 #1)
@pytest.mark.parametrize("etype,pool", [
    ("random_sample", ([0], [1], [0, 1])),
    ("test_single", ([0, 1], [1])),
    ("baseline_ia", None),
])
def test_resume_is_bit_exact(tmp_path, etype, pool):
    spec = _spec()
    data = (synth_avmnist(48, seed=0), synth_avmnist(24, seed=1),
            synth_avmnist(24, seed=2))
    path = str(tmp_path / "ck")

    # straight 4-epoch run
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    straight = _fit(Trainer(spec, params, frozen, _hp(4, etype, pool)), data)

    # 2 epochs, save at every epoch end, then a FRESH trainer restores and
    # finishes (fresh params/optimizer as a cold process would have)
    params2, frozen2 = init_supernet(jax.random.PRNGKey(0), spec)
    _fit(Trainer(spec, params2, frozen2, _hp(2, etype, pool)), data,
         epoch_fn=lambda tr, ep: save_training_state(path, tr))

    params3, frozen3 = init_supernet(jax.random.PRNGKey(7), spec)  # different
    resumed = Trainer(spec, params3, frozen3, _hp(4, etype, pool))
    start = restore_training_state(path, resumed)
    assert start == 3
    _fit(resumed, data, start_epoch=start)

    assert straight.training_curve == resumed.training_curve
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.opt_state),
                    jax.tree.leaves(resumed.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert straight.scheduler.lr == resumed.scheduler.lr
    assert straight.best_valid == resumed.best_valid


def test_training_state_roundtrip_fields():
    """Scheduler / host-RNG / curve state survive the round trip, and the
    restored host stream continues exactly where the saved one stood."""
    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    tr = Trainer(spec, params, frozen, _hp(1))
    tr.scheduler.lr = 1.25e-4
    tr.scheduler.best = 0.5
    tr.scheduler.num_bad = 3
    tr.best_valid = 0.75
    tr.training_curve = [[0.1, 0.2], [0.3, 0.4]]
    tr.rng.standard_normal(5)          # advance the host stream
    arrays, meta = tr.training_state()  # capture HERE
    draws_expect = tr.rng.standard_normal(4).copy()

    tr2 = Trainer(spec, params, frozen, _hp(1))
    tr2.load_training_state(arrays, meta)
    np.testing.assert_array_equal(tr2.rng.standard_normal(4), draws_expect)
    assert tr2.scheduler.lr == 1.25e-4
    assert tr2.scheduler.best == 0.5
    assert tr2.scheduler.num_bad == 3
    assert tr2.best_valid == 0.75
    assert tr2.training_curve == [[0.1, 0.2], [0.3, 0.4]]


def test_restore_without_manifest(tmp_path):
    """Checkpoints saved before the ``saved_keys`` manifest existed restore
    via orbax's own tree metadata — carry_masks included, no try/except
    probe that could mask a real restore error."""
    import json

    from multimodal_transformer_robustness_tpu import build_masks
    from multimodal_transformer_robustness_tpu.config import ActiveConfig, full_active_config

    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    tr = Trainer(spec, params, frozen, _hp(2, "test_single", ([0, 1], [1])))
    # a non-default carried config (what test_single trains under from
    # epoch 2 on) must survive the manifest-less round trip
    cfg = full_active_config(spec)
    cfg.active_cross_output = [[], ["A"]]
    tr._carry_masks = jax.tree.map(np.asarray, build_masks(spec, cfg))
    path = str(tmp_path / "ck")
    save_training_state(path, tr)
    meta = json.load(open(path + ".train.json"))
    meta.pop("saved_keys")  # simulate the pre-manifest format
    json.dump(meta, open(path + ".train.json", "w"))

    params2, frozen2 = init_supernet(jax.random.PRNGKey(7), spec)
    tr2 = Trainer(spec, params2, frozen2, _hp(2, "test_single", ([0, 1], [1])))
    restore_training_state(path, tr2)
    assert tr2._carry_masks is not None
    for a, b in zip(jax.tree.leaves(tr._carry_masks),
                    jax.tree.leaves(tr2._carry_masks)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refit_starts_from_full_topology():
    """A SECOND fit() on an already-fitted Trainer must not inherit the
    previous run's carried mask config (fit leaves _carry_masks set for
    end-of-run checkpointing); only a resume (start_epoch > 1) does."""
    from multimodal_transformer_robustness_tpu import build_masks
    from multimodal_transformer_robustness_tpu.config import full_active_config

    spec = _spec()
    data = (synth_avmnist(32, seed=0), synth_avmnist(16, seed=1),
            synth_avmnist(16, seed=2))
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    tr = Trainer(spec, params, frozen, _hp(1, "test_single", ([0, 1], [1])))
    _fit(tr, data)  # test_single leaves _carry_masks = eval_masks
    assert tr._carry_masks is not None

    seen = []
    orig = tr.train_epoch

    def spy(it, masks, epoch):
        seen.append(masks)
        return orig(it, masks, epoch)

    tr.train_epoch = spy
    _fit(tr, data)  # fresh fit: epoch 1 must train under the FULL topology
    full = build_masks(spec, full_active_config(spec))
    for a, b in zip(jax.tree.leaves(seen[0]), jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_roundtrips_identically(tmp_path):
    """save_training_state(block=False) (cli --async_ckpt) commits the same
    checkpoint a blocking save would; restore waits for in-flight writes."""
    from multimodal_transformer_robustness_tpu.checkpoint import wait_for_saves

    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    tr = Trainer(spec, params, frozen, _hp(1))
    tr.rng.standard_normal(3)
    tr.training_curve = [[0.5, 0.6]]

    p_sync = str(tmp_path / "sync")
    p_async = str(tmp_path / "async")
    save_training_state(p_sync, tr)
    save_training_state(p_async, tr, block=False)
    # restore_training_state itself waits for the in-flight write
    got = []
    for p in (p_sync, p_async):
        params2, frozen2 = init_supernet(jax.random.PRNGKey(9), spec)
        tr2 = Trainer(spec, params2, frozen2, _hp(1))
        restore_training_state(p, tr2)
        got.append(tr2)
    wait_for_saves()
    for a, b in zip(jax.tree.leaves((got[0].params, got[0].opt_state,
                                     got[0]._carry_masks, got[0]._key)),
                    jax.tree.leaves((got[1].params, got[1].opt_state,
                                     got[1]._carry_masks, got[1]._key))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got[0].training_curve == got[1].training_curve == [[0.5, 0.6]]
