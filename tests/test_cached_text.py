"""Cached-text pipeline (train/features.py) == online frozen-BERT pipeline.

The reference recomputes its frozen BERT inside every forward
(dynamic_models2.py:46-55); caching the features is exact because the
extractor is deterministic.  These tests pin the two invariants:

  * full-modality forwards agree between the token pipeline and the
    feature pipeline (train and eval mode);
  * missing-text eval agrees: the online path zero-fills the TOKEN stack and
    runs BERT on zeros (train.py:218 semantics); the cached path substitutes
    the precomputed BERT(zero-tokens) row — NOT zero features.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_transformer_robustness_tpu import ModelSpec
from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
from multimodal_transformer_robustness_tpu.models import init_supernet
from multimodal_transformer_robustness_tpu.models.bert import tiny_bert_config
from multimodal_transformer_robustness_tpu.train.features import (
    CachedTextDataset,
    find_text_slot,
)
from multimodal_transformer_robustness_tpu.train.loop import (
    Trainer,
    TrainHParams,
)


def _spec():
    return ModelSpec(
        modality_set=("t", "a"), orig_dimensions=(6, 4), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1)


class _TextDataset:
    """gather-style dataset with a [3, N, L] token stack (MOSEI layout)."""

    def __init__(self, n=12, L=7, T=5, vocab=64, seed=0):
        rng = np.random.default_rng(seed)
        self.text = np.stack([rng.integers(1, vocab, (n, L)),
                              np.zeros((n, L), np.int64),
                              np.ones((n, L), np.int64)])
        self.audio = rng.standard_normal((n, T, 4)).astype(np.float32)
        self.labels = rng.standard_normal((n, 1)).astype(np.float32)

    def __len__(self):
        return self.text.shape[1]

    def gather(self, idx):
        return [self.text[:, idx], self.audio[idx]], self.labels[idx]


def _trainers():
    spec = _spec()
    bert_cfg = tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)
    ds = _TextDataset()
    cached = CachedTextDataset(ds, frozen, bert_cfg, batch_size=5)
    hp = TrainHParams(batch_size=4, optim="SGD", criterion="L1Loss", seed=0,
                      dataset="mosei_senti")
    mk = lambda: Trainer(spec, jax.tree.map(jnp.copy, params), frozen, hp,
                         bert_cfg=bert_cfg)
    return spec, ds, cached, mk


def test_find_text_slot():
    ds = _TextDataset()
    inputs, _ = ds.gather(np.arange(3))
    assert find_text_slot(inputs) == 0
    assert find_text_slot([inputs[1]]) is None


def test_cached_features_match_online_eval():
    spec, ds, cached, mk = _trainers()
    online, off = mk(), mk()
    from multimodal_transformer_robustness_tpu import (build_masks,
                                                       full_active_config)

    masks = build_masks(spec, full_active_config(spec))
    lo_on = BatchIterator(ds, 4)
    lo_off = BatchIterator(cached, 4)
    for active in ([0, 1], [1], [0]):
        a_on, p_on, t_on = online.evaluate(lo_on, masks, active)
        a_off, p_off, t_off = off.evaluate(lo_off, masks, active)
        np.testing.assert_allclose(p_off, p_on, atol=2e-5,
                                   err_msg=f"active={active}")
        np.testing.assert_array_equal(t_off, t_on)


def test_cached_zero_row_is_bert_of_zeros_not_zeros():
    _, _, cached, _ = _trainers()
    # BERT(zero tokens) is a non-trivial feature row; substituting literal
    # zeros would diverge from the reference's zero-filled-token eval
    assert np.abs(cached.zero_row).max() > 1e-3
    rows = cached.zero_fill_rows()
    assert set(rows) == {0} and rows[0].shape == cached.features.shape[1:]


def test_cached_train_step_matches_online():
    spec, ds, cached, mk = _trainers()
    online, off = mk(), mk()
    from multimodal_transformer_robustness_tpu import (build_masks,
                                                       full_active_config)

    masks = jax.tree.map(jnp.asarray,
                         build_masks(spec, full_active_config(spec)))
    idx = np.arange(4)
    (in_on, lab), (in_off, _) = ds.gather(idx), cached.gather(idx)
    valid = jnp.ones((4,), jnp.float32)
    key = jax.random.PRNGKey(7)
    _, _, loss_on = online.train_step(
        online.params, online.opt_state, masks,
        [jnp.asarray(x) for x in in_on], jnp.asarray(lab), valid, key)
    _, _, loss_off = off.train_step(
        off.params, off.opt_state, masks,
        [jnp.asarray(x) for x in in_off], jnp.asarray(lab), valid, key)
    np.testing.assert_allclose(float(loss_off), float(loss_on), rtol=1e-5)


def test_cached_dataset_surface():
    _, ds, cached, _ = _trainers()
    assert len(cached) == len(ds)
    assert cached.features.shape[0] == len(ds)
    inputs, labels = cached.gather(np.asarray([3, 1]))
    assert inputs[0].shape == (2,) + cached.features.shape[1:]
    assert inputs[0].dtype == np.float32
    np.testing.assert_allclose(inputs[0], cached.features[[3, 1]])


def test_bf16_policy_exact():
    """Under the bfloat16 compute policy the precompute runs BERT with the
    SAME bf16-cast frozen params as the online path (f32 storage of bf16
    values is lossless), so the two pipelines stay BIT-equal — previously
    the extractor ran f32 and only the final features were cast (ADVICE
    r2)."""
    from multimodal_transformer_robustness_tpu import (build_masks,
                                                       full_active_config)
    from multimodal_transformer_robustness_tpu.models.bert import (
        tiny_bert_config)

    spec = dataclasses.replace(_spec(), compute_dtype="bfloat16")
    bert_cfg = tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)
    ds = _TextDataset()
    cached = CachedTextDataset(ds, frozen, bert_cfg, batch_size=5,
                               compute_dtype="bfloat16")
    hp = TrainHParams(batch_size=4, optim="SGD", criterion="L1Loss", seed=0,
                      dataset="mosei_senti")
    mk = lambda d: Trainer(spec, jax.tree.map(jnp.copy, params), frozen, hp,
                           bert_cfg=bert_cfg,
                           zero_fill_rows=d.zero_fill_rows()
                           if isinstance(d, CachedTextDataset) else None)
    online, off = mk(ds), mk(cached)
    masks = build_masks(spec, full_active_config(spec))
    for active in ([0, 1], [1], [0]):
        _, p_on, t_on = online.evaluate(BatchIterator(ds, 4), masks, active)
        _, p_off, t_off = off.evaluate(BatchIterator(cached, 4), masks,
                                       active)
        np.testing.assert_array_equal(p_off, p_on,
                                      err_msg=f"active={active}")
        np.testing.assert_array_equal(t_off, t_on)
