"""--batch_chunk gradient accumulation: chunked == unchunked train step.

The reference defines the flag but never reads it (main.py:69); ours
implements real accumulation with weighted-sum semantics that reproduce the
unchunked validity-weighted mean exactly (rtol ~ f32 reassociation noise).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_transformer_robustness_tpu import (
    ModelSpec,
    build_masks,
    full_active_config,
)
from multimodal_transformer_robustness_tpu.models import init_supernet
from multimodal_transformer_robustness_tpu.train.loop import Trainer, TrainHParams


def _spec():
    return ModelSpec(
        modality_set=("t", "a"), orig_dimensions=(6, 4), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1, header_overrides={"t": "rnn"})


def test_chunked_equals_unchunked(monkeypatch):
    # the reference quirk gives cross stacks idx>0 a hard-coded 0.1
    # TRAIN-mode attention dropout (dynamic_models2.py:201-207); chunks draw
    # different dropout rngs, so the exactness oracle needs it off.  The
    # with-dropout behavior is covered by test_chunked_with_dropout_close.
    monkeypatch.setattr(ModelSpec, "attn_dropout_for_cross",
                        lambda self, idx: 0.0)
    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    masks = jax.tree.map(jnp.asarray, build_masks(spec, full_active_config(spec)))
    rng = np.random.default_rng(0)
    B, T = 8, 5
    inputs = [jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
              for d in spec.orig_dimensions]
    labels = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    # a padded tail batch: last 2 rows invalid — the weighting must ignore
    # them identically in both paths
    valid = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    key = jax.random.PRNGKey(3)

    hp = TrainHParams(batch_size=B, lr=1e-3, optim="SGD", clip=0.5,
                      criterion="L1Loss", seed=0, batch_chunk=1)
    results = {}
    for nchunk in (1, 2, 4):
        # fresh param copies per trainer: train_step donates its buffers
        p_copy = jax.tree.map(lambda x: x.copy(), params)
        tr = Trainer(spec, p_copy, frozen,
                     dataclasses.replace(hp, batch_chunk=nchunk))
        p, o, loss = tr.train_step(tr.params, tr.opt_state, masks, inputs,
                                   labels, valid, key)
        results[nchunk] = (float(loss), jax.tree.leaves(p))

    base_loss, base_leaves = results[1]
    for nchunk in (2, 4):
        loss, leaves = results[nchunk]
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6,
                                   err_msg=f"loss, chunks={nchunk}")
        for a, b in zip(base_leaves, leaves):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-8,
                                       err_msg=f"params, chunks={nchunk}")


def test_chunked_with_dropout_close():
    """With the cross-stack 0.1 train-dropout quirk ACTIVE, chunked training
    is still the same estimator — losses agree loosely (different dropout
    draws per chunk are expected and correct)."""
    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    masks = jax.tree.map(jnp.asarray, build_masks(spec, full_active_config(spec)))
    rng = np.random.default_rng(0)
    B, T = 8, 5
    inputs = [jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
              for d in spec.orig_dimensions]
    labels = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    valid = jnp.ones((B,), jnp.float32)
    hp = TrainHParams(batch_size=B, lr=1e-3, optim="SGD", clip=0.5,
                      criterion="L1Loss", seed=0)
    out = {}
    for nchunk in (1, 4):
        p_copy = jax.tree.map(lambda x: x.copy(), params)
        tr = Trainer(spec, p_copy, frozen,
                     dataclasses.replace(hp, batch_chunk=nchunk))
        _, _, loss = tr.train_step(tr.params, tr.opt_state, masks, inputs,
                                   labels, valid, jax.random.PRNGKey(3))
        out[nchunk] = float(loss)
    assert abs(out[4] - out[1]) / abs(out[1]) < 0.15


def test_chunked_text_layout(monkeypatch):
    """[3, B, L] text inputs chunk on dim 1, not dim 0."""
    monkeypatch.setattr(ModelSpec, "attn_dropout_for_cross",
                        lambda self, idx: 0.0)
    spec = _spec()  # 't' overridden to rnn; use a real bert header instead
    spec = dataclasses.replace(spec, header_overrides=None)
    from multimodal_transformer_robustness_tpu.models.bert import tiny_bert_config

    bert_cfg = tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(1), spec,
                                   bert_cfg=bert_cfg)
    masks = jax.tree.map(jnp.asarray, build_masks(spec, full_active_config(spec)))
    rng = np.random.default_rng(1)
    B, T, L = 4, 5, 6
    text = jnp.asarray(np.stack([rng.integers(0, bert_cfg.vocab_size, (B, L)),
                                 np.ones((B, L), np.int64),
                                 np.zeros((B, L), np.int64)]))
    audio = jnp.asarray(rng.standard_normal((B, T, 4)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    valid = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(5)

    hp = TrainHParams(batch_size=B, lr=1e-3, optim="SGD", clip=0.5,
                      criterion="L1Loss", seed=0)
    out = {}
    for nchunk in (1, 2):
        p_copy = jax.tree.map(lambda x: x.copy(), params)
        tr = Trainer(spec, p_copy, frozen,
                     dataclasses.replace(hp, batch_chunk=nchunk),
                     bert_cfg=bert_cfg)
        _, _, loss = tr.train_step(tr.params, tr.opt_state, masks,
                                   [text, audio], labels, valid, key)
        out[nchunk] = float(loss)
    np.testing.assert_allclose(out[2], out[1], rtol=1e-6)
