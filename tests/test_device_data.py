"""Device-resident input pipeline (data/device.py): DeviceBatchIterator is a
drop-in for BatchIterator — identical seeded epoch order, tail padding, and
batch contents, with the gather on device."""

import jax.numpy as jnp
import numpy as np

from multimodal_transformer_robustness_tpu.data import (
    ArrayDataset,
    BatchIterator,
    DeviceBatchIterator,
)
from multimodal_transformer_robustness_tpu.data.device import materialize


class _TextDataset:
    """gather-style dataset with the [3, N, L] MOSEI text layout."""

    def __init__(self, n=11, L=6, T=4, seed=0):
        rng = np.random.default_rng(seed)
        self.text = np.stack([rng.integers(1, 50, (n, L)),
                              np.zeros((n, L), np.int64),
                              np.ones((n, L), np.int64)])
        self.audio = rng.standard_normal((n, T, 5)).astype(np.float32)
        self.labels = rng.standard_normal((n, 1)).astype(np.float32)

    def __len__(self):
        return self.text.shape[1]

    def gather(self, idx):
        return [self.text[:, idx], self.audio[idx]], self.labels[idx]


def _array_ds(n=13, seed=1):
    rng = np.random.default_rng(seed)
    xs = [rng.standard_normal((n, 4, d)).astype(np.float32) for d in (6, 3)]
    labels = rng.standard_normal((n, 1)).astype(np.float32)
    return ArrayDataset(xs, labels, dims=[6, 3], seq_len=4)


def test_materialize_text_layout():
    ds = _TextDataset()
    inputs, labels = materialize(ds, chunk=4)
    np.testing.assert_array_equal(inputs[0], ds.text)
    np.testing.assert_allclose(inputs[1], ds.audio)
    np.testing.assert_allclose(labels, ds.labels)


def _assert_same_batches(ds, bs, shuffle, seed, text_slots=()):
    host = BatchIterator(ds, bs, shuffle=shuffle, seed=seed)
    dev = DeviceBatchIterator(ds, bs, shuffle=shuffle, seed=seed)
    for epoch in range(2):  # shuffle reseeds per epoch identically
        hb, db = list(host), list(dev)
        assert len(hb) == len(db) == len(host) == len(dev)
        for b_h, b_d in zip(hb, db):
            for i, (x_h, x_d) in enumerate(zip(b_h.inputs, b_d.inputs)):
                np.testing.assert_allclose(np.asarray(x_d), np.asarray(x_h),
                                           err_msg=f"modality {i}")
            np.testing.assert_allclose(np.asarray(b_d.labels),
                                       np.asarray(b_h.labels))
            np.testing.assert_array_equal(b_d.valid, b_h.valid)


def test_matches_host_iterator_array_dataset():
    _assert_same_batches(_array_ds(), bs=4, shuffle=True, seed=3)


def test_matches_host_iterator_text_dataset_with_tail():
    # n=11, bs=4 -> last batch padded; text gathers on axis 1
    _assert_same_batches(_TextDataset(), bs=4, shuffle=True, seed=9)


def test_unshuffled_eval_order():
    _assert_same_batches(_array_ds(), bs=5, shuffle=False, seed=0)


def test_store_dtype_bf16():
    ds = _TextDataset()
    dev = DeviceBatchIterator(ds, 4, store_dtype="bfloat16")
    b = next(iter(dev))
    assert b.inputs[0].dtype == jnp.int32 or b.inputs[0].dtype == jnp.int64
    assert b.inputs[1].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(b.inputs[1], np.float32),
                               ds.audio[:4], atol=0.01)


def test_composes_with_cached_text(monkeypatch):
    import jax

    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.models.bert import (
        tiny_bert_config)
    from multimodal_transformer_robustness_tpu import ModelSpec
    from multimodal_transformer_robustness_tpu.train.features import (
        CachedTextDataset)

    spec = ModelSpec(
        modality_set=("t", "a"), orig_dimensions=(6, 5), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1)
    _, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                              bert_cfg=tiny_bert_config())
    ds = _TextDataset(L=6)
    cached = CachedTextDataset(ds, frozen, tiny_bert_config(), batch_size=4)
    dev = DeviceBatchIterator(cached, 4, shuffle=True, seed=2)
    host = BatchIterator(cached, 4, shuffle=True, seed=2)
    for b_h, b_d in zip(host, dev):
        np.testing.assert_allclose(np.asarray(b_d.inputs[0]),
                                   np.asarray(b_h.inputs[0]), atol=1e-6)
    # Trainer resolves fill rows through the wrapped dataset
    from multimodal_transformer_robustness_tpu.train.loop import Trainer

    rows = Trainer.loader_fill_rows(dev)
    assert rows is not None and 0 in rows
