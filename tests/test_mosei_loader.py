"""MOSEI shard loader against synthetic shards in the reference format."""

import os

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.data import BatchIterator, get_data

from _synth import write_synth_mosei_shards, write_synth_vocab


@pytest.fixture(scope="module")
def mosei_dir(tmp_path_factory):
    pytest.importorskip("torch")
    d = tmp_path_factory.mktemp("mosei")
    write_synth_mosei_shards(str(d), n_train=12)
    write_synth_vocab(str(d / "vocab.txt"))
    return str(d)


def test_mosei_loads_and_batches(mosei_dir):
    ds = get_data("mosei_senti", mosei_dir, "train", bert_dir=mosei_dir,
                  max_shards=1)
    # empty-vision record dropped (reference dataset.py:81-99)
    assert len(ds) == 12
    assert ds.get_dim() == [768, 768, 512]
    assert ds.get_seq_len() == 50
    b = next(iter(BatchIterator(ds, 8)))
    text, audio, vision = b.inputs
    assert text.shape[0] == 3 and text.shape[1] == 8   # [3, B, L]
    assert audio.shape[:1] == (8,) and audio.shape[2] == 768
    assert vision.shape[2] == 512
    assert b.labels.shape == (8, 1)
    # CLS at position 0, pads masked out
    assert (text[0, :, 0] == 2).all() or (text[0, :, 0] > 0).all()
    assert set(np.unique(text[2])) <= {0, 1}


def test_mosei_fixed_shapes_across_batches(mosei_dir):
    ds = get_data("mosei_senti", mosei_dir, "train", bert_dir=mosei_dir,
                  max_shards=1)
    shapes = {tuple(x.shape for x in b.inputs)
              for b in BatchIterator(ds, 5)}
    assert len(shapes) == 1, f"batch shapes must be static, got {shapes}"
