"""Synthetic datasets for end-to-end tests (shapes mirror the real ones)."""

import numpy as np

from multimodal_transformer_robustness_tpu.data.loaders import ArrayDataset


def synth_avmnist(n=64, img=28, aud=112, n_classes=10, seed=0,
                  learnable=True):
    """avMNIST-shaped data.  With ``learnable=True`` the label is encoded as
    a strong mean-shift in both modalities so a few training steps visibly
    reduce loss."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n).astype(np.int64)
    image = rng.standard_normal((n, 1, img, img)).astype(np.float32)
    audio = rng.standard_normal((n, 1, aud, aud)).astype(np.float32)
    if learnable:
        shift = (labels / n_classes - 0.5).astype(np.float32)
        image += shift[:, None, None, None]
        audio += shift[:, None, None, None]
    return ArrayDataset([image, audio], labels, dims=[img, aud], seq_len=img)


def synth_mosei_like(n=48, t=6, dims=(12, 10, 8), seed=0):
    """3-modality regression data with RNN headers (no BERT)."""
    rng = np.random.default_rng(seed)
    xs = [rng.standard_normal((n, t, d)).astype(np.float32) for d in dims]
    labels = (xs[0].mean(axis=(1, 2), keepdims=False)[:, None] * 3).astype(np.float32)
    return ArrayDataset(xs, labels, dims=list(dims), seq_len=t)


def write_synth_mosei_shards(out_dir, n_train=24, seed=0):
    """Synthetic MOSEI shards in the reference .pt record format
    (src/dataset.py:64-106), incl. one empty-vision record per shard."""
    import os

    import torch

    rng = np.random.default_rng(seed)
    words = "the quick brown fox jumps over lazy dog great terrible".split()

    def shard(split, i, n):
        recs = []
        for k in range(n):
            t = int(rng.integers(3, 9))
            vision = [torch.tensor(rng.standard_normal((1, 512)),
                                   dtype=torch.float32) for _ in range(t)]
            audio = torch.tensor(rng.standard_normal((1, t + 2, 768)),
                                 dtype=torch.float32)
            transcript = list(rng.choice(words, size=rng.integers(2, 7)))
            recs.append([f"{split}{i}_{k}", float(rng.normal()), vision,
                         transcript, audio])
        recs.append([f"{split}{i}_empty", 0.5, [], ["drop", "me"],
                     torch.tensor(rng.standard_normal((1, 4, 768)),
                                  dtype=torch.float32)])
        torch.save(recs, os.path.join(out_dir, f"processed_data_{split}{i*100}.pt"))

    shard("train", 1, n_train)
    shard("valid", 1, max(n_train // 2, 4))
    shard("test", 1, max(n_train // 2, 4))


def write_synth_vocab(path):
    words = "the quick brown fox jumps over lazy dog great terrible".split()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words + ["##s"]
    with open(path, "w") as f:
        f.write("\n".join(vocab) + "\n")
