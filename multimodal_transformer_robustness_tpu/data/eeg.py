"""EEG 2a motor-imagery: single-modality 4-class .mat files.

Port of reference src/dataset.py:784-849: keys data1..data4 (class per key,
samples on the last axis), torch.Generator(0)-seeded randperm train/valid
split by train_ratio.  The split permutation here uses numpy's default_rng(0)
(bit-identical torch randperm replication is out of scope; split sizes and
determinism match).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

_CLASSES = ["data1", "data2", "data3", "data4"]


class EEG2aDataset:
    def __init__(self, dataset_path: str, split_type: str = "train",
                 train_ratio: Optional[float] = None,
                 file_num_range_train: Optional[Sequence[str]] = None,
                 file_num_range_test: Optional[Sequence[str]] = None):
        import scipy.io

        signals, labels = [], []
        files = file_num_range_test if split_type == "test" else file_num_range_train
        assert files, "eeg2a needs file_num_range_{train,test} lists"
        for name in files:
            mat = scipy.io.loadmat(os.path.join(dataset_path, name))
            for i, key in enumerate(_CLASSES):
                data = mat[key]
                for j in range(data.shape[2]):
                    signals.append(data[:, :, j])
                    labels.append(i)
        signals = np.asarray(signals, np.float32)
        labels = np.asarray(labels, np.int64)

        if split_type != "test":
            assert train_ratio is not None
            n_train = int(len(labels) * train_ratio)
            perm = np.random.default_rng(0).permutation(len(labels))
            sel = perm[:n_train] if split_type == "train" else perm[n_train:]
            signals, labels = signals[sel], labels[sel]

        self.inputs = [signals]
        self.labels = labels
        self.n_modalities = 1

    def get_n_modalities(self) -> int:
        return 1

    def get_seq_len(self) -> int:
        return self.inputs[0].shape[1]

    def get_dim(self) -> List[int]:
        return [self.inputs[0].shape[2]]

    def __len__(self) -> int:
        return len(self.labels)
