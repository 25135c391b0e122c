"""MultiBench aligned-pickle datasets: UR-FUNNY (humor), MOSI, sarcasm,
aligned-MOSEI.

BASELINE.json tracks MOSI and a UR-FUNNY full sweep; the reference repo has
no loader for them (its legacy ``CMOSEI_Datasets`` read the same aligned
format for MOSEI only — src/dataset.py:135-202, dead code).  This loader
covers the standard MultiBench aligned format:

    {split: {"vision": [N, T, dv], "audio": [N, T, da], "text": [N, T, dt],
             "labels": [N, ...], ...}, ...}

with splits named train/valid/test (``dev`` accepted as valid).  Modalities
are ordered (text, audio, vision) to match the reference's MOSEI convention;
NaN/inf features are zeroed (MultiBench's covarep tracks contain them).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .loaders import ArrayDataset

_SPLIT_ALIASES = {"valid": ("valid", "dev", "val"), "train": ("train",),
                  "test": ("test",)}


class MultibenchDataset(ArrayDataset):
    def __init__(self, dataset_path: str, split_type: str = "train",
                 filename: str | None = None, binarize_labels: bool = False):
        if filename is None:
            if os.path.isfile(dataset_path):
                path = dataset_path
            else:
                candidates = [f for f in os.listdir(dataset_path)
                              if f.endswith(".pkl")]
                assert len(candidates) == 1, (
                    f"pass filename=; found {candidates} in {dataset_path}")
                path = os.path.join(dataset_path, candidates[0])
        else:
            path = os.path.join(dataset_path, filename)
        with open(path, "rb") as f:
            data = pickle.load(f)

        split = None
        for name in _SPLIT_ALIASES[split_type]:
            if name in data:
                split = data[name]
                break
        assert split is not None, f"no split {split_type} in {list(data)}"

        text = np.nan_to_num(np.asarray(split["text"], np.float32),
                             posinf=0.0, neginf=0.0)
        audio = np.nan_to_num(np.asarray(split["audio"], np.float32),
                              posinf=0.0, neginf=0.0)
        vision = np.nan_to_num(np.asarray(split["vision"], np.float32),
                               posinf=0.0, neginf=0.0)
        labels = np.asarray(split["labels"], np.float32)
        labels = labels.reshape(labels.shape[0], -1)[:, :1]
        if binarize_labels:
            labels = (labels > 0).astype(np.int64)[:, 0]

        super().__init__([text, audio, vision], labels,
                         dims=[text.shape[-1], audio.shape[-1], vision.shape[-1]],
                         seq_len=text.shape[1])
