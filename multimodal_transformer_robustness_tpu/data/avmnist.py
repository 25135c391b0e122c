"""avMNIST (MultiBench): image 28x28 + audio spectrogram 112x112.

Format and preprocessing mirror reference src/dataset.py:204-255:
  * train/valid split of the 60k training rows at 55000;
  * audio divided by 255; image used raw;
  * both reshaped to [N, 1, D, D] feeding the CNN header;
  * ``get_dim() = [28, 112]`` (side lengths, used to size the CNN+RNN header).
"""

from __future__ import annotations

import os

import numpy as np

from .loaders import ArrayDataset


class AvMnistDataset(ArrayDataset):
    def __init__(self, dataset_path: str, split_type: str = "train"):
        if split_type == "test":
            image = np.load(os.path.join(dataset_path, "image", "test_data.npy")).astype(np.float32)
            audio = np.load(os.path.join(dataset_path, "audio", "test_data.npy")).astype(np.float32)
            labels = np.load(os.path.join(dataset_path, "test_labels.npy")).astype(np.int64)
        else:
            image = np.load(os.path.join(dataset_path, "image", "train_data.npy")).astype(np.float32)
            audio = np.load(os.path.join(dataset_path, "audio", "train_data.npy")).astype(np.float32)
            labels = np.load(os.path.join(dataset_path, "train_labels.npy")).astype(np.int64)
            if split_type == "valid":
                image, audio, labels = image[55000:60000], audio[55000:60000], labels[55000:60000]
            else:
                image, audio, labels = image[:55000], audio[:55000], labels[:55000]

        audio = audio / 255.0
        n = image.shape[0]
        d = int(image.shape[1] ** 0.5)
        da = int(audio.shape[1])
        image = image.reshape(n, 1, d, d)
        audio = audio.reshape(n, 1, da, da)
        super().__init__([image, audio], labels, dims=[d, da], seq_len=d)
