"""Enrico UI-design topics: screenshot + wireframe image modalities.

Port of reference src/dataset.py:594-728: seeded shuffle split
(0.8/0.15/rest, random.Random(42)), corrupted-wireframe IGNORES, resize to
256x128, 16x8 = 128 patches of 768 features, 20 topic classes.
"""

from __future__ import annotations

import csv
import os
import random
from typing import List

import numpy as np

IGNORES = {"50105", "50109"}

UI_TYPES = ["Text", "Text Button", "Icon", "Card", "Drawer", "Web View",
            "List Item", "Toolbar", "Bottom Navigation", "Multi-Tab",
            "List Item", "Toolbar", "Bottom Navigation", "Multi-Tab",
            "Background Image", "Image", "Video", "Input", "Number Stepper",
            "Checkbox", "Radio Button", "Pager Indicator", "On/Off Switch",
            "Modal", "Slider", "Advertisement", "Date Picker", "Map View"]


class EnricoDataset:
    def __init__(self, dataset_path: str, split_type: str = "train",
                 img_dim_x: int = 256, img_dim_y: int = 128,
                 random_seed: int = 42, train_split: float = 0.8,
                 val_split: float = 0.15):
        from PIL import Image

        self.img_dim_x, self.img_dim_y = img_dim_x, img_dim_y
        self.patch_x, self.patch_y = 16, 8
        csv_file = os.path.join(dataset_path, "design_topics.csv")
        img_dir = os.path.join(dataset_path, "screenshots")
        wireframe_dir = os.path.join(dataset_path, "wireframes")
        with open(csv_file, "r") as f:
            example_list = [e for e in csv.DictReader(f)
                            if e["screen_id"] not in IGNORES]
        self.example_list = example_list
        keys = list(range(len(example_list)))
        random.Random(random_seed).shuffle(keys)
        n = len(example_list)
        if split_type == "train":
            keys = keys[: int(n * train_split)]
        elif split_type == "valid":
            keys = keys[int(n * train_split): int(n * (train_split + val_split))]
        else:
            keys = keys[int(n * (train_split + val_split)):]
        self.keys = keys

        topics = sorted({e["topic"] for e in example_list})
        self.topic2idx = {t: i for i, t in enumerate(topics)}
        self.idx2topic = {i: t for i, t in enumerate(topics)}

        def load(path):
            # torchvision Resize((H, W)) + ToTensor: bilinear resize, [0,1]
            img = Image.open(path).convert("RGB").resize(
                (img_dim_x, img_dim_y), Image.BILINEAR)
            return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

        screens, wires, labels = [], [], []
        for idx in keys:
            e = example_list[idx]
            sid = e["screen_id"]
            screens.append(self._patchify(load(os.path.join(img_dir, sid + ".jpg"))))
            wires.append(self._patchify(load(os.path.join(wireframe_dir, sid + ".jpg"))))
            labels.append(self.topic2idx[e["topic"]])
        self.inputs = [np.stack(screens), np.stack(wires)]
        self.labels = np.asarray(labels, np.int64)
        self.n_modalities = 2

    def _patchify(self, img: np.ndarray) -> np.ndarray:
        """[3, H, W] -> [patch_x*patch_y, 3*H*W/(px*py)] — the reference's
        __getitem__ reshape (dataset.py:712-713)."""
        px, py = self.patch_x, self.patch_y
        x, y = self.img_dim_x, self.img_dim_y
        v = img.reshape(3, px, x // px, py, y // py)
        v = v.transpose(1, 3, 0, 2, 4)
        return v.reshape(px * py, -1)

    def get_n_modalities(self) -> int:
        return 2

    def get_seq_len(self) -> int:
        return self.patch_x * self.patch_y

    def get_dim(self) -> List[int]:
        d = self.img_dim_x * self.img_dim_y // (self.patch_x * self.patch_y) * 3
        return [d, d]

    def __len__(self) -> int:
        return len(self.keys)
