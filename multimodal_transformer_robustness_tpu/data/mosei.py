"""CMU-MOSEI (framework-extracted features): text transcripts + wav2vec2
audio [T, 768] + facenet vision [T, 512], sharded torch ``.pt`` files.

Mirrors reference src/dataset.py:61-131 (record layout
``[name, label, vision(list of [1,512]), transcript(word list),
audio([1,T,768])]``; empty-vision records dropped; ``get_dim() ==
[768, 768, 512]``; ``get_seq_len() == 50``) and the collate at
src/dataset.py:28-57 (pad audio/vision; BERT-tokenize joined words to
batch-max sentence length + 2; stack text as [3, B, L] =
[input_ids, token_type_ids, attention_mask]).

TPU deviation (documented): sequences pad to a per-split fixed cap instead
of per-batch max, so every batch has identical shapes and the jitted step
never retraces.  The reference's GRU headers run over padding zeros, so its
results already depend on batch composition; a fixed cap is the static-shape
equivalent.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .tokenizer import load_tokenizer

_SHARDS = {"train": 164, "valid": 19, "test": 47}


class MoseiDataset:
    def __init__(self, dataset_path: str, split_type: str = "train",
                 bert_dir: Optional[str] = None,
                 max_seq: Optional[int] = None,
                 max_sent: Optional[int] = None,
                 max_shards: Optional[int] = None):
        import torch  # host-side shard reader only

        records = []
        n_shards = _SHARDS[split_type]
        if max_shards is not None:
            n_shards = min(n_shards, max_shards)
        for i in range(1, n_shards + 1):
            p = os.path.join(dataset_path, f"processed_data_{split_type}{i * 100}.pt")
            if not os.path.exists(p):
                # partial checkouts: stop at the first missing shard (the
                # reference hardcodes the full ranges and would crash)
                print(f"mosei: stopping at missing shard {p}")
                break
            # shards contain python lists/floats, not just tensors
            # (reference record layout) — requires weights_only=False
            records.extend(torch.load(p, map_location="cpu", weights_only=False))

        self.vision: List[np.ndarray] = []
        self.text: List[List[str]] = []
        self.audio: List[np.ndarray] = []
        self.name: List[str] = []
        labels: List[float] = []
        for rec in records:
            vis = rec[2]
            if isinstance(vis, list):
                if not vis:
                    # empty-vision records dropped (reference dataset.py:81-99)
                    continue
                vis = torch.stack(vis)
            self.vision.append(np.asarray(vis.squeeze(1), np.float32))   # [T, 512]
            self.text.append(list(rec[-2]))
            self.audio.append(np.asarray(rec[-1].squeeze(), np.float32))  # [T, 768]
            self.name.append(rec[0])
            labels.append(float(rec[1]))
        self.labels = np.asarray(labels, np.float32)[:, None]  # [N, 1]

        self.tokenizer = load_tokenizer(bert_dir)
        self.max_seq = max_seq or max(
            max((a.shape[0] for a in self.audio), default=1),
            max((v.shape[0] for v in self.vision), default=1))
        self.max_sent = max_sent or (max((len(t) for t in self.text), default=1) + 2)
        self.n_modalities = 3

    # ---- reference info surface ----
    def get_n_modalities(self) -> int:
        return 3

    def get_seq_len(self) -> int:
        return 50  # hardcoded in the reference (dataset.py:112)

    def get_dim(self) -> List[int]:
        return [768, 768, 512]

    def __len__(self) -> int:
        return len(self.name)

    # ---- batching ----
    def gather(self, idx: np.ndarray) -> Tuple[List[np.ndarray], np.ndarray]:
        b = len(idx)
        L = self.max_sent
        audio = np.zeros((b, self.max_seq, 768), np.float32)
        vision = np.zeros((b, self.max_seq, 512), np.float32)
        sentences = [" ".join(self.text[i]) for i in idx]
        if hasattr(self.tokenizer, "encode_batch"):
            # native C++ batch path (data/tokenizer_native.py)
            text = self.tokenizer.encode_batch(sentences, L)
        else:
            text = np.zeros((3, b, L), np.int64)
            for k, s in enumerate(sentences):
                enc = self.tokenizer.encode_plus(s, max_length=L)
                text[0, k] = enc["input_ids"]
                text[1, k] = enc["token_type_ids"]
                text[2, k] = enc["attention_mask"]
        for k, i in enumerate(idx):
            a = self.audio[i][: self.max_seq]
            v = self.vision[i][: self.max_seq]
            audio[k, : a.shape[0]] = a
            vision[k, : v.shape[0]] = v
        return [text, audio, vision], self.labels[idx]
