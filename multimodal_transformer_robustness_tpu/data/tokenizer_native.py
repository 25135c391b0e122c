"""ctypes wrapper for the native WordPiece tokenizer
(native/wordpiece.cpp), with transparent fallback to the pure-Python
:class:`~.tokenizer.WordPieceTokenizer` for non-ASCII inputs or when no C++
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List

import numpy as np

from ..native import build_and_load
from .tokenizer import WordPieceTokenizer


class NativeWordPieceTokenizer:
    """Batch-level tokenizer: ``encode_batch(texts, max_length)`` returns the
    stacked [3, B, L] int64 text tensor of the MOSEI collate
    (ids / token_type_ids / attention_mask — src/dataset.py:51-55)."""

    def __init__(self, vocab_file: str, do_lower_case: bool = True):
        self.fallback = WordPieceTokenizer(vocab_file, do_lower_case)
        self._lib = build_and_load("wordpiece")
        self._handle = -1
        if self._lib is not None:
            lib = self._lib
            lib.wp_load_vocab.restype = ctypes.c_int32
            lib.wp_load_vocab.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.wp_encode_batch.restype = ctypes.c_int32
            lib.wp_encode_batch.argtypes = [
                ctypes.c_int32, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
            with open(vocab_file, "rb") as f:
                data = f.read()
            self._handle = lib.wp_load_vocab(data, len(data))

    @property
    def native_available(self) -> bool:
        return self._lib is not None and self._handle >= 0

    def encode_batch(self, texts: List[str], max_length: int) -> np.ndarray:
        b = len(texts)
        out = np.zeros((3, b, max_length), np.int64)
        if self.native_available:
            raw = [t.encode("utf-8") for t in texts]
            blob = b"".join(raw)
            offsets = np.zeros((b + 1,), np.int64)
            np.cumsum([len(r) for r in raw], out=offsets[1:])
            ids = np.zeros((b, max_length), np.int32)
            attn = np.zeros((b, max_length), np.int32)
            rc = self._lib.wp_encode_batch(
                self._handle, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                b, max_length, ids, attn)
            if rc == 0:
                out[0] = ids
                out[2] = attn
                return out
        for i, t in enumerate(texts):
            enc = self.fallback.encode_plus(t, max_length)
            out[0, i] = enc["input_ids"]
            out[1, i] = enc["token_type_ids"]
            out[2, i] = enc["attention_mask"]
        return out

    def encode_plus(self, text: str, max_length: int) -> Dict[str, List[int]]:
        stacked = self.encode_batch([text], max_length)
        return {"input_ids": stacked[0, 0].tolist(),
                "token_type_ids": stacked[1, 0].tolist(),
                "attention_mask": stacked[2, 0].tolist()}
