"""Frozen-BERT text-feature precomputation (the cached-text pipeline).

The reference runs its frozen BERT inside every forward
(dynamic_models2.py:46-55, under ``torch.no_grad``) — at the canonical MOSEI
configuration that recomputation is ~half the train step (BENCH_NOTES.md
anatomy).  Because the extractor is frozen AND deterministic (this port's
BERT has no train-mode dropout — models/bert.py docstring), its output is a
pure function of the tokens; SURVEY §7.4 therefore prescribes treating BERT
as "a feature-extractor stage of the input pipeline".  This module runs the
extractor ONCE per dataset and feeds the model float features instead of
token stacks; ``models/headers.py::header_apply`` dispatches on the input
dtype (int stack -> online BERT, float -> features) so the same compiled
model serves both pipelines.

Missing-modality parity: the reference's evaluate zero-fills the raw TOKEN
tensor (train.py:218) and BERT still runs on the zeros, producing a
deterministic non-zero feature row.  The cached pipeline reproduces that
exactly: :class:`CachedTextDataset` precomputes ``BERT(zero tokens)`` once
(``zero_row``) and ``Trainer(zero_fill_rows=...)`` substitutes it — not zero
features — when the text modality is dropped.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..models import bert as bert_mod
from ..models.headers import bert_text_features


def find_text_slot(inputs: List[np.ndarray]) -> Optional[int]:
    """Index of the stacked-token text input ([3, B/N, L] integer array),
    or None if the batch carries no tokenized text modality."""
    for i, x in enumerate(inputs):
        if (getattr(x, "ndim", 0) == 3 and x.shape[0] == 3
                and np.issubdtype(np.asarray(x).dtype, np.integer)):
            return i
    return None


def _jitted_extractor(frozen: dict, bert_cfg: Optional[bert_mod.BertConfig],
                      compute_dtype: str = "float32"):
    """``compute_dtype`` must match the model spec's policy: the online path
    runs BERT with compute-dtype-cast frozen params (mult.py supernet_apply
    casts at the boundary), so the precompute must too or the two pipelines
    diverge at the last bf16 bit (ADVICE r2).  The f32 storage of bf16
    outputs is lossless, so the boundary cast-back reproduces the online
    activations exactly (tests/test_cached_text.py::test_bf16_policy_exact).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(fr, text):
        if compute_dtype != "float32":
            cdt = jnp.dtype(compute_dtype)
            fr = jax.tree.map(
                lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, fr)
        return bert_text_features(fr, bert_cfg, text).astype(jnp.float32)

    return functools.partial(run, frozen)


def precompute_text_features(frozen: dict,
                             bert_cfg: Optional[bert_mod.BertConfig],
                             text: np.ndarray,
                             batch_size: int = 256,
                             compute_dtype: str = "float32") -> np.ndarray:
    """[3, N, L] int token stack -> [N, L, H] f32 frozen-BERT features
    (computed under ``compute_dtype`` — see _jitted_extractor).

    Chunked so arbitrarily large datasets fit on-device; the tail chunk pads
    to ``batch_size`` (one compiled shape, no retrace)."""
    run = _jitted_extractor(frozen, bert_cfg, compute_dtype)
    n = text.shape[1]
    out = []
    for start in range(0, n, batch_size):
        chunk = text[:, start:start + batch_size]
        pad = batch_size - chunk.shape[1]
        if pad and n > batch_size:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:, -1:], pad, axis=1)], axis=1)
        feats = np.asarray(run(chunk), np.float32)
        out.append(feats[:chunk.shape[1] - pad] if pad and n > batch_size
                   else feats)
    return np.concatenate(out, axis=0)


def zero_token_features(frozen: dict,
                        bert_cfg: Optional[bert_mod.BertConfig],
                        seq_len: int,
                        compute_dtype: str = "float32") -> np.ndarray:
    """[L, H] features of an all-zero token stack — the value a zero-filled
    text modality produces in the online pipeline (train.py:218 semantics)."""
    run = _jitted_extractor(frozen, bert_cfg, compute_dtype)
    zeros = np.zeros((3, 1, seq_len), np.int64)
    return np.asarray(run(zeros), np.float32)[0]


class CachedTextDataset:
    """Wraps a dataset whose batches contain a [3, ·, L] token stack and
    serves precomputed [·, L, H] frozen-BERT features in that slot instead.

    Works for both storage layouts the data layer uses: ``gather``-style
    datasets (data/mosei.py) and materialized ``ArrayDataset``s.  All other
    dataset surface (``get_dim``/``get_seq_len``/...) delegates to the base.
    """

    def __init__(self, base, frozen: dict,
                 bert_cfg: Optional[bert_mod.BertConfig] = None,
                 batch_size: int = 256, compute_dtype: str = "float32"):
        from ..data.loaders import BatchIterator

        self.base = base
        self.text_slot: Optional[int] = None
        run = _jitted_extractor(frozen, bert_cfg, compute_dtype)
        feats: List[np.ndarray] = []
        L = None
        # iterate in deterministic order with fixed shapes; drop pad rows
        for batch in BatchIterator(base, batch_size, shuffle=False):
            if self.text_slot is None:
                self.text_slot = find_text_slot(batch.inputs)
                assert self.text_slot is not None, (
                    "CachedTextDataset: no [3, B, L] integer text input found")
            keep = batch.valid > 0
            text = np.asarray(batch.inputs[self.text_slot])
            L = text.shape[-1]
            feats.append(np.asarray(run(text), np.float32)[keep])
        self.features = np.concatenate(feats, axis=0)  # [N, L, H]
        self.zero_row = zero_token_features(frozen, bert_cfg, L,
                                            compute_dtype)  # [L, H]

    def __len__(self) -> int:
        return len(self.base)

    def __getattr__(self, name):
        if name == "base":  # guard: no recursion before __init__ sets it
            raise AttributeError(name)
        return getattr(self.base, name)

    def gather(self, idx: np.ndarray) -> Tuple[List[np.ndarray], np.ndarray]:
        if hasattr(self.base, "gather"):
            inputs, labels = self.base.gather(idx)
        else:
            inputs = [x[idx] for x in self.base.inputs]
            labels = self.base.labels[idx]
        inputs = list(inputs)
        inputs[self.text_slot] = self.features[idx]
        return inputs, labels

    def zero_fill_rows(self) -> dict:
        """The ``Trainer(zero_fill_rows=...)`` argument for this dataset."""
        return {self.text_slot: self.zero_row}
