"""WordPiece tokenizer: python implementation vs the native C++ one, and
(when a real vocab is reachable) vs HuggingFace's BertTokenizer."""

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.data.tokenizer import WordPieceTokenizer
from multimodal_transformer_robustness_tpu.data.tokenizer_native import (
    NativeWordPieceTokenizer,
)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
         "over", "lazy", "dog", "!", ",", "'", "a", "b", "c", "ab", "##c",
         "do", "##g", "##gs"]

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "The QUICK, brown fox!",
    "abc ab c unknownword",
    "dogs doggs dog",
    "",
    "jumping jumped jumps",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_python_wordpiece_basics(vocab_file):
    tok = WordPieceTokenizer(vocab_file)
    enc = tok.encode_plus("the quick brown fox jumps", max_length=10)
    ids = enc["input_ids"]
    assert ids[0] == 2 and 3 in ids  # [CLS] ... [SEP]
    assert enc["attention_mask"][: ids.index(3) + 1] == [1] * (ids.index(3) + 1)
    # 'jumps' -> jump + ##s
    assert ids[1:6] == [5, 6, 7, 8, 9]
    assert ids[6] == 10
    # truncation to max_length-2 body
    enc2 = tok.encode_plus("the " * 50, max_length=8)
    assert len(enc2["input_ids"]) == 8
    assert enc2["input_ids"][-1] == 3  # SEP always present


def test_native_matches_python(vocab_file):
    native = NativeWordPieceTokenizer(vocab_file)
    if not native.native_available:
        pytest.skip("no C++ toolchain")
    py = native.fallback
    L = 16
    stacked = native.encode_batch(TEXTS, L)
    for i, t in enumerate(TEXTS):
        enc = py.encode_plus(t, L)
        assert stacked[0, i].tolist() == enc["input_ids"], t
        assert stacked[2, i].tolist() == enc["attention_mask"], t
        assert stacked[1, i].tolist() == enc["token_type_ids"], t


def test_native_nonascii_fallback(vocab_file):
    native = NativeWordPieceTokenizer(vocab_file)
    if not native.native_available:
        pytest.skip("no C++ toolchain")
    texts = ["the café dog"]
    stacked = native.encode_batch(texts, 12)
    enc = native.fallback.encode_plus(texts[0], 12)
    assert stacked[0, 0].tolist() == enc["input_ids"]


def test_native_speedup(vocab_file):
    import time

    native = NativeWordPieceTokenizer(vocab_file)
    if not native.native_available:
        pytest.skip("no C++ toolchain")
    texts = ["the quick brown fox jumps over the lazy dog " * 6] * 256
    t0 = time.perf_counter()
    native.encode_batch(texts, 64)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts:
        native.fallback.encode_plus(t, 64)
    t_py = time.perf_counter() - t0
    # native should be clearly faster on the batch path
    assert t_native < t_py, (t_native, t_py)
    print(f"native {t_native*1e3:.1f}ms vs python {t_py*1e3:.1f}ms "
          f"({t_py/t_native:.1f}x)")
