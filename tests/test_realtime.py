"""Streaming-inference CLI (cli/realtime.py — reference real-time.py).

The heavy torch extraction stack (MTCNN/wav2vec2) is dep-gated and absent
in this environment; these tests cover the serving machinery itself: the
greedy CTC decoder (real-time.py:54-63), shape bucketing, the pluggable
extractors, and an end-to-end StreamingPredictor.predict on a tiny spec.
"""

import numpy as np

from multimodal_transformer_robustness_tpu.cli.realtime import (
    GreedyCTCDecoder,
    StreamingPredictor,
    _bucket,
    precomputed_extractors,
)


def test_bucket_powers_of_two():
    assert _bucket(1) == 8
    assert _bucket(8) == 8
    assert _bucket(9) == 16
    assert _bucket(40) == 64


def test_greedy_ctc_decoder_dedups_and_drops_blank():
    labels = ["-", "a", "b", "c"]
    dec = GreedyCTCDecoder(labels, blank=0)
    # emission argmax sequence: a a - b b b c -> "abc"
    seq = [1, 1, 0, 2, 2, 2, 3]
    emission = np.zeros((len(seq), 4), np.float32)
    emission[np.arange(len(seq)), seq] = 1.0
    assert dec(emission) == "abc"
    # repeated letter separated by blank survives: a - a -> "aa"
    seq = [1, 0, 1]
    emission = np.zeros((len(seq), 4), np.float32)
    emission[np.arange(len(seq)), seq] = 1.0
    assert dec(emission) == "aa"


def test_precomputed_extractors_roundtrip(tmp_path):
    face = np.ones((1, 3, 16), np.float32)
    audio = np.full((1, 5, 8), 2.0, np.float32)
    np.save(tmp_path / "face.npy", face)
    np.save(tmp_path / "audio.npy", audio)
    f_fn, a_fn = precomputed_extractors(str(tmp_path / "face.npy"),
                                        str(tmp_path / "audio.npy"),
                                        "hello world")
    np.testing.assert_array_equal(f_fn("ignored"), face)
    a, transcript = a_fn("ignored")
    np.testing.assert_array_equal(a, audio)
    assert transcript == ["hello", "world"]


def test_streaming_predictor_tiny_end_to_end():
    """predict() returns a finite scalar and the bucketed jit is reused for
    same-bucket lengths (no retrace) on a tiny spec."""
    from multimodal_transformer_robustness_tpu import ModelSpec
    from multimodal_transformer_robustness_tpu.models.bert import tiny_bert_config

    spec = ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(6, 10, 12),
        dimension=8, num_heads=2, head_dim=4, layers_single_attn=1,
        layers_cross_attn=1, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0,
        attn_mask=True, output_dim=1)
    pred = StreamingPredictor(spec=spec, bert_cfg=tiny_bert_config())
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 5, 10)).astype(np.float32)
    face = rng.standard_normal((1, 3, 12)).astype(np.float32)
    s1 = pred.predict("a tiny transcript".split(), audio, face)
    assert np.isfinite(s1)

    # same buckets (lengths pad to the same powers of two) -> cached program
    n0 = pred._fwd._cache_size()
    audio2 = rng.standard_normal((1, 6, 10)).astype(np.float32)   # pads to 8
    face2 = rng.standard_normal((1, 4, 12)).astype(np.float32)    # pads to 8
    s2 = pred.predict("another tiny transcript".split(), audio2, face2)
    assert np.isfinite(s2)
    assert pred._fwd._cache_size() == n0

    # a longer clip crosses a bucket boundary -> new program, still finite
    audio3 = rng.standard_normal((1, 13, 10)).astype(np.float32)  # pads to 16
    s3 = pred.predict("x".split(), audio3, face)
    assert np.isfinite(s3)
    assert pred._fwd._cache_size() == n0 + 1
