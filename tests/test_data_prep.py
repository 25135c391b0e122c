"""data_prep offline tools on synthetic inputs."""

import json
import os
import wave

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.data_prep.folds import load_folds
from multimodal_transformer_robustness_tpu.data_prep.process_data import (
    read_wav,
    write_wav,
)


def test_wav_roundtrip(tmp_path):
    data = (np.sin(np.linspace(0, 100, 16000)) * 20000).astype(np.int16)
    p = str(tmp_path / "x.wav")
    write_wav(p, data, 16000)
    back, rate = read_wav(p)
    assert rate == 16000
    np.testing.assert_array_equal(back, data)


def test_load_folds_json(tmp_path):
    p = tmp_path / "folds.json"
    p.write_text(json.dumps({"train": ["a", "b"], "valid": ["c"], "test": ["d"]}))
    folds = load_folds(str(p))
    assert folds["train"] == ["a", "b"]


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/data_prep/std_folder.py"),
    reason="reference folds not present")
def test_load_folds_from_reference():
    folds = load_folds()
    assert len(folds["train"]) == 2249
    assert len(folds["valid"]) == 300
    assert len(folds["test"]) == 678


def test_process_clip_splitting(tmp_path):
    """End-to-end: synthetic CSD labels + wav + mp4 -> per-interval clips."""
    cv2 = pytest.importorskip("cv2")
    h5py = pytest.importorskip("h5py")
    from multimodal_transformer_robustness_tpu.data_prep.process_data import process

    name = "vid00"
    video_dir = tmp_path / "video"
    audio_dir = tmp_path / "audio"
    video_out = tmp_path / "video_out"
    audio_out = tmp_path / "audio_out"
    for d in (video_dir, audio_dir, video_out, audio_out):
        os.makedirs(d)

    # 3-second 16 kHz wav
    wav = (np.sin(np.linspace(0, 500, 48000)) * 10000).astype(np.int16)
    write_wav(str(audio_dir / f"{name}.wav"), wav)
    # 3-second 30 fps tiny mp4
    vw = cv2.VideoWriter(str(video_dir / f"{name}.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 24), True)
    for f in range(90):
        vw.write(np.full((24, 32, 3), f % 255, np.uint8))
    vw.release()
    # labels file: 2 intervals with sentiments
    csd = str(tmp_path / "labels.csd")
    with h5py.File(csd, "w") as f:
        g = f.create_group(f"All Labels/data/{name}")
        g["intervals"] = np.array([[0.0, 1.0], [1.5, 2.5]])
        g["features"] = np.array([[0.7], [-1.2]])

    with h5py.File(csd, "r") as ds:
        labels = process(ds, str(video_dir), str(video_out), str(audio_dir),
                         str(audio_out), name)
    assert labels == [[f"{name}_00", pytest.approx(0.7)],
                      [f"{name}_01", pytest.approx(-1.2)]]
    # audio segments cut at 16000 samples/sec
    seg0, _ = read_wav(str(audio_out / f"{name}_00.wav"))
    assert len(seg0) == 16000
    # video clips written
    assert os.path.getsize(video_out / f"{name}_00.mp4") > 0
    cap = cv2.VideoCapture(str(video_out / f"{name}_01.mp4"))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert 25 <= n <= 35  # ~1s at 30fps (reference's +-1 frame slop)


def test_extract_and_shard_roundtrips_through_mosei_loader(tmp_path):
    """extract_features' shard loop (with fake extractors injected in place
    of torchaudio/facenet, which aren't installed here) writes shards that
    our MOSEI loader reads back: record format, shard naming quirk (first
    shard holds shard_every+1 records), empty-vision drop."""
    import numpy as np
    import torch

    from multimodal_transformer_robustness_tpu.data_prep.extract_features import (
        extract_and_shard)
    from multimodal_transformer_robustness_tpu.data.mosei import MoseiDataset

    rng = np.random.default_rng(0)

    def make_rows(n):
        return [{"name": f"clip{i}", "sentiment": str(rng.uniform(-3, 3))}
                for i in range(n)]

    def audio_features(name):
        t = 4 + int(name[4:]) % 5
        return torch.randn(1, t, 768), ["hello", "world", name]

    def vision_features(name):
        if name == "clip3":
            return []  # the loader must drop this record
        return [torch.randn(1, 512) for _ in range(3)]

    # sharding quirk: flush at every index divisible by shard_every EXCEPT 0
    # (first shard holds shard_every+1 records), tail named by len(rows)
    quirk_dir = tmp_path / "quirk"
    quirk_dir.mkdir()
    written = extract_and_shard(make_rows(8), str(quirk_dir), "train",
                                audio_features, vision_features,
                                shard_every=3, verbose=False)
    names = [os.path.basename(w) for w in written]
    assert names == ["processed_data_train3.pt", "processed_data_train6.pt",
                     "processed_data_train8.pt"]
    assert len(torch.load(written[0], weights_only=False)) == 4

    # loader round-trip at the real shard granularity (multiples of 100)
    out = tmp_path / "shards"
    out.mkdir()
    written = extract_and_shard(make_rows(101), str(out), "train",
                                audio_features, vision_features,
                                shard_every=100, verbose=False)
    assert [os.path.basename(w) for w in written] == [
        "processed_data_train100.pt"]
    ds = MoseiDataset(str(out), "train")
    assert len(ds) == 100  # 101 records minus the empty-vision clip3
