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
