"""Offline MOSEI clip splitting: cut full-video WAV/MP4 into per-label-
interval segments and write split manifests.

Port of reference data_prep/process_data.py: read CMU_MOSEI_Labels.csd
(h5py), per video slice the 16 kHz WAV by label intervals and re-cut the MP4
frame-by-frame at 30 fps (cv2), iterate the standard folds, write
{train,valid,test} label manifests.

Differences (documented): WAV IO uses the stdlib ``wave`` module (soundfile
is not in this environment) and manifests are CSV instead of xlsx (openpyxl/
xlsxwriter absent; CSV carries the same two columns).
"""

from __future__ import annotations

import argparse
import csv
import os
import wave
from os.path import exists
from typing import List

import numpy as np

from .folds import load_folds


def read_wav(path: str):
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "expect 16-bit PCM"
        rate = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        channels = w.getnchannels()
        if channels > 1:
            data = data.reshape(-1, channels)
    return data, rate


def write_wav(path: str, data: np.ndarray, rate: int = 16000) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1 if data.ndim == 1 else data.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(data, np.int16).tobytes())


def process(dataset, video_dir: str, video_dir_new: str, resample_dir: str,
            resample_dir_new: str, name: str) -> List[list]:
    """(reference process_data.py:34-82)"""
    import cv2

    features = dataset[f"All Labels/data/{name}/features"]
    intervals = np.array(dataset[f"All Labels/data/{name}/intervals"])
    video_file = os.path.join(video_dir, name + ".mp4")
    wav_file = os.path.join(resample_dir, name + ".wav")
    if not (exists(video_file) and exists(wav_file)):
        print(video_file + " does not exist")
        return []
    print("processing: ", name)
    audio, rate = read_wav(wav_file)

    labels = []
    for i in range(len(intervals)):
        newname = f"{name}_{i:02d}"
        iv = 16000 * intervals[i]
        iv = np.array([max(iv[0], 0), max(iv[1], 0)]).astype(int)
        segment = audio[slice(*iv)]
        write_wav(os.path.join(resample_dir_new, newname + ".wav"), segment, 16000)
        labels.append([newname, float(np.asarray(features[i]).reshape(-1)[0])])

    cap = cv2.VideoCapture(video_file)
    ret, frame = cap.read()
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = cv2.VideoWriter_fourcc("m", "p", "4", "v")
    writers = [cv2.VideoWriter(
        filename=os.path.join(video_dir_new, f"{name}_{i:02d}.mp4"),
        fourcc=fourcc, fps=30, frameSize=(w, h), isColor=True)
        for i in range(len(intervals))]
    ivf = intervals * 30
    f = 0
    while ret:
        done = 0
        for i in range(len(ivf)):
            if ivf[i][0] - 1 <= f <= ivf[i][1] + 1:
                writers[i].write(frame)
            elif f > ivf[i][1]:
                done += 1
        if done == len(ivf):
            break
        ret, frame = cap.read()
        f += 1
    for wr in writers:
        wr.release()
    cap.release()
    return labels


def main(argv=None):
    import h5py

    p = argparse.ArgumentParser()
    p.add_argument("--labels_csd", default="./CMU_MOSEI_Labels.csd")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--video_out", required=True)
    p.add_argument("--audio_out", required=True)
    p.add_argument("--manifest_dir", default=".")
    p.add_argument("--folds", default=None, help="folds JSON (see folds.py)")
    args = p.parse_args(argv)

    dataset = h5py.File(args.labels_csd, "r")
    names = set(dataset["All Labels/data"].keys())
    folds = load_folds(args.folds)

    for split in ("train", "valid", "test"):
        labels: List[list] = []
        for name in folds[split]:
            if name in names:
                labels.extend(process(dataset, args.video_dir, args.video_out,
                                      args.audio_dir, args.audio_out, name))
            else:
                print(f"skip {name}! not included!")
        out = os.path.join(args.manifest_dir, f"{split}.csv")
        with open(out, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["name", "sentiment"])
            writer.writerows(labels)
        print(f"wrote {out} ({len(labels)} clips)")


if __name__ == "__main__":
    main()
