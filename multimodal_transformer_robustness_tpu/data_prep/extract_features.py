"""Offline MOSEI feature extraction: per-clip wav2vec2 audio features + CTC
transcript, MTCNN+facenet per-frame 512-d face embeddings, sharded to the
``processed_data_{split}{i}.pt`` format the MOSEI loader reads.

Port of reference data_prep/extract_features.py (which needs torchaudio +
facenet_pytorch — not in this environment's baked set; install them to run
this stage, or precompute features elsewhere).  Shards every 100 clips like
the reference (:76-80); records are
``[name, sentiment, vision(list of [1,512]), transcript(word list),
audio([1,T,768])]`` matching src/dataset.py:64-131.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Callable, List, Sequence


def extract_and_shard(rows: Sequence[dict], out_dir: str, split: str,
                      audio_features: Callable, vision_features: Callable,
                      start: int = 0, shard_every: int = 100,
                      verbose: bool = True) -> List[str]:
    """The extraction loop, extractor-agnostic (testable without torchaudio/
    facenet — the real extractors are injected by :func:`main`).

    Reproduces the reference's sharding quirks exactly
    (data_prep/extract_features.py:66-80): a shard is written at every index
    divisible by ``shard_every`` EXCEPT index 0 (so the first shard holds
    ``shard_every + 1`` records), shard files are named by the flush index,
    and the tail flushes as ``processed_data_{split}{len(rows)}.pt``.
    Returns the written paths.
    """
    import torch

    written: List[str] = []
    processed = []
    for i in range(start, len(rows)):
        name = rows[i]["name"]
        if verbose:
            print(i, name)
        audio, transcript = audio_features(name)
        vision = vision_features(name)
        if not vision and verbose:
            print(name, "vision feature is empty!!!")
        processed.append([name, float(rows[i]["sentiment"]), vision,
                          transcript, audio])
        if i % shard_every == 0 and i > 0:
            path = os.path.join(out_dir, f"processed_data_{split}{i}.pt")
            torch.save(processed, path)
            written.append(path)
            processed = []
    if processed:
        path = os.path.join(out_dir, f"processed_data_{split}{len(rows)}.pt")
        torch.save(processed, path)
        written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--manifest", required=True, help="{split}.csv from process_data")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--device", default="cpu")
    args = p.parse_args(argv)

    import torch
    import torchaudio
    from facenet_pytorch import MTCNN, InceptionResnetV1

    from ..cli.realtime import GreedyCTCDecoder

    bundle = torchaudio.pipelines.WAV2VEC2_ASR_BASE_960H
    model = bundle.get_model().to(args.device).eval()
    decoder = GreedyCTCDecoder(labels=bundle.get_labels())
    mtcnn = MTCNN(device=torch.device(args.device))
    resnet = InceptionResnetV1(pretrained="vggface2").to(args.device).eval()

    with open(args.manifest) as f:
        rows = list(csv.DictReader(f))

    def audio_features(name):
        waveform, sr = torchaudio.load(os.path.join(args.audio_dir, name + ".wav"))
        waveform = torchaudio.functional.resample(
            waveform, sr, bundle.sample_rate).to(args.device)
        with torch.inference_mode():
            features, _ = model.extract_features(waveform)
            emission, _ = model(waveform)
        transcript = decoder(emission[0].cpu().numpy()).lower().split("|")
        return features[-1].cpu(), transcript

    def vision_features(name):
        import cv2

        cap = cv2.VideoCapture(os.path.join(args.video_dir, name + ".mp4"))
        success, img = cap.read()
        frames = []
        while success:
            cropped = mtcnn(img)
            if cropped is not None:
                with torch.inference_mode():
                    emb = resnet(cropped.unsqueeze(0).to(args.device))
                frames.append(emb.cpu())
            success, img = cap.read()
        return frames

    extract_and_shard(rows, args.out_dir, args.split,
                      audio_features, vision_features, start=args.start)


if __name__ == "__main__":
    main()
