"""Serving-path latency benchmark (BASELINE.json config 5, real-time.py).

The reference's real-time.py prints per-stage timers around face extraction,
audio extraction and the model forward (real-time.py:43-49); every clip
re-runs eager torch end-to-end.  Our serving path (cli/realtime.py
StreamingPredictor) jits one program per (text, audio, vision) shape-bucket
triple, so arbitrary-length clips hit a warm compiled program after the
first clip in their bucket.

This bench reports the stage split the reference reports — extract ->
prepare (tokenize+bucket+pad, host) -> forward (device dispatch + host
readback) — with a cold/warm split per bucket triple:

  * cold  = the first clip that lands in a bucket triple (includes compile;
    with the on-disk compilation cache warm this is just the first-dispatch
    overhead);
  * warm  = every subsequent clip in that triple (the production serving
    number).

Extraction is synthetic here (the reference's MTCNN/wav2vec2 stack needs
facenet_pytorch/torchaudio + pretrained downloads — neither exists in this
environment, BASELINE.md); its cost is reported but is a placeholder for
the environmental torch stack, not a claim about extractor speed.

Timing note (BENCH_NOTES "Timing protocol"): each forward() ends in a
float() HOST READBACK, the only synchronization that provably waits through
the axon tunnel — so per-clip wall-clock here is sound.  Clip features are
freshly drawn per clip, so no two dispatches are bit-identical (the axon
client memoizes identical calls).

Run on the TPU: ``python benchmarks/realtime_bench.py [--clips 24]``.
Appends one JSON line to stdout; paste into BENCH_NOTES.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# Three serving scenarios, chosen to land in distinct bucket triples:
# a short clip, a mid-length clip, and a long-utterance clip.  Lengths are
# the *feature-sequence* lengths the extractors emit (wav2vec2 frames /
# detected-face frames / whitespace words).
SCENARIOS = [
    {"name": "short", "words": 8, "ta": 24, "tv": 12},
    {"name": "mid", "words": 24, "ta": 56, "tv": 28},
    {"name": "long", "words": 90, "ta": 120, "tv": 60},
]


def _make_clip(rng, scenario, d_a=768, d_v=512):
    words = ["clip"] + [f"word{int(rng.integers(0, 50))}"
                        for _ in range(scenario["words"] - 1)]
    audio = rng.standard_normal((1, scenario["ta"], d_a)).astype(np.float32)
    face = rng.standard_normal((1, scenario["tv"], d_v)).astype(np.float32)
    return words, audio, face


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=24,
                   help="warm clips per scenario")
    p.add_argument("--bert_int8", action="store_true")
    p.add_argument("--attn_impl", choices=["xla", "flash"], default="xla")
    args = p.parse_args(argv)

    from multimodal_transformer_robustness_tpu.cli.realtime import (
        StreamingPredictor, synthetic_extractors)

    t0 = time.time()
    pred = StreamingPredictor(attn_impl=args.attn_impl,
                              bert_int8=args.bert_int8)
    build_s = time.time() - t0

    face_fn, audio_fn = synthetic_extractors()
    rng = np.random.default_rng(0)

    rows = []
    for sc in SCENARIOS:
        stage = {"extract": [], "prepare": [], "forward": []}
        cold_forward_ms = None
        buckets = None
        for it in range(args.clips + 1):  # +1: first clip is the cold one
            words, audio_feats, face_feats = _make_clip(rng, sc)
            t0 = time.time()
            _ = face_fn(None)  # placeholder for the torch extractor stack
            _, _ = audio_fn(None)
            t1 = time.time()
            text, audio, vision = pred.prepare(words, audio_feats, face_feats)
            t2 = time.time()
            sentiment = pred.forward(text, audio, vision)
            t3 = time.time()
            assert np.isfinite(sentiment)
            if buckets is None:
                buckets = (text.shape[2], audio.shape[1], vision.shape[1])
            if it == 0:
                cold_forward_ms = 1000 * (t3 - t2)
                continue
            stage["extract"].append(1000 * (t1 - t0))
            stage["prepare"].append(1000 * (t2 - t1))
            stage["forward"].append(1000 * (t3 - t2))

        fwd = np.asarray(stage["forward"])
        row = {
            "scenario": sc["name"],
            "buckets_LtaTv": list(buckets),
            "cold_forward_ms": round(cold_forward_ms, 1),
            "warm_forward_ms_p50": round(float(np.median(fwd)), 2),
            "warm_forward_ms_p95": round(float(np.percentile(fwd, 95)), 2),
            "prepare_ms_p50": round(float(np.median(stage["prepare"])), 2),
            "extract_ms_p50": round(float(np.median(stage["extract"])), 3),
        }
        rows.append(row)
        e2e = (row["extract_ms_p50"] + row["prepare_ms_p50"]
               + row["warm_forward_ms_p50"])
        print(f"{sc['name']:>6}  buckets(L,ta,tv)={buckets}  "
              f"extract {row['extract_ms_p50']:.2f} ms | "
              f"prepare {row['prepare_ms_p50']:.2f} ms | "
              f"forward p50 {row['warm_forward_ms_p50']:.2f} ms "
              f"(p95 {row['warm_forward_ms_p95']:.2f}, "
              f"cold {row['cold_forward_ms']:.0f}) | "
              f"e2e p50 {e2e:.2f} ms", flush=True)

    print(json.dumps({
        "metric": "realtime_serving_latency",
        "unit": "ms",
        "value": rows[1]["warm_forward_ms_p50"],  # headline: mid-clip forward
        "clips_per_scenario": args.clips,
        "predictor_build_s": round(build_s, 1),
        "bert_int8": args.bert_int8,
        "scenarios": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
