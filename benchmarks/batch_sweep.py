"""Measure train-step throughput across batch sizes and compute dtypes
(VERDICT r1 weak #2; extended B>=2048 + cached cells for VERDICT r3 #2).
Runs on the ambient platform (the real chip under axon); prints one JSON
line per configuration.

Variance protocol (VERDICT r2 next #3): latency-bound cells (B <= 256)
swing ±40% day-to-day through the remote tunnel, so each cell repeats its
30-step timing loop and reports the MEDIAN plus the per-loop spread —
small batches get 5 loops, large (compute-bound, stable) get 3.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

ap = argparse.ArgumentParser()
ap.add_argument("--dtypes", default="float32,bfloat16")
ap.add_argument("--batches", default="16,64,256,1024,2048,4096,8192")
ap.add_argument("--cached", action="store_true",
                help="also sweep the --cache_text pipeline at B>=1024")
ap.add_argument("--steps", type=int, default=30)
a = ap.parse_args()

for dtype in a.dtypes.split(","):
    batches = [int(b) for b in a.batches.split(",")]
    if dtype == "float32":
        # f32 rows exist for the strict-parity story (the reference trains
        # f32 at B=16); the large-batch operating point is bf16-only
        batches = [b for b in batches if b <= 1024]
    for b in batches:
        reps = 5 if b <= 256 else 3
        for cached in ([False, True] if (a.cached and b >= 1024
                                         and dtype == "bfloat16")
                       else [False]):
            line = bench.main(batch_size=b, steps=a.steps, warmup=2,
                              compute_dtype=dtype, emit_json=False,
                              repeats=reps, cached_text=cached)
            line["batch_size"] = b
            line["compute_dtype"] = dtype
            line["timing_loops"] = reps
            line["cached_text"] = cached
            print(json.dumps(line), flush=True)
