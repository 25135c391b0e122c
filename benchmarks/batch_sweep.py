"""Measure train-step throughput across batch sizes and compute dtypes
(VERDICT r1 weak #2).  Runs on the ambient platform (the real chip under
axon); prints one JSON line per configuration.

Variance protocol (VERDICT r2 next #3): latency-bound cells (B <= 256)
swing ±40% day-to-day through the remote tunnel, so each cell repeats its
30-step timing loop and reports the MEDIAN plus the per-loop spread —
small batches get 5 loops, large (compute-bound, stable) get 2.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

for dtype in ("float32", "bfloat16"):
    for b in (16, 64, 256, 1024):
        reps = 5 if b <= 256 else 2
        line = bench.main(batch_size=b, steps=30, warmup=2,
                          compute_dtype=dtype, emit_json=False, repeats=reps)
        line["batch_size"] = b
        line["compute_dtype"] = dtype
        line["timing_loops"] = reps
        print(json.dumps(line), flush=True)
