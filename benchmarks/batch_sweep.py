"""Measure train-step throughput across batch sizes and compute dtypes
(VERDICT r1 weak #2).  Runs on the ambient platform (the real chip under
axon); prints one JSON line per configuration.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

for dtype in ("float32", "bfloat16"):
    for b in (16, 64, 256, 1024):
        line = bench.main(batch_size=b, steps=30, warmup=2,
                          compute_dtype=dtype, emit_json=False)
        line["batch_size"] = b
        line["compute_dtype"] = dtype
        print(json.dumps(line), flush=True)
