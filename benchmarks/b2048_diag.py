"""Diagnose the B=2048 throughput regression (VERDICT r2 weak #3).

Round-2 measured B=2048 bf16 online at 15,624 samples/s vs 18,375 at
B=1024 — recorded, undiagnosed.  This script attributes it: for each
(batch, remat on/off) cell it measures the median step time AND pulls the
compiled step's memory_analysis (peak HBM) + cost_analysis (bytes
accessed), so HBM-pressure/remat hypotheses are decided by evidence.

Prints one JSON line per cell.  Run on the TPU:
    python benchmarks/b2048_diag.py [--cached_text]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cached_text", action="store_true")
    p.add_argument("--batches", type=int, nargs="*", default=[1024, 2048])
    args = p.parse_args(argv)

    import bench
    from multimodal_transformer_robustness_tpu.ops import encoder

    for b in args.batches:
        for remat in (True, False):
            encoder.REMAT_LAYERS = remat
            line = bench.main(batch_size=b, steps=20, warmup=2,
                              compute_dtype="bfloat16",
                              cached_text=args.cached_text,
                              emit_json=False, repeats=3)
            line.update(batch_size=b, remat=remat,
                        cached_text=args.cached_text)
            print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
