"""In-process A/B of the remat T==1 exemption (ops/encoder.REMAT_MIN_TIME).

A T==1 stack's per-layer activations are ~2 MB bf16 at B=1024, so remat
saves it almost no HBM yet doubles its dropout-RNG + elementwise work in
the backward pass.  This driver times the bench.py step back-to-back in ONE
process (tunnel drift makes cross-process comparisons useless under ~10%,
BENCH_NOTES "Tunnel drift") with REMAT_MIN_TIME = 1 (round-2 behavior:
remat every stack with >= 512 rows) vs 2 (exempt T==1 stacks), A/B/A.

Usage: python benchmarks/remat_t1_ab.py [--cached_text] [--batch N]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cached_text", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import bench
    from multimodal_transformer_robustness_tpu.ops import encoder

    for min_time in (1, 2, 1):
        encoder.REMAT_MIN_TIME = min_time
        print(f"--- REMAT_MIN_TIME={min_time} "
              f"(cached_text={args.cached_text}, B={args.batch})",
              flush=True)
        res = bench.main(batch_size=args.batch, steps=args.steps,
                         cached_text=args.cached_text, emit_json=False,
                         repeats=args.repeats)
        print(f"REMAT_MIN_TIME={min_time}: {res}", flush=True)


if __name__ == "__main__":
    main()
