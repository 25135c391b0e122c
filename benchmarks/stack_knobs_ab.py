"""In-process A/B of the T==1-stack knobs: remat exemption + scan unroll.

Knob 1 — ops/encoder.REMAT_MIN_TIME: a T==1 stack's per-layer activations
are ~2 MB bf16 at B=1024, so remat saves it almost no HBM yet doubles its
dropout-RNG + elementwise work in the backward pass; 2 exempts T==1 stacks
from remat, 1 is the round-2 behavior.

Knob 2 — ops/encoder.SCAN_UNROLL: the T==1 stacks' per-layer work is a
handful of small fused kernels, so the layer scan's fixed per-iteration
cost is a real fraction of their time; True fully unrolls (L = 2-4).

Cells run back-to-back in ONE process (tunnel drift makes cross-process
comparisons useless under ~10%, BENCH_NOTES "Tunnel drift"), with the
baseline repeated last as the drift control (A/B/.../A).

Note: with --cached_text each cell re-runs the knob-independent frozen-BERT
feature precompute (~0.5 s at bench shapes) — accepted cost; the timed
steady-state loop is what the cells compare.

Usage: python benchmarks/stack_knobs_ab.py [--cached_text] [--batch N]
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
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import traceback

    import bench
    from multimodal_transformer_robustness_tpu.ops import encoder

    # (name, REMAT_MIN_TIME, SCAN_UNROLL) — the TRUNK_IMPL axis was retired
    # with the fused-trunk encoder dispatch (measured loss at both production
    # regimes, BENCH_NOTES "staged trunk knobs"; VERDICT r3 #7)
    cells = [
        ("baseline", 1, False),
        ("no_t1_remat", 2, False),
        ("unroll", 1, True),
        ("no_t1_remat+unroll", 2, True),
        ("baseline_again", 1, False),
    ]
    for name, min_time, unroll in cells:
        encoder.REMAT_MIN_TIME = min_time
        encoder.SCAN_UNROLL = unroll
        print(f"--- {name}: REMAT_MIN_TIME={min_time} SCAN_UNROLL={unroll} "
              f"(cached_text={args.cached_text}, B={args.batch})", flush=True)
        try:
            res = bench.main(batch_size=args.batch, steps=args.steps,
                             cached_text=args.cached_text, emit_json=False,
                             repeats=args.repeats,
                             compute_dtype=args.dtype)
            print(f"{name}: {res}", flush=True)
        except Exception:
            # a failing cell must not kill the serialized batch
            traceback.print_exc()
            print(f"{name}: FAILED", flush=True)


if __name__ == "__main__":
    main()
