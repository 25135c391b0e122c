"""Op-level device-time attribution of the headline train step.

Captures an XPlane trace of a few bench.py train steps (jax.profiler via
profiling.trace) and prints the top HLO ops by self device time, via the
xprof converter that ships in this image ("framework_op_stats" gviz table).
This is the evidence source for BENCH_NOTES' step-time breakdowns — host
timers can't see inside a jitted step; the trace can.

Run on the TPU:
    python benchmarks/profile_step.py [--cached_text] [--batch 1024] [--top 40]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(batch, cached_text, steps, logdir):
    """Run bench.main's step under a profiler trace (same model/pipeline)."""
    import jax

    import bench
    from multimodal_transformer_robustness_tpu.profiling import trace

    with trace(logdir):
        bench.main(batch_size=batch, steps=steps, warmup=2,
                   cached_text=cached_text, emit_json=False)
    jax.effects_barrier()


def op_stats(logdir):
    """Thin wrapper kept for CLI compatibility — the implementation
    lives in profiling.device_op_stats (shared with cli/main --profile)."""
    from multimodal_transformer_robustness_tpu.profiling import device_op_stats

    return device_op_stats(logdir)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cached_text", action="store_true")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/xprof_step")
    p.add_argument("--reuse", action="store_true",
                   help="skip capture, re-analyze an existing logdir")
    args = p.parse_args(argv)

    if not args.reuse:
        capture(args.batch, args.cached_text, args.steps, args.logdir)

    rows = op_stats(args.logdir)
    total = sum(r[3] or 0 for r in rows)
    print(f"device total self time: {total / 1e3:.2f} ms across "
          f"{len(rows)} ops; top {args.top}:")
    print(f"{'self_us':>10} {'%':>5} {'occ':>5} {'bound':>8}  op")
    for name, typ, occ, self_us, pct, bound in rows[:args.top]:
        print(f"{self_us or 0:>10.0f} {pct or 0:>5.1f} {occ or 0:>5} "
              f"{str(bound or ''):>8}  {str(name)[:110]}")


if __name__ == "__main__":
    main()
