"""Tracing / profiling / cost analysis.

The reference's observability is print-timers plus a commented
``torch.profiler`` block and unused thop/fvcore FLOP imports (SURVEY.md §5).
TPU-native equivalents:
  * :func:`trace` — context manager writing an XPlane/perfetto trace that
    the JAX/TensorBoard profiler UI can open;
  * :class:`StepTimer` — per-step host timers with percentile summary (the
    reference's ``Time/Batch(ms)`` log, train.py:193-199, made reusable);
  * :func:`cost_analysis` — FLOPs / bytes-accessed of a jitted function from
    the compiled HLO (replaces thop/fvcore: exact, includes fusion).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {}
        t = np.asarray(self.times) * 1000
        return {"n": len(t), "mean_ms": float(t.mean()),
                "p50_ms": float(np.percentile(t, 50)),
                "p95_ms": float(np.percentile(t, 95)),
                "max_ms": float(t.max())}

    def report(self) -> str:
        s = self.summary()
        if not s:
            return f"{self.name}: no samples"
        return (f"{self.name}: n={s['n']} mean={s['mean_ms']:.2f}ms "
                f"p50={s['p50_ms']:.2f}ms p95={s['p95_ms']:.2f}ms "
                f"max={s['max_ms']:.2f}ms")


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs and bytes accessed of ``fn(*args)`` from the compiled
    executable's cost analysis (fn may be jitted or plain)."""
    import jax

    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jfn.lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {"flops": float(cost.get("flops", -1)),
            "bytes_accessed": float(cost.get("bytes accessed", -1))}


def device_op_stats(log_dir: str) -> List[tuple]:
    """Parse an XPlane trace directory (written by :func:`trace`) into
    per-op device-time rows ``(op_name, type, occurrences, total_self_us,
    device_pct, bound_by)``, sorted by self time, descending.

    Uses the xprof converter's "framework_op_stats" table — the evidence
    source behind BENCH_NOTES' step-time breakdowns (host timers cannot
    see inside a jitted step; the trace can).  Rows tagged Host (or
    everything, on backends that report no Device rows) are excluded.
    """
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {"tqx": "out:json;"})
    try:
        data = gzip.decompress(data)
    except Exception:
        pass  # already plain json
    tables = json.loads(data)
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = []
    for r in tables[0].get("rows", []):
        d = {c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])}
        if d.get("host_or_device") != "Device":
            continue
        rows.append((d.get("operation"), d.get("type"),
                     d.get("occurrences"), d.get("total_self_time"),
                     d.get("device_total_self_time_percent"),
                     d.get("bound_by")))
    rows.sort(key=lambda t: -(t[3] or 0))
    return rows


def format_op_stats(rows: List[tuple], top: int = 40) -> str:
    """Human-readable top-N table for :func:`device_op_stats` rows."""
    total = sum(r[3] or 0 for r in rows)
    out = [f"device total self time: {total / 1e3:.2f} ms across "
           f"{len(rows)} ops; top {min(top, len(rows))}:",
           f"{'self_us':>10} {'%':>5} {'occ':>5} {'bound':>8}  op"]
    for name, _typ, occ, self_us, pct, bound in rows[:top]:
        out.append(f"{self_us or 0:>10.0f} {pct or 0:>5.1f} {occ or 0:>5} "
                   f"{str(bound or ''):>8}  {str(name)[:110]}")
    return "\n".join(out)
