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
