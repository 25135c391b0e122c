"""Misc host-side utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: the supernet's jitted train step is
    a large program (12+ cross stacks, GRU scans, frozen BERT, autodiff) and
    first-compile costs minutes; with the cache, later processes reuse it.

    Called by every CLI entry point and bench.py.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MTRT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mtrt_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def count_parameters(params, print_table: bool = True) -> int:
    """Parameter count dump (reference src/utils.py:9-19 PrettyTable; plain
    text here — prettytable is not in the environment)."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    rows = []
    for path, x in flat:
        n = int(np.prod(x.shape)) if hasattr(x, "shape") else 1
        total += n
        rows.append(("/".join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                              for p in path), n))
    if print_table:
        width = max((len(r[0]) for r in rows), default=10)
        for name, n in rows:
            print(f"{name:<{width}}  {n}")
        print(f"Total Trainable Params: {total}")
    return total
