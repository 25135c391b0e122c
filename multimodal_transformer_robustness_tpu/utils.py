"""Misc host-side utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: the supernet's jitted train step is
    a large program (12+ cross stacks, GRU scans, frozen BERT, autodiff) and
    first-compile costs minutes; with the cache, later processes reuse it.

    Called by every CLI entry point and bench.py.

    CPU backends are EXCLUDED: XLA:CPU persists AOT executables keyed
    without the host's CPU feature set, so a cache written on one machine
    (or this image's build host) gets loaded on another and can SIGILL —
    observed 2026-08-20 aborting a whole pytest run from inside a cache
    write, and cpu_aot_loader logs feature-mismatch errors on every load
    here.  CPU compiles of these programs are fast (~30-60 s cold, vs
    minutes through the TPU tunnel), so the cache only ever paid off on
    TPU anyway.
    """
    import jax

    if jax.default_backend() == "cpu":
        return

    cache_dir = cache_dir or os.environ.get(
        "MTRT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mtrt_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def set_default_prng(impl: str = "rbg") -> None:
    """Select jax's global PRNG implementation.

    The default threefry2x32 generator is expensive on the TPU VPU, and the
    training step draws MANY dropout masks (4 per encoder layer across 18
    vmapped stacks).  Measured on the cached-text B=1024 bf16 MOSEI step:
    threefry 33.9 ms -> rbg 30.3 ms (-11%); the attention-stack portion
    alone went 15.2 -> 11.4 ms.  ``rbg`` is a counter-based generator with
    the same uniform-draw contract — dropout REALIZATIONS change (as they
    differ from torch's generator anyway, and between any two jax impls);
    the distribution, which is the reference contract, does not.  Training
    CLIs and bench default to rbg (``--prng threefry2x32`` reverts); tests
    run under the default threefry.
    """
    import jax

    assert impl in ("threefry2x32", "rbg", "unsafe_rbg")
    jax.config.update("jax_default_prng_impl", impl)


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
