"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
paths are exercised without TPU hardware (SURVEY.md build plan; tests must
be runnable anywhere)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np
import pytest

# The axon TPU plugin (this machine's tunnel to one real chip) overrides the
# JAX_PLATFORMS env var at import; jax.config wins over it.  Tests always run
# on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch float32; JAX's DEFAULT matmul precision
# feeds bf16 into the MXU/CPU kernels, which is a ~1e-3 deviation.  Pin full
# float32 accumulation for the test suite; speed runs opt into bf16 via the
# library's precision policy.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _pin_global_jax_config():
    """Tests that drive the production CLIs in-process (test_cli_golden,
    test_hf_bert_load, …) execute ``utils.enable_compilation_cache()`` and
    ``utils.set_default_prng("rbg")`` — PROCESS-GLOBAL jax.config updates
    that otherwise leak into every later test.  Measured consequences of the
    leak (2026-08-20 full-suite run): the golden printed-output fixtures
    diverge (per-batch config sampling draws from the global PRNG impl, so
    rbg != the threefry the fixtures were captured under), and the persistent
    compilation cache starts loading/storing CPU AOT executables mid-suite
    (cross-machine entries warn about SIGILL; one cache *write* aborted the
    whole pytest process inside put_executable_and_time).  Re-pin the suite
    invariants before every test so ordering can't change behavior.
    """
    for key, val in (("jax_default_prng_impl", "threefry2x32"),
                     ("jax_compilation_cache_dir", None),
                     ("jax_default_matmul_precision", "highest"),
                     ("jax_platforms", "cpu")):
        # read back via the public attribute (jax.config exposes every flag
        # as an attribute; the private _read used before could vanish in a
        # jax upgrade) and only update on drift — update() itself fires
        # change hooks (backend resets for jax_platforms) we don't want to
        # trigger 239 times per run
        if getattr(jax.config, key) != val:
            jax.config.update(key, val)
    # pinning jax_compilation_cache_dir=None is NOT enough once a test has
    # initialized the cache: jax's module-global _cache object persists and
    # _get_cache() keeps returning it regardless of the config
    # (compilation_cache.py::_initialize_cache runs at most once) — the
    # 2026-08-20 suite abort inside put_executable_and_time happened in a
    # test that never touched the cache.  Tear the object down too.
    # (utils.enable_compilation_cache is additionally a no-op on CPU now,
    # so in-process CLI tests shouldn't initialize it in the first place.)
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.reset_cache()
    yield
