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
