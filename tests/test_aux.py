"""Auxiliary subsystems: CMD loss (vs torch reference formula), profiling,
parameter counting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.profiling import StepTimer, cost_analysis
from multimodal_transformer_robustness_tpu.train.losses import cmd
from multimodal_transformer_robustness_tpu.utils import count_parameters


def test_cmd_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((16, 8)).astype(np.float32)
    x2 = rng.standard_normal((16, 8)).astype(np.float32)

    # independent torch evaluation of the reference formula (src/utils.py:21-49)
    t1, t2 = torch.from_numpy(x1), torch.from_numpy(x2)
    mx1, mx2 = t1.mean(0), t2.mean(0)
    sx1, sx2 = t1 - mx1, t2 - mx2
    def mn(a, b):
        return torch.sum((a - b) ** 2) ** 0.5
    expect = mn(mx1, mx2)
    for k in range(2, 5):
        expect = expect + mn(sx1.pow(k).mean(0), sx2.pow(k).mean(0))

    ours = cmd(jnp.asarray(x1), jnp.asarray(x2), n_moments=4)
    np.testing.assert_allclose(float(ours), float(expect), rtol=1e-5)


def test_step_timer():
    t = StepTimer("x")
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3 and s["mean_ms"] >= 0
    assert "p95" in t.report()


def test_cost_analysis_flops():
    def f(a, b):
        return a @ b

    a = jnp.ones((64, 32))
    b = jnp.ones((32, 16))
    cost = cost_analysis(f, a, b)
    # 2*M*N*K FLOPs for the matmul
    assert cost["flops"] == pytest.approx(2 * 64 * 32 * 16, rel=0.5)


def test_count_parameters():
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert count_parameters(params, print_table=False) == 17
