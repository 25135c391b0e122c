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


def test_profiled_epoch_writes_trace(tmp_path):
    """Trainer.profile_dir wraps one epoch in an XPlane trace (the cli
    --profile path); the trace parses through device_op_stats."""
    import glob

    import jax
    import numpy as np

    from multimodal_transformer_robustness_tpu import ModelSpec
    from multimodal_transformer_robustness_tpu.data.loaders import (
        ArrayDataset, BatchIterator)
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.profiling import (
        device_op_stats, format_op_stats)
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)

    spec = ModelSpec(
        modality_set=("a", "v"), orig_dimensions=(10, 8), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(batch_size=4, lr=1e-3, optim="Adam", num_epochs=1,
                      experiment_type="random_sample", criterion="L1Loss",
                      dataset="mosei_senti", seed=0, log_interval=1000)
    trainer = Trainer(spec, params, frozen, hp)
    trainer.profile_dir = str(tmp_path / "prof")

    r = np.random.default_rng(0)
    ds = ArrayDataset([r.standard_normal((8, 5, d)).astype(np.float32)
                       for d in spec.orig_dimensions],
                      r.standard_normal((8, 1)).astype(np.float32),
                      dims=spec.orig_dimensions, seq_len=5)
    trainer.fit(BatchIterator(ds, 4, shuffle=True, seed=0),
                BatchIterator(ds, 4), BatchIterator(ds, 4))

    assert glob.glob(str(tmp_path / "prof" / "**" / "*.xplane.pb"),
                     recursive=True), "no xplane trace written"
    # analysis is best-effort on CPU (framework_op_stats may report zero
    # Device rows there) but must parse without raising
    rows = device_op_stats(str(tmp_path / "prof"))
    assert isinstance(rows, list)
    assert format_op_stats(rows).startswith("device total self time")
