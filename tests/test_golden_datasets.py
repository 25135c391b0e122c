"""Per-dataset golden printed-output fixtures (VERDICT r4 next #7).

The byte-format of the printed training log and robustness-sweep blocks IS
the public contract (metrics.py docstring; reference train.py:376-404 and
eval_metrics.py print layouts).  tests/test_cli_golden.py pins the
mosei_senti CLI sweep block; this file pins the remaining per-dataset
surfaces — avMNIST, mojupush (GentlePush), enrico, eeg2a — each captured as
fit()'s train-log excerpt (batch log lines, per-epoch summary block,
training curve) plus the full missing-modality sweep block, with every
standalone number normalized to ``#`` (values are seeded but
platform-sensitive; the KEYS, ORDER and PUNCTUATION are the contract).

The capture runs at the Trainer level rather than through cli.main: the
print sites are identical (train/loop.py fit/train_epoch, train/sweep.py),
and the avmnist loader's valid split slices rows [55000:60000] of the
on-disk train file (data/avmnist.py:29-31, replicating the reference), so a
CLI-level fixture would need a 55k-row synthetic file.

Regenerate after an intentional format change:
    python tests/test_golden_datasets.py regen
"""

import contextlib
import io
import os
import re
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root (script/regen mode)
GOLDEN_DIR = os.path.join(HERE, "golden")
DATASETS = ["avmnist", "mojupush", "enrico", "eeg2a"]


def _tiny_spec(modality_set, dims, output_dim, **kw):
    from multimodal_transformer_robustness_tpu import ModelSpec

    m = len(modality_set)
    return ModelSpec(
        modality_set=modality_set, orig_dimensions=dims, dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.1,) + (0.0,) * m,
        relu_dropout=0.1, res_dropout=0.1, out_dropout=0.1, embed_dropout=0.1,
        attn_mask=True, output_dim=output_dim, **kw)


def _seq_ds(rng, n, t, dims, labels):
    from multimodal_transformer_robustness_tpu.data.loaders import ArrayDataset

    xs = [rng.standard_normal((n, t, d)).astype(np.float32) for d in dims]
    return ArrayDataset(xs, labels, dims=list(dims), seq_len=t)


def _case(name):
    """(spec, (train, valid, test), criterion, modality_pool) per dataset —
    modality sets / criteria / metric switches match cli.main's tables."""
    sys.path.insert(0, HERE)
    from _synth import synth_avmnist

    rng = np.random.default_rng(1234)
    if name == "avmnist":
        spec = _tiny_spec(("i", "A"), (28, 112), 10)
        dss = tuple(synth_avmnist(32, seed=s) for s in range(3))
        return spec, dss, "CrossEntropyLoss", [[0], [1], [0, 1]]
    if name == "mojupush":
        # GentlePush: gripper_pos / gripper_sensors / image / controls,
        # per-step (x, y) regression labels (all_steps=True, main.py:139-140)
        dims, t = (3, 7, 16, 7), 16
        spec = _tiny_spec(("g", "s", "m", "c"), dims, 2, all_steps=True)

        def ds(seed):
            r = np.random.default_rng(seed)
            labels = r.standard_normal((24, t, 2)).astype(np.float32)
            return _seq_ds(r, 24, t, dims, labels)

        return spec, (ds(0), ds(1), ds(2)), "MSELoss", [[0, 1, 2, 3], [2], [0, 3]]
    if name == "enrico":
        # screenshot / wireframe embedding streams, 20 design topics
        dims, t = (12, 12), 8
        spec = _tiny_spec(("s", "w"), dims, 20)

        def ds(seed):
            r = np.random.default_rng(seed)
            labels = r.integers(0, 20, 24).astype(np.int64)
            return _seq_ds(r, 24, t, dims, labels)

        return spec, (ds(0), ds(1), ds(2)), "CrossEntropyLoss", [[0], [1], [0, 1]]
    if name == "eeg2a":
        # single-modality EEG, 4 motor-imagery classes (degenerate sweep)
        dims, t = (5,), 6
        spec = _tiny_spec(("e",), dims, 4)

        def ds(seed):
            r = np.random.default_rng(seed)
            labels = r.integers(0, 4, 24).astype(np.int64)
            return _seq_ds(r, 24, t, dims, labels)

        return spec, (ds(0), ds(1), ds(2)), "CrossEntropyLoss", [[0]]
    raise KeyError(name)


def _run(name) -> str:
    import jax

    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
    from multimodal_transformer_robustness_tpu.train.sweep import (
        missing_modality_sweep)

    spec, (tr, va, te), criterion, pool = _case(name)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(batch_size=8, lr=1e-3, num_epochs=2, when=5,
                      experiment_type="random_sample", modality_pool=pool,
                      criterion=criterion, dataset=name, log_interval=2,
                      seed=1111)
    trainer = Trainer(spec, params, frozen, hp)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        trainer.fit(BatchIterator(tr, 8, shuffle=True, seed=0),
                    BatchIterator(va, 8), BatchIterator(te, 8))
        missing_modality_sweep(trainer, BatchIterator(va, 8),
                               BatchIterator(te, 8))
    return buf.getvalue()


def _normalize(out: str) -> str:
    """Every standalone number -> ``#`` (keys like mult_acc_7 keep their
    digits — preceded by a word character; same rule as
    tests/test_cli_golden.py), then space runs -> one space: the train-log
    lines use fixed-width formats ({:5.2f}, {:2d}) whose PADDING depends on
    the value magnitude (a 9 ms batch pads one space more than a 12 ms one),
    so padding width is explicitly not part of the pinned contract."""
    norm = re.sub(r"(?<![\w.])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", "#", out)
    return re.sub(r" +", " ", norm)


@pytest.mark.parametrize("name", DATASETS)
def test_dataset_output_contract(name):
    norm = _normalize(_run(name))
    path = os.path.join(GOLDEN_DIR, f"{name}_output.txt")
    with open(path) as f:
        golden = f.read()
    assert norm == golden, (
        f"{name} printed contract drifted; if the change is intentional run "
        "`python tests/test_golden_datasets.py regen`")


if __name__ == "__main__":
    assert sys.argv[1:] == ["regen"], __doc__
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")  # ambient axon overrides env
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in DATASETS:
        norm = _normalize(_run(name))
        path = os.path.join(GOLDEN_DIR, f"{name}_output.txt")
        with open(path, "w") as f:
            f.write(norm)
        print(f"wrote {path} ({len(norm)} bytes)")
