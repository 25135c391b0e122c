"""Golden end-to-end CLI output contract (VERDICT r2 next #8): run the real
``cli.main`` on synthetic MOSEI shards with ``--run_sweep`` and assert the
printed per-subset metric block — the reference's published output contract
(train.py:376-404 / src/eval_metrics.py print layout) — matches a checked-in
golden, with numeric values normalized to ``#`` (they are seeded but
platform-sensitive; the KEYS, ORDER and PUNCTUATION are the contract).

Regenerate after an intentional format change:
    python tests/test_cli_golden.py regen
"""

import os
import re
import sys

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "sweep_output.txt")

ARGS = [
    "--dataset", "mosei_senti",
    "--attn_dropout", "0.1", "0.1", "0.0", "0.0",
    "--dimension", "8", "--num_heads", "2", "--head_dim", "4",
    "--layers_single_attn", "2", "--layers_cross_attn", "2",
    "--layers_self_attn", "1", "--batch_size", "8", "--num_epochs", "1",
    "--lr", "0.001", "--experiment_type", "random_sample",
    "--run_sweep", "--max_shards", "1", "--seed", "1111",
]


def _run(tmp_dir: str) -> str:
    import contextlib
    import io

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root (script mode)
    from _synth import write_synth_mosei_shards

    from multimodal_transformer_robustness_tpu.cli.main import main

    write_synth_mosei_shards(tmp_dir, n_train=24)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(ARGS + ["--data_path", tmp_dir])
    return buf.getvalue()


def _normalize(out: str) -> str:
    """The sweep block with every standalone number replaced by ``#`` (keys
    like mult_acc_7 keep their digits — preceded by a word character)."""
    start = out.index("['t'] : { ")
    block = out[start:]
    return re.sub(r"(?<![\w.])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", "#", block)


def test_cli_sweep_output_contract(tmp_path):
    norm = _normalize(_run(str(tmp_path)))
    with open(GOLDEN) as f:
        golden = f.read()
    assert norm == golden, (
        "CLI sweep output drifted from the reference contract; if the "
        "change is intentional run `python tests/test_cli_golden.py regen`")


if __name__ == "__main__":
    assert sys.argv[1:] == ["regen"], __doc__
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")  # ambient axon overrides env
    import tempfile

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with tempfile.TemporaryDirectory() as d:
        norm = _normalize(_run(d))
    with open(GOLDEN, "w") as f:
        f.write(norm)
    print(f"wrote {GOLDEN} ({len(norm)} bytes)")
