"""BASELINE.json config coverage — the three reference configs not covered
by bench.py (MOSEI train), sweep_bench.py (MOSEI sweep) or ea_bench.py (EA):

  1. avMNIST image+audio test_single (dimension 40, 4 heads, 2 layers, B=16)
  2. MOSI 3-modality sentiment, README hyperparams scaled down
  3. UR-FUNNY humor detection, FULL missing-modality robustness sweep

No real datasets exist in this environment (zero network egress —
BASELINE.md), so inputs are synthetic at the REAL shapes: throughput and
wall-clock are faithful, accuracies are meaningless (accuracy fidelity is
covered by the cross-framework training-dynamics parity test instead,
tests/test_train_dynamics_parity.py).  The reference cannot run configs 1-3
unmodified at all: its main.py constructs DataLoaders only for mosei_senti
(main.py:134-137 — every other dataset dies on an undefined ``train_loader``
NameError, SURVEY §2.4), so there is no reference-side number to compare.

Run on the TPU: ``python benchmarks/configs_bench.py [--epoch_rows 2048]``.
Appends one JSON line per config to stdout; paste results into
BENCH_NOTES.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time_epochs(trainer, ds, batch_size, n_epochs=2):
    """Warm-up epoch (compiles) + timed epoch.  Returns steady samples/s."""
    import jax

    from multimodal_transformer_robustness_tpu import build_masks, full_active_config
    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator

    it = BatchIterator(ds, batch_size, shuffle=True, seed=0)
    masks = build_masks(trainer.spec, full_active_config(trainer.spec))
    t_epochs = []
    for epoch in range(n_epochs):
        t0 = time.time()
        loss, masks = trainer.train_epoch(it, masks, epoch)
        jax.block_until_ready(trainer.params.proj1["w"])
        t_epochs.append(time.time() - t0)
    n = len(ds)
    return n / t_epochs[-1], t_epochs, float(loss)


def bench_avmnist(args):
    """avMNIST test_single: the CPU-runnable reference config
    (BASELINE.json configs[0]) at real input shapes 28x28 / 112x112."""
    import jax

    from multimodal_transformer_robustness_tpu import ModelSpec
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _synth import synth_avmnist

    spec = ModelSpec(
        modality_set=("i", "A"), orig_dimensions=(28, 112), dimension=40,
        num_heads=4, head_dim=10, layers_single_attn=2, layers_cross_attn=2,
        layers_self_attn=2, attn_dropout=(0.1, 0.0, 0.0), relu_dropout=0.1,
        res_dropout=0.1, out_dropout=0.1, embed_dropout=0.1, attn_mask=True,
        output_dim=10)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(batch_size=16, experiment_type="test_single",
                      modality_pool=[[0, 1]], criterion="CrossEntropyLoss",
                      dataset="avmnist", log_interval=10**9)
    trainer = Trainer(spec, params, frozen, hp)
    ds = synth_avmnist(args.epoch_rows, seed=0)
    sps, t_epochs, _ = _time_epochs(trainer, ds, 16)
    return {"metric": "avmnist_test_single_train_samples_per_sec_per_chip",
            "value": round(sps, 2), "unit": "samples/sec", "batch": 16,
            "rows": args.epoch_rows, "warm_epoch_s": round(t_epochs[-1], 3),
            "cold_epoch_s": round(t_epochs[0], 3)}


def _multibench_spec(dims, output_dim):
    from multimodal_transformer_robustness_tpu import ModelSpec

    # README MOSEI hyperparams scaled down (d 200 -> 40, same depth); text
    # in the MultiBench aligned format is GloVe features, so the text header
    # is the plain RNN header (data/multibench.py), not BERT
    return ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=dims, dimension=40,
        num_heads=8, head_dim=5, layers_single_attn=3, layers_cross_attn=4,
        layers_self_attn=2, attn_dropout=(0.1, 0.1, 0.0, 0.0),
        relu_dropout=0.1, res_dropout=0.3, out_dropout=0.1, embed_dropout=0.3,
        attn_mask=True, output_dim=output_dim,
        header_overrides={"t": "rnn"})


def _synth_seq(rows, dims, t, output_dim, seed=0):
    from multimodal_transformer_robustness_tpu.data.loaders import ArrayDataset

    rng = np.random.default_rng(seed)
    xs = [rng.standard_normal((rows, t, d)).astype(np.float32) for d in dims]
    if output_dim == 1:
        labels = rng.standard_normal((rows, 1)).astype(np.float32)
    else:
        labels = rng.integers(0, output_dim, (rows,)).astype(np.int64)
    return ArrayDataset(xs, labels, dims=list(dims), seq_len=t)


def bench_mosi(args):
    """MOSI scaled (BASELINE.json configs[1]): MultiBench aligned shapes
    (GloVe 300 / COVAREP 74 / FACET 35, T=50)."""
    import jax

    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer

    spec = _multibench_spec((300, 74, 35), output_dim=1)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(batch_size=16, experiment_type="random_sample",
                      modality_pool=[[0], [1], [2], [0, 1], [0, 2], [1, 2],
                                     [0, 1, 2]],
                      criterion="L1Loss", dataset="mosi",
                      log_interval=10**9)
    trainer = Trainer(spec, params, frozen, hp)
    ds = _synth_seq(args.epoch_rows, spec.orig_dimensions, 50, 1)
    sps, t_epochs, _ = _time_epochs(trainer, ds, 16)
    return {"metric": "mosi_scaled_train_samples_per_sec_per_chip",
            "value": round(sps, 2), "unit": "samples/sec", "batch": 16,
            "rows": args.epoch_rows, "warm_epoch_s": round(t_epochs[-1], 3),
            "cold_epoch_s": round(t_epochs[0], 3)}


def bench_urfunny_sweep(args):
    """UR-FUNNY full missing-modality sweep (BASELINE.json configs[3]):
    MultiBench shapes (GloVe 300 / COVAREP 81 / OpenFace 371)."""
    import jax

    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
    from multimodal_transformer_robustness_tpu.train import sweep as sweep_mod

    spec = _multibench_spec((300, 81, 371), output_dim=2)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(batch_size=16, experiment_type="random_sample",
                      criterion="CrossEntropyLoss", dataset="urfunny",
                      log_interval=10**9)
    trainer = Trainer(spec, params, frozen, hp)
    valid = _synth_seq(args.sweep_rows, spec.orig_dimensions, 50, 2, seed=1)

    n_cfgs = 0
    for subset in sweep_mod.subset_choices(spec, "random_sample"):
        _, cands = sweep_mod.enumerate_subset_candidates(
            spec, "random_sample", subset)
        n_cfgs += (len(sweep_mod.depth_combos(spec, "random_sample"))
                   * len(cands))

    dev = sweep_mod.upload_eval_batches(BatchIterator(valid, 256))
    t0 = time.time()
    sweep_mod.missing_modality_sweep(trainer, None, None, quiet=True,
                                     device_batches=dev, device_test=dev)
    cold = time.time() - t0
    t0 = time.time()
    sweep_mod.missing_modality_sweep(trainer, None, None, quiet=True,
                                     device_batches=dev, device_test=dev)
    warm = time.time() - t0
    return {"metric": "urfunny_missing_modality_sweep_wall_clock",
            "value": round(warm, 2), "unit": "seconds",
            "configs_evaluated": n_cfgs, "rows": args.sweep_rows,
            "first_run_s": round(cold, 2)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epoch_rows", type=int, default=2048)
    p.add_argument("--sweep_rows", type=int, default=1000)
    p.add_argument("--only", choices=["avmnist", "mosi", "urfunny"])
    args = p.parse_args(argv)

    from multimodal_transformer_robustness_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    benches = {"avmnist": bench_avmnist, "mosi": bench_mosi,
               "urfunny": bench_urfunny_sweep}
    names = [args.only] if args.only else list(benches)
    for name in names:
        res = benches[name](args)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
