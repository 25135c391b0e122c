"""Flagship END-TO-END epoch wall-clock (VERDICT r2 next #4b): the full
production Trainer.fit loop — device-resident loader gather, per-step
config sampling, train steps, the random_sample (M+1) validation evals and
the test eval, plateau scheduling — at the headline MOSEI operating point
(B=1024, bf16 compute, cached text features, --device_data), on synthetic
data at the REAL MOSEI shapes (16,326 train / 1,871 valid / 4,659 test
rows; no datasets ship in this environment, BASELINE.md).

Prints one JSON line; paste into BENCH_NOTES.md.

Run on the TPU: ``python benchmarks/e2e_epoch_bench.py``
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=16326)
    p.add_argument("--n_valid", type=int, default=1871)
    p.add_argument("--n_test", type=int, default=4659)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--eval_batch", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--bert_layers", type=int, default=4)
    args = p.parse_args(argv)

    from multimodal_transformer_robustness_tpu.utils import (
        enable_compilation_cache, set_default_prng)

    enable_compilation_cache()
    set_default_prng("rbg")
    import dataclasses

    import jax

    from __graft_entry__ import _mosei_spec
    from multimodal_transformer_robustness_tpu.data.device import (
        DeviceBatchIterator)
    from multimodal_transformer_robustness_tpu.data.loaders import ArrayDataset
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.models.bert import BertConfig
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)
    from multimodal_transformer_robustness_tpu.train.features import (
        zero_token_features)

    spec = dataclasses.replace(_mosei_spec(), compute_dtype="bfloat16")
    bert_cfg = BertConfig(num_layers=args.bert_layers)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)

    T, L, H = 50, 32, bert_cfg.hidden_size
    rng = np.random.default_rng(0)

    def ds(n, seed):
        r = np.random.default_rng(seed)
        # cached-text pipeline: the text slot carries precomputed [L, H]
        # frozen-BERT features (synthetic values — the extractor cost is
        # measured separately in bench.py --cached_text; here we measure the
        # steady-state epochs it enables)
        return ArrayDataset(
            [r.standard_normal((n, L, H)).astype(np.float32),
             r.standard_normal((n, T, 768)).astype(np.float32),
             r.standard_normal((n, T, 512)).astype(np.float32)],
            r.standard_normal((n, 1)).astype(np.float32),
            dims=(H, 768, 512), seq_len=T)

    zero_rows = {0: zero_token_features(frozen, bert_cfg, L,
                                        compute_dtype="bfloat16")}
    hp = TrainHParams(batch_size=args.batch, lr=1e-4, optim="Adam",
                      num_epochs=args.epochs, when=20,
                      experiment_type="random_sample",
                      modality_pool=[[0], [1], [2], [0, 1], [0, 2], [1, 2],
                                     [0, 1, 2]],
                      criterion="L1Loss", dataset="mosei_senti", seed=1111,
                      log_interval=10_000)
    trainer = Trainer(spec, params, frozen, hp, bert_cfg=bert_cfg,
                      zero_fill_rows=zero_rows)

    t0 = time.time()
    train_loader = DeviceBatchIterator(ds(args.n_train, 0), args.batch,
                                       shuffle=True, seed=1111,
                                       store_dtype="bfloat16")
    valid_loader = DeviceBatchIterator(ds(args.n_valid, 1), args.eval_batch,
                                       store_dtype="bfloat16")
    test_loader = DeviceBatchIterator(ds(args.n_test, 2), args.eval_batch,
                                      store_dtype="bfloat16")
    upload_s = time.time() - t0
    print(f"dataset HBM upload: {upload_s:.1f} s (once per run)",
          file=sys.stderr)

    # warm fit compiles everything (train step + eval step)
    t0 = time.time()
    trainer.fit(train_loader, valid_loader, test_loader)
    total_s = time.time() - t0
    # steady state = re-fit on the SAME trainer: its in-process jit caches
    # are warm, exactly like epochs 3..20 of a 20-epoch run.  (A FRESH
    # Trainer is NOT steady state: new jit closures retrace everything and
    # round 3 measured one program missing the persistent compile cache,
    # ~16 s of backend compile — the round-2 "steady 10.39 s/epoch" number
    # was dominated by that pollution; true steady epochs are ~8x faster.)
    t0 = time.time()
    trainer.fit(train_loader, valid_loader, test_loader)
    steady_s = time.time() - t0

    per_epoch = steady_s / args.epochs
    result = {
        "metric": "mosei_end_to_end_epoch_wall_clock",
        "rows_train": args.n_train,
        "batch": args.batch,
        "pipeline": "cached_text + device_data + bf16 + rbg",
        "hbm_upload_s": round(upload_s, 1),
        "first_fit_incl_compile_s": round(total_s, 1),
        "steady_epoch_s": round(per_epoch, 2),
        "epochs_per_hour": round(3600 / per_epoch, 1),
        "train_samples_per_sec_end_to_end": round(
            args.n_train / per_epoch, 1),
        "note": ("each epoch includes the (M+1)=4 duplicate full validation "
                 "evals + 1 test eval the reference's random_sample loop "
                 "performs (train.py:444-460)"),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
