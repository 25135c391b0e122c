"""Train/eval driver — the reference's ``main.py`` flag surface
(reference main.py:12-170) on the TPU-native engine.

Usage matches the reference's canonical command (run.sh), e.g.::

    python -m multimodal_transformer_robustness_tpu.cli.main \
        --dataset mosei_senti --attn_dropout 0.1 0.1 0.0 0.0 \
        --modality_pool 2 --num_epochs 20 --lr 0.0001 --when 120 \
        --dimension 200 --num_heads 8 --head_dim 25 \
        --layers_single_attn 3 --layers_self_attn 2 --batch_size 16 \
        --experiment_type test_single --data_path ... --model_path ...

Additions over the reference (kept additive): ``--bert_dir`` (local BERT
checkpoint directory instead of the reference's hardcoded path),
``--run_sweep`` (the reference's final test_missing_modality call is
commented out at train.py:518-527; here it is a flag), ``--max_shards``.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MULT Multimodality Learning")
    p.add_argument("-f", default="", type=str)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    # dropouts
    p.add_argument("--attn_dropout", nargs="*", type=float, default=[0.1, 0, 0])
    p.add_argument("--relu_dropout", type=float, default=0.1)
    p.add_argument("--embed_dropout", type=float, default=0.3)
    p.add_argument("--res_dropout", type=float, default=0.3)
    p.add_argument("--out_dropout", type=float, default=0.1)
    # architecture
    p.add_argument("--dimension", type=int, default=30)
    p.add_argument("--layers_cross_attn", type=int, default=4)
    p.add_argument("--layers_single_attn", type=int, default=3)
    p.add_argument("--layers_self_attn", type=int, default=3)
    p.add_argument("--num_heads", type=int, default=5)
    p.add_argument("--head_dim", type=int, default=6)
    p.add_argument("--attn_mask", action="store_false")
    p.add_argument("--modality_pool", type=int, nargs="+", action="append",
                   default=None)
    p.add_argument("--modality_set", type=str, nargs="*", default=["t", "a", "v"])
    p.add_argument("--all_steps", action="store_true")
    p.add_argument("--all_module", action="store_true")
    p.add_argument("--specific", type=int, nargs="+", action="append", default=None)
    # tuning
    p.add_argument("--batch_size", type=int, default=16, metavar="N")
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optim", type=str, default="Adam")
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--when", type=int, default=10)
    p.add_argument("--batch_chunk", type=int, default=1)
    # logistics
    p.add_argument("--log_interval", type=int, default=360)
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--no_cuda", action="store_true")  # accepted, ignored (TPU)
    # TPU-native additive flag: jax PRNG impl for dropout draws (rbg is much
    # cheaper on the VPU; see utils.set_default_prng for the measurement)
    p.add_argument("--prng", default="rbg",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"])
    # stages
    p.add_argument("--pretrain", type=str, default=None)
    # TPU-native additive flag: continue an interrupted run EXACTLY from
    # <model_path>_train (optimizer/scheduler/RNG state; the reference's
    # --pretrain reloads weights but restarts optimization)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--experiment_type", type=str, default="random_sample")
    # TPU-build additions
    p.add_argument("--bert_dir", type=str, default=None,
                   help="local HF BERT checkpoint dir (replaces the "
                        "reference's hardcoded path)")
    p.add_argument("--run_sweep", action="store_true",
                   help="run the missing-modality sweep after training")
    p.add_argument("--max_shards", type=int, default=None,
                   help="cap MOSEI shard count (debug)")
    # eeg2a extras (the reference's get_data exposes these kwargs but main.py
    # never wires them — utils.py:51,66-69; additive fix)
    p.add_argument("--attn_impl", choices=["xla", "flash"], default="xla",
                   help="eval-mode attention implementation; 'flash' routes "
                        "through the fused Pallas kernel")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 = TPU mixed-precision training (f32 master "
                        "params, bf16 compute; f32 softmax/LN moments). "
                        "Measured ~1.3-1.4x train throughput at large batch; "
                        "tolerance story in tests/test_bf16_policy.py")
    p.add_argument("--bert_int8", action="store_true",
                   help="int8-quantize the frozen BERT's projection/FFN "
                        "matmuls (per-out-channel weights, dynamic per-token "
                        "activations; 2x MXU rate on v5e). Additive TPU "
                        "feature, no reference counterpart; feature-error "
                        "bounds in tests/test_bert_int8.py. Ignored with "
                        "--cache_text (BERT runs once either way)")
    p.add_argument("--cache_text", action="store_true",
                   help="precompute frozen-BERT text features once per "
                        "dataset and train/eval on them (exact: BERT is "
                        "frozen and deterministic; missing-text eval "
                        "substitutes the precomputed BERT(zero-tokens) row). "
                        "Removes ~half the train-step cost at the MOSEI "
                        "config — see train/features.py")
    p.add_argument("--sort_supernet", action="store_true",
                   help="after training, importance-sort every encoder "
                        "layer's heads/head-dims/FFN units (OFA-style, "
                        "models/sorting.py) so prefix-masked subnets keep "
                        "the most important units; full-config outputs are "
                        "invariant. Applies before --run_sweep and before "
                        "the final checkpoint. The reference defines sorts "
                        "(dynamic_multihead_attention.py:166-241) but never "
                        "calls them from any driver")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh for multi-chip scaling, e.g. 'dp=8' "
                        "(data parallel over all 8 chips), 'dp=4,mp=2' "
                        "(4-way data x 2-way tensor over attention heads / "
                        "FFN units), 'dp=-1' (all devices). Params/optimizer "
                        "shard per parallel.mesh.supernet_param_spec; "
                        "batches shard over dp; the sweep/EA config axis "
                        "shards over every device. Multi-host: set "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID and the dp axis stretches across "
                        "processes over DCN")
    p.add_argument("--async_ckpt", action="store_true",
                   help="write the per-epoch training-state checkpoint in "
                        "background threads (orbax AsyncCheckpointer): the "
                        "device->host copy stays synchronous, so the "
                        "snapshot is exact, but serialization + disk I/O "
                        "(~3.5-6 s at MOSEI size, vs the 0.66 s flagship "
                        "epoch) overlap the next epoch's training")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="write an XPlane trace of one training epoch "
                        "(the first post-compile one) under DIR and print "
                        "the top device ops by self time after training. "
                        "Open DIR with the TensorBoard/XProf profiler for "
                        "the full timeline. The reference's observability "
                        "is a commented torch.profiler block "
                        "(real-time.py:147-156) and print timers")
    p.add_argument("--device_data", action="store_true",
                   help="whole-dataset HBM residency + on-device batch "
                        "gather (data/device.py) — removes the host input "
                        "bottleneck (single-core host: ~3.4 s/batch gather "
                        "vs a ~34 ms train step)")
    p.add_argument("--eeg_train_ratio", type=float, default=0.8)
    p.add_argument("--eeg_train_files", type=str, nargs="*", default=None)
    p.add_argument("--eeg_test_files", type=str, nargs="*", default=None)
    return p


# per-dataset tables (reference main.py:90-114) + additive entries for the
# MultiBench datasets the reference never wired (MOSI, UR-FUNNY, sarcasm)
OUTPUT_DIM = {"mosei_senti": 1, "avmnist": 10, "mojupush": 2, "enrico": 20,
              "eeg2a": 4, "mosi": 1, "urfunny": 2, "sarcasm": 2}
CRITERION = {"mosei_senti": "L1Loss", "avmnist": "CrossEntropyLoss",
             "mojupush": "MSELoss", "enrico": "CrossEntropyLoss",
             "eeg2a": "CrossEntropyLoss", "mosi": "L1Loss",
             "urfunny": "CrossEntropyLoss", "sarcasm": "CrossEntropyLoss"}
EVAL_BATCH = {"mosei_senti": 16, "avmnist": 128 * 4, "mojupush": 128 * 4,
              "enrico": 128 * 4, "eeg2a": 64, "mosi": 64, "urfunny": 64,
              "sarcasm": 64}


def main(argv=None):
    import jax

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from .. import ModelSpec
    from ..data import BatchIterator, get_data
    from ..checkpoint import save_checkpoint
    from ..models import init_supernet
    from ..models.bert import BertConfig
    from ..train import TrainHParams, Trainer
    from ..train.sweep import masking_inputs_sweep, missing_modality_sweep

    args = build_parser().parse_args(argv)
    from ..utils import set_default_prng
    set_default_prng(args.prng)
    np.random.seed(args.seed)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import (initialize_multihost,
                                     make_multihost_mesh, parse_mesh_axes)

        initialize_multihost()  # no-op single-process; pods read the env
        mesh = make_multihost_mesh(parse_mesh_axes(args.mesh))
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)),
              f"over {mesh.devices.size} devices,",
              f"{jax.process_count()} process(es)")

    print("Start loading the data....")
    kw = {}
    if args.dataset == "mosei_senti":
        kw = {"bert_dir": args.bert_dir, "max_shards": args.max_shards}
    elif args.dataset == "eeg2a":
        kw = {"train_ratio": args.eeg_train_ratio,
              "file_num_range_train": args.eeg_train_files,
              "file_num_range_test": args.eeg_test_files}
    train_data = get_data(args.dataset, args.data_path, "train", **kw)
    valid_data = get_data(args.dataset, args.data_path, "valid", **kw)
    test_data = get_data(args.dataset, args.data_path, "test", **kw)
    print("Finish loading the data....")

    all_steps = args.all_steps or args.dataset == "mojupush"
    orig_d = train_data.get_dim()
    spec = ModelSpec(
        modality_set=tuple(args.modality_set),
        orig_dimensions=tuple(orig_d),
        dimension=args.dimension, num_heads=args.num_heads,
        head_dim=args.head_dim, layers_single_attn=args.layers_single_attn,
        layers_cross_attn=args.layers_cross_attn,
        layers_self_attn=args.layers_self_attn,
        attn_dropout=tuple(args.attn_dropout), relu_dropout=args.relu_dropout,
        res_dropout=args.res_dropout, out_dropout=args.out_dropout,
        embed_dropout=args.embed_dropout, attn_mask=args.attn_mask,
        output_dim=OUTPUT_DIM[args.dataset], all_steps=all_steps,
        attn_impl=args.attn_impl, compute_dtype=args.compute_dtype)

    print("orig_d:", orig_d)
    print("attn_dropout:", list(spec.attn_dropout))
    print("modality_set:", list(spec.modality_set))
    print("modality_pool:", args.modality_pool)
    print("criterion: ", CRITERION[args.dataset])
    print("batch size: ", args.batch_size)
    print("num of train: ", len(train_data))
    print("num of valid: ", len(valid_data))
    print("num of test: ", len(test_data))
    print("sequence length: ", train_data.get_seq_len())

    key = jax.random.PRNGKey(args.seed)
    bert_cfg = None
    if any(spec.header_kind(c) == "bert_rnn" for c in spec.modality_set):
        if args.bert_dir:
            # resolve the checkpoint's real geometry so downstream apply
            # calls don't fall back to BERT-base defaults
            from ..models.bert import load_hf_bert_params

            loaded = load_hf_bert_params(args.bert_dir)
            assert loaded is not None, f"cannot load BERT from {args.bert_dir}"
            bert_cfg = loaded[1]
        else:
            bert_cfg = BertConfig(num_layers=4)  # random-init stand-in; pass
            #                                      --bert_dir for real weights
    params, frozen = init_supernet(key, spec, bert_cfg=bert_cfg,
                                   bert_dir=args.bert_dir)
    if args.pretrain is not None:
        print("Load from pretrain model!!!!!!!!")
        from ..checkpoint import (import_torch_state_dict, load_checkpoint,
                                  load_reference_pickle)

        if args.pretrain.endswith(".pt"):
            params = import_torch_state_dict(
                spec, load_reference_pickle(args.pretrain))
        else:
            params, _ = load_checkpoint(args.pretrain)

    if args.bert_int8 and not args.cache_text and "bert" in frozen:
        from ..models.bert import quantize_bert_params

        # FFN-only quantization (attn=False): keeps the fused Pallas
        # attention-block kernel eligible — measured 12.5 ms vs 22.6 for
        # full int8 at the headline shape (BENCH_NOTES), and more accurate
        frozen = dict(frozen, bert=quantize_bert_params(frozen["bert"],
                                                        attn=False))

    zero_rows = None
    if args.cache_text and "bert" in frozen:
        from ..train.features import CachedTextDataset

        print("Precomputing frozen-BERT text features (--cache_text)....")
        train_data = CachedTextDataset(train_data, frozen, bert_cfg,
                                       compute_dtype=args.compute_dtype)
        valid_data = CachedTextDataset(valid_data, frozen, bert_cfg,
                                       compute_dtype=args.compute_dtype)
        test_data = CachedTextDataset(test_data, frozen, bert_cfg,
                                      compute_dtype=args.compute_dtype)
        zero_rows = train_data.zero_fill_rows()  # eval loaders carry their
        #                                          own rows (Trainer resolves
        #                                          per loader)

    hp = TrainHParams(
        batch_size=args.batch_size, lr=args.lr, optim=args.optim,
        clip=args.clip, num_epochs=args.num_epochs, when=args.when,
        experiment_type=args.experiment_type, modality_pool=args.modality_pool,
        all_module=args.all_module, specific=args.specific,
        criterion=CRITERION[args.dataset], log_interval=args.log_interval,
        seed=args.seed, dataset=args.dataset, model_path=args.model_path,
        batch_chunk=args.batch_chunk)
    trainer = Trainer(spec, params, frozen, hp, bert_cfg=bert_cfg,
                      zero_fill_rows=zero_rows, mesh=mesh)

    eval_bs = EVAL_BATCH[args.dataset]
    if args.device_data:
        from ..data import DeviceBatchIterator

        sd = "bfloat16" if args.compute_dtype == "bfloat16" else None
        train_loader = DeviceBatchIterator(train_data, args.batch_size,
                                           shuffle=True, seed=args.seed,
                                           store_dtype=sd)
        valid_loader = DeviceBatchIterator(valid_data, eval_bs, store_dtype=sd)
        test_loader = DeviceBatchIterator(test_data, eval_bs, store_dtype=sd)
    else:
        # multi-process (pods): every process yields its contiguous slice of
        # each deterministic global batch; Trainer._shard_batch assembles
        # the global array (parallel.mesh.global_batch_from_local)
        if args.compute_dtype == "bfloat16":
            # host-pipeline analog of DeviceBatchIterator's store_dtype:
            # float modality arrays stored (and uploaded) in the compute
            # dtype — bit-identical (supernet_apply's boundary cast is the
            # first op to touch them; tests/test_bf16_policy.py) at half
            # the host->device bytes
            import ml_dtypes

            from ..data.loaders import cast_float_inputs
            for _ds in (train_data, valid_data, test_data):
                cast_float_inputs(_ds, ml_dtypes.bfloat16)
        pshard = ((jax.process_index(), jax.process_count())
                  if jax.process_count() > 1 else None)
        train_loader = BatchIterator(train_data, args.batch_size, shuffle=True,
                                     seed=args.seed, process_shard=pshard)
        valid_loader = BatchIterator(valid_data, eval_bs, process_shard=pshard)
        test_loader = BatchIterator(test_data, eval_bs, process_shard=pshard)

    def save_fn(p, epoch, val):
        if args.model_path:
            print("Saved model at ", args.model_path)
            save_checkpoint(args.model_path, p,
                            extra={"epoch": epoch, "val_acc": float(val)})

    # full training-state checkpoint (optimizer/scheduler/RNG) every epoch,
    # at <model_path>_train; --resume continues the run exactly (the
    # reference's --pretrain reloads weights but restarts optimization)
    epoch_fn = None
    start_epoch = 1
    if args.model_path:
        from ..checkpoint import restore_training_state, save_training_state

        state_path = args.model_path + "_train"

        def epoch_fn(tr, epoch):
            save_training_state(state_path, tr, block=not args.async_ckpt)

        if args.resume:
            start_epoch = restore_training_state(state_path, trainer)
            train_loader.set_epoch(start_epoch - 1)
            print(f"Resumed training state from {state_path}; "
                  f"continuing at epoch {start_epoch}")

    if args.profile:
        trainer.profile_dir = args.profile

    trainer.fit(train_loader, valid_loader, test_loader, save_fn=save_fn,
                epoch_fn=epoch_fn, start_epoch=start_epoch)

    if args.profile:
        from ..profiling import device_op_stats, format_op_stats

        try:
            print(format_op_stats(device_op_stats(args.profile), top=30))
        except Exception as e:  # trace written; analysis is best-effort
            print(f"profile trace written to {args.profile}; op-stats "
                  f"analysis unavailable here ({type(e).__name__}: {e})")

    if args.sort_supernet:
        from ..models.sorting import sort_supernet

        print("Sorting supernet units by importance (--sort_supernet)....")
        trainer.params = sort_supernet(spec, trainer.params)
        if mesh is not None:  # re-pin the library shardings after the gathers
            from ..parallel.mesh import shard_supernet_params

            trainer.params = shard_supernet_params(trainer.params, mesh)
        if args.model_path:
            save_checkpoint(args.model_path + "_sorted", trainer.params,
                            extra={"sorted": True})
            print("Saved sorted model at ", args.model_path + "_sorted")

    if args.run_sweep:
        if args.experiment_type == "baseline_ia":
            masking_inputs_sweep(trainer, test_loader)
        else:
            missing_modality_sweep(trainer, valid_loader, test_loader,
                                   specific=args.specific)
    if args.async_ckpt:
        from ..checkpoint import wait_for_saves

        wait_for_saves()  # commit the last in-flight epoch checkpoint
    return trainer


def script_main(argv=None) -> None:
    """Console-script shim: main() returns the Trainer for programmatic use,
    but setuptools entry points run ``sys.exit(main())`` — a non-None return
    would turn every successful run into exit status 1."""
    main(argv)


if __name__ == "__main__":
    main()
