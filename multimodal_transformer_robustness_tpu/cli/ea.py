"""Evolutionary-search driver — the reference's ``EA.py`` argparse surface
(EA.py:178-211) on the batched-fitness EvolutionSearch."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MOSEI Sentiment Analysis")
    p.add_argument("-f", default="", type=str)
    p.add_argument("--dataset", type=str, default="mosei_senti")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=584 * 2 * 2, metavar="N")
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--no_cuda", action="store_true")
    p.add_argument("--prng", default="rbg",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"])
    p.add_argument("--mutate_prob", type=float, default=0.5)
    p.add_argument("--parent_ratio", type=float, default=0.8)
    p.add_argument("--mutation_ratio", type=float, default=0.8)
    p.add_argument("--subnet_prob", type=float, default=0.5)
    p.add_argument("--population_size", type=int, default=100)
    p.add_argument("--max_time_budget", type=int, default=200)
    p.add_argument("--active_modality", type=int, nargs="*", default=[0, 1, 2])
    p.add_argument("--modality_list", type=str, nargs="*", default=["t", "a", "v"])
    # TPU-build additions
    p.add_argument("--bert_dir", type=str, default=None)
    p.add_argument("--dimension", type=int, default=200)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=25)
    p.add_argument("--layers_single_attn", type=int, default=3)
    p.add_argument("--layers_cross_attn", type=int, default=4)
    p.add_argument("--layers_self_attn", type=int, default=2)
    p.add_argument("--max_shards", type=int, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh, e.g. 'cfg=-1' or 'dp=8': EA fitness "
                        "shards each generation's config axis across every "
                        "mesh device (axis names don't matter for fitness — "
                        "the whole device set serves the config axis)")
    p.add_argument("--cache_text", action="store_true",
                   help="precompute frozen-BERT text features once per "
                        "dataset (see cli/main.py --cache_text); EA fitness "
                        "re-evaluates the SAME validation set every "
                        "generation, so the extractor amortizes to zero")
    return p


def main(argv=None):
    import jax

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from .. import ModelSpec
    from ..checkpoint import (import_torch_state_dict, load_checkpoint,
                              load_reference_pickle)
    from ..data import BatchIterator, get_data
    from ..models import init_supernet
    from ..models.bert import BertConfig
    from ..train import TrainHParams, Trainer
    from ..train.ea import EAHParams, EvolutionSearch

    args = build_parser().parse_args(argv)
    from ..utils import set_default_prng
    set_default_prng(args.prng)
    np.random.seed(args.seed)

    print("Start loading the data....")
    kw = {"bert_dir": args.bert_dir, "max_shards": args.max_shards} \
        if args.dataset == "mosei_senti" else {}
    valid_data = get_data(args.dataset, args.data_path, "valid", **kw)
    test_data = get_data(args.dataset, args.data_path, "test", **kw)
    print("Finish loading the data....")

    spec = ModelSpec(
        modality_set=tuple(args.modality_list),
        orig_dimensions=tuple(valid_data.get_dim()),
        dimension=args.dimension, num_heads=args.num_heads,
        head_dim=args.head_dim, layers_single_attn=args.layers_single_attn,
        layers_cross_attn=args.layers_cross_attn,
        layers_self_attn=args.layers_self_attn,
        attn_dropout=tuple([0.1] + [0.0] * len(args.modality_list)),
        relu_dropout=0.1, res_dropout=0.3, out_dropout=0.1, embed_dropout=0.3,
        attn_mask=True, output_dim=1)

    bert_cfg = None
    if any(spec.header_kind(c) == "bert_rnn" for c in spec.modality_set) \
            and not args.bert_dir:
        bert_cfg = BertConfig(num_layers=4)
    params, frozen = init_supernet(jax.random.PRNGKey(args.seed), spec,
                                   bert_cfg=bert_cfg, bert_dir=args.bert_dir)
    if args.model_path:
        if args.model_path.endswith(".pt"):
            params = import_torch_state_dict(
                spec, load_reference_pickle(args.model_path))
        else:
            params, _ = load_checkpoint(args.model_path)

    if args.cache_text and "bert" in frozen:
        from ..train.features import CachedTextDataset

        print("Precomputing frozen-BERT text features (--cache_text)....")
        valid_data = CachedTextDataset(valid_data, frozen, bert_cfg)
        test_data = CachedTextDataset(test_data, frozen, bert_cfg)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh, parse_mesh_axes

        mesh = make_mesh(parse_mesh_axes(args.mesh))
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)),
              f"over {mesh.devices.size} devices")
    trainer = Trainer(spec, params, frozen,
                      TrainHParams(dataset=args.dataset, criterion="L1Loss"),
                      bert_cfg=bert_cfg, mesh=mesh)
    ea = EvolutionSearch(
        trainer,
        EAHParams(mutate_prob=args.mutate_prob, parent_ratio=args.parent_ratio,
                  mutation_ratio=args.mutation_ratio,
                  subnet_prob=args.subnet_prob,
                  population_size=args.population_size,
                  max_time_budget=args.max_time_budget, seed=args.seed),
        active_modality=args.active_modality,
        valid_loader=BatchIterator(valid_data, args.batch_size),
        test_loader=BatchIterator(test_data, args.batch_size))
    best_valids, best_info = ea.search()
    print("best:", best_valids[-1], best_info[1] if best_info else None)
    return best_valids, best_info


def script_main(argv=None) -> None:
    """Console-script shim (see cli.main.script_main): keep exit status 0."""
    main(argv)


if __name__ == "__main__":
    main()
