"""Evolutionary search over fusion-module combinations.

Port of reference EA.py:21-169 (``EvolutionSearch``): genomes are
``[active_cross, active_cross_output]``; seed a population with
``gen_active_cross``, keep the top ``parent_ratio`` by validation accuracy,
refill with per-branch mutations and uniform crossover, for
``max_time_budget`` generations.  The latency constraint is the same stub as
the reference (efficiency = 0, EA.py:57-58).

TPU re-design: fitness for a WHOLE generation evaluates as one stacked-config
vmapped pass per data batch (optionally sharded over devices on the cfg
axis) instead of the reference's one full validation epoch per genome
(EA.py:93-137) — generations cost ~one validation pass.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ActiveConfig, ModelSpec, full_active_config, gen_active_cross
from ..masks import build_masks, stack_masks
from ..metrics import eval_mosei_senti


@dataclasses.dataclass
class EAHParams:
    """Reference EA.py argparse surface (EA.py:196-211)."""

    mutate_prob: float = 0.5
    parent_ratio: float = 0.8
    mutation_ratio: float = 0.8
    subnet_prob: float = 0.5
    population_size: int = 100
    max_time_budget: int = 200
    seed: int = 1111


Genome = List  # [active_cross, active_cross_output]


class EvolutionSearch:
    def __init__(self, trainer, hp: EAHParams, active_modality: Sequence[int],
                 valid_loader, test_loader, base_cfg: Optional[ActiveConfig] = None,
                 max_cfg_chunk: int = 64, device_batches=None):
        """``device_batches``: pre-uploaded fitness batches in
        upload_eval_batches format — callers with device-resident eval data
        (benchmarks, repeated searches) pass them instead of a loader."""
        self.trainer = trainer
        self.spec: ModelSpec = trainer.spec
        self.hp = hp
        self.active_modality = list(active_modality)
        self.valid_loader = valid_loader
        self.test_loader = test_loader
        self.base_cfg = base_cfg or full_active_config(self.spec)
        self.rng = np.random.default_rng(hp.seed)
        self.max_cfg_chunk = max_cfg_chunk
        self._dev_batches = device_batches

    # ---- genome ops (EA.py:44-73) -----------------------------------------
    def random_genome(self) -> Genome:
        ac, aco = gen_active_cross(self.spec, self.active_modality, rng=self.rng)
        return [ac, aco]

    def mutate(self, sample: Genome) -> Genome:
        new = copy.deepcopy(sample)
        probs = self.rng.random(len(sample[1]))
        for i in range(len(probs)):
            if probs[i] < self.hp.mutate_prob:
                temp = gen_active_cross(self.spec, self.active_modality, rng=self.rng)
                new[0][i] = copy.deepcopy(temp[0][i])
                new[1][i] = copy.deepcopy(temp[1][i])
        return new

    def crossover(self, s1: Genome, s2: Genome) -> Genome:
        new = copy.deepcopy(s1)
        for i in range(len(new[0])):
            if self.rng.integers(0, 2) == 0:
                new[0][i] = copy.deepcopy(s2[0][i])
                new[1][i] = copy.deepcopy(s2[1][i])
        return new

    # ---- fitness -----------------------------------------------------------
    def _cfg(self, genome: Genome) -> ActiveConfig:
        """set_active_modalities semantics: topology swaps, widths/depths
        keep the base config (reference dynamic_models2.py:420-424)."""
        c = copy.deepcopy(self.base_cfg)
        c.active_modality = list(self.active_modality)
        c.active_cross = copy.deepcopy(genome[0])
        c.active_cross_output = copy.deepcopy(genome[1])
        return c

    def _device_batches(self):
        """Upload the validation set once; generations re-read it.  Under a
        trainer mesh the batches replicate across it (fitness parallelism is
        over the CONFIG axis — eval_step_sweep shards the generation)."""
        if getattr(self, "_dev_batches", None) is None:
            from .sweep import upload_eval_batches

            self._dev_batches = upload_eval_batches(self.valid_loader,
                                                    self.trainer.mesh)
        return self._dev_batches

    def eval_population(self, genomes: List[Genome]) -> np.ndarray:
        """Batched fitness: the whole generation stacks into one device
        pytree and evaluates in ONE dispatch per data batch (device-side
        lax.map chunking; config-axis sharded across devices when the
        trainer carries a mesh)."""
        tr = self.trainer
        tr.cfg_chunk = self.max_cfg_chunk  # static jit arg of
        #                                    eval_step_sweep's lax.map
        masks = [build_masks(self.spec, self._cfg(g)) for g in genomes]
        n_real = len(masks)
        chunk = tr.cfg_chunk
        if n_real % chunk and n_real > chunk:
            masks = masks + [masks[-1]] * (chunk - n_real % chunk)
        M = self.spec.modality_num
        flags = jnp.ones((M,), jnp.float32)
        stacked = tr.prep_sweep_masks(stack_masks(masks))
        # on-device accumulation, ONE readback per population eval — a
        # per-batch np.asarray is a blocking ~35 ms tunnel round-trip (the
        # evaluate() fix, train/loop.py, applied to EA fitness)
        per_batch: List[jnp.ndarray] = []
        keeps: List[np.ndarray] = []
        truths = []
        for inputs, keep, labels in self._device_batches():
            preds = tr.eval_step_sweep(tr.params, stacked, inputs, flags)
            per_batch.append(preds)
            keeps.append(keep)
            truths.append(labels)
        truth = np.concatenate(truths)
        all_preds = np.asarray(jnp.concatenate(per_batch, axis=1)
                               )[:, np.concatenate(keeps)]
        accs = np.zeros((n_real,))
        for k in range(n_real):
            accs[k] = tr._metric(all_preds[k], truth)
        return accs

    def get_acc(self, genome: Genome) -> float:
        return float(self.eval_population([genome])[0])

    # ---- search loop (EA.py:84-137) ---------------------------------------
    def search(self, verbose: bool = True) -> Tuple[List[float], list]:
        hp = self.hp
        mutation_numbers = int(round(hp.mutation_ratio * hp.population_size))
        parents_size = int(round(hp.parent_ratio * hp.population_size))

        best_valids = [-10.0]
        best_info = None
        genomes = [self.random_genome() for _ in range(hp.population_size)]
        accs = self.eval_population(genomes)
        population = [[float(a), g] for a, g in zip(accs, genomes)]
        if verbose:
            for a, g in population:
                print(a, g[1])

        for it in range(hp.max_time_budget):
            parents = sorted(population, key=lambda x: x[0])[::-1][:parents_size]
            acc = parents[0][0]
            if verbose:
                print("Iter: {} Acc: {}".format(it, acc), parents[0])
            if acc > best_valids[-1]:
                best_valids.append(acc)
                best_info = copy.deepcopy(parents[0])
            else:
                best_valids.append(best_valids[-1])
            if it >= hp.max_time_budget - 1:
                self.test_genome(best_info[1], verbose=verbose)
                return best_valids, best_info

            population = copy.deepcopy(parents)
            children: List[Genome] = []
            for _ in range(mutation_numbers):
                children.append(self.mutate(
                    population[self.rng.integers(parents_size)][1]))
            for _ in range(hp.population_size - mutation_numbers):
                p1 = population[self.rng.integers(parents_size)][1]
                p2 = population[self.rng.integers(parents_size)][1]
                children.append(self.crossover(p1, p2))
            child_accs = self.eval_population(children)
            population.extend([[float(a), g] for a, g in zip(child_accs, children)])
        return best_valids, best_info

    def test_genome(self, genome: Genome, verbose: bool = True) -> float:
        """EA.py:140-147 test_modality + final test-set report."""
        cfg = self._cfg(genome)
        masks = build_masks(self.spec, cfg)
        M = self.spec.modality_num
        acc, preds, truths = self.trainer.evaluate(
            self.test_loader, masks, list(range(M)))
        if self.trainer.hp.dataset == "mosei_senti":
            eval_mosei_senti(preds, truths, exclude_zero=True, quiet=not verbose)
        return float(acc)
