"""Evolutionary fusion-config search with batched fitness."""

import jax
import numpy as np

from multimodal_transformer_robustness_tpu import ModelSpec
from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
from multimodal_transformer_robustness_tpu.models import init_supernet
from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
from multimodal_transformer_robustness_tpu.train.ea import EAHParams, EvolutionSearch

from _synth import synth_mosei_like


def test_ea_search_runs():
    spec = ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(12, 10, 8), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1, header_overrides={"t": "rnn"})
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    hp = TrainHParams(dataset="mosei_senti", criterion="L1Loss")
    trainer = Trainer(spec, params, frozen, hp)
    valid = BatchIterator(synth_mosei_like(32, seed=1), 16)
    test = BatchIterator(synth_mosei_like(32, seed=2), 16)

    ea = EvolutionSearch(trainer, EAHParams(population_size=6, max_time_budget=2,
                                            parent_ratio=0.5, mutation_ratio=0.5),
                         active_modality=[0, 1, 2], valid_loader=valid,
                         test_loader=test)
    best_valids, best_info = ea.search(verbose=False)
    assert best_info is not None
    assert len(best_valids) == 3  # initial sentinel + 2 generations
    assert np.isfinite(best_info[0])
    # monotone best-so-far
    assert best_valids[-1] >= best_valids[-2]
    # genome evaluates on test without error
    acc = ea.test_genome(best_info[1], verbose=False)
    assert np.isfinite(acc)


def test_ea_mutation_valid_configs():
    spec = ModelSpec(
        modality_set=("i", "A"), orig_dimensions=(8, 8), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=2, header_overrides={"i": "rnn", "A": "rnn"})
    params, frozen = init_supernet(jax.random.PRNGKey(1), spec)
    trainer = Trainer(spec, params, frozen,
                      TrainHParams(dataset="avmnist", criterion="CrossEntropyLoss"))
    ea = EvolutionSearch(trainer, EAHParams(), [0, 1], None, None)
    g = ea.random_genome()
    for _ in range(20):
        g2 = ea.mutate(g)
        g3 = ea.crossover(g, g2)
        for genome in (g2, g3):
            cfg = ea._cfg(genome)
            cfg.validate(spec)  # every offspring is a valid configuration
