"""M=4 coverage (VERDICT r3 #5 / SURVEY §7 stage-1 oracle).

The combination-string algebra is exhaustively checked against a verbatim
port of the REFERENCE generator (src/models2.py:28-74) for M ∈ {1..4} —
content AND order — including seeded (partial modality-set) generation, the
repair path's input.  Then the M=4 supernet (60 cross stacks, 4 top
branches) runs end-to-end: parent ≡ extracted subnet, and a missing-modality
sweep smoke over all 15 subsets.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import (ModelSpec, build_masks,
                                                   full_active_config)
from multimodal_transformer_robustness_tpu.config import ModalityStr


# ---- reference oracle: verbatim logic of src/models2.py:28-74 (test-only
# port, as test_sorting.py does for the sort oracle) ------------------------
def _ref_gen_modality_str(modality_set, input_str):
    out = []
    for ch in modality_set:
        if input_str.find(ch) == -1:
            out.append(input_str + ch)
    return out


def _ref_gen_modality_str_all(self_set, modality_set=None):
    modality_str = []
    if len(self_set) == 1:
        return modality_str
    input_str1 = list(self_set) if modality_set is None else list(modality_set)
    while len(modality_str) == 0 or len(modality_str[-1]) < len(self_set):
        input_str = []
        for s in input_str1:
            s1 = _ref_gen_modality_str(self_set, s)
            modality_str.extend(s1)
            input_str.extend(s1)
        input_str1 = input_str
    return modality_str


SETS = [("t",), ("t", "a"), ("t", "a", "v"), ("t", "a", "v", "b")]


@pytest.mark.parametrize("mset", SETS, ids=[str(len(s)) for s in SETS])
def test_gen_modality_str_all_matches_reference(mset):
    ours = ModalityStr(mset).gen_modality_str_all()
    ref = _ref_gen_modality_str_all(list(mset))
    assert ours == ref  # content AND order (slot indices depend on order)
    if len(mset) == 4:
        assert len(ours) == 60  # 12 pairs + 24 triples + 24 quads


@pytest.mark.parametrize("mset", SETS[1:], ids=[str(len(s)) for s in SETS[1:]])
def test_seeded_generation_matches_reference(mset):
    # every non-empty proper seed subset, plus PARTIAL chain-string seeds —
    # the gen_active_cross repair path feeds these.  A COMPLETE string
    # (len == M, e.g. ["ta"] at M=2) must never be seeded: the generator's
    # ``while len(modality_str) == 0 or ...`` loop never terminates on it —
    # in the reference too (models2.py:67-74, a faithful-port property, so
    # equality on that input is undefined and untestable).
    ms = ModalityStr(mset)
    seeds = [list(c) for r in range(1, len(mset))
             for c in itertools.combinations(mset, r)]
    seeds += [["".join(mset[:k])] for k in range(2, len(mset))]
    for seed in seeds:
        assert ms.gen_modality_str_all(seed) == _ref_gen_modality_str_all(
            list(mset), seed), seed


def test_complete_string_seed_raises_instead_of_hanging():
    # the reference's generator never terminates on this input
    # (models2.py:67-74); ours raises (documented deviation — UB -> error)
    with pytest.raises(ValueError, match="no extensions"):
        ModalityStr(("t", "a")).gen_modality_str_all(["ta"])


def test_gen_modality_str_single_extension_matches_reference():
    mset = ("t", "a", "v", "b")
    ms = ModalityStr(mset)
    for s in ["t", "ta", "tav", "avb", "tavb", ""]:
        assert ms.gen_modality_str(s) == _ref_gen_modality_str(mset, s)


# ---- M=4 model execution ---------------------------------------------------
def _m4_spec():
    return ModelSpec(
        modality_set=("t", "a", "v", "b"), orig_dimensions=(12, 10, 8, 6),
        dimension=8, num_heads=2, head_dim=4, layers_single_attn=1,
        layers_cross_attn=1, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1, header_overrides={"t": "rnn"})


@pytest.fixture(scope="module")
def m4_model():
    spec = _m4_spec()
    from multimodal_transformer_robustness_tpu.models import init_supernet

    # eager init: jit-compiling the 60-cross-stack init program takes many
    # minutes on this 1-core CPU; eager is ~16 s (jitted init exists for the
    # remote-TPU round-trip problem, irrelevant here)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec, use_jit=False)
    return spec, params, frozen


def test_m4_spec_dims(m4_model):
    spec = m4_model[0]
    assert len(spec.cross_strings) == 60
    assert spec.combined_dim == 64 * spec.dimension  # AmnSum(4) = 64
    assert all(len(s) == 16 for s in spec.slot_lists)  # 64 / 4 streams each


def test_m4_parent_equals_subnet(m4_model):
    from multimodal_transformer_robustness_tpu.models import (extract_subnet,
                                                              subnet_apply,
                                                              supernet_apply)
    from multimodal_transformer_robustness_tpu.train.sampling import (
        sample_train_config)

    spec, params, frozen = m4_model
    rng = np.random.default_rng(0)
    B, T = 2, 3
    inputs = [jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
              for d in spec.orig_dimensions]
    full = full_active_config(spec)
    out_full = supernet_apply(spec, params, build_masks(spec, full), inputs)
    assert np.isfinite(out_full).all()
    for _ in range(3):
        cfg = sample_train_config(spec, "random_sample", None, rng)
        out_par = supernet_apply(spec, params, build_masks(spec, cfg), inputs)
        sub = extract_subnet(spec, params, cfg)
        out_sub = subnet_apply(sub, [inputs[i] for i in cfg.active_modality],
                               frozen=frozen)
        np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_sub),
                                   atol=2e-5)


def test_m4_sweep_smoke(m4_model):
    from multimodal_transformer_robustness_tpu.data.loaders import (
        ArrayDataset, BatchIterator)
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)
    from multimodal_transformer_robustness_tpu.train.sweep import (
        missing_modality_sweep)

    spec, params, frozen = m4_model
    r = np.random.default_rng(1)
    N, T, B = 8, 3, 4

    def _ds(seed):
        rr = np.random.default_rng(seed)
        return ArrayDataset(
            [rr.standard_normal((N, T, d)).astype(np.float32)
             for d in spec.orig_dimensions],
            rr.standard_normal((N, 1)).astype(np.float32),
            dims=spec.orig_dimensions, seq_len=T)

    hp = TrainHParams(batch_size=B, lr=1e-3, optim="Adam", num_epochs=1,
                      experiment_type="random_sample", criterion="L1Loss",
                      dataset="mosei_senti", seed=0)
    trainer = Trainer(spec, params, frozen, hp)
    # max_cfg_chunk=1: the batched-eval program is ONE M=4 supernet (vs 8
    # stacked) — the chunked path is exercised while the 1-core-CPU compile
    # stays minutes, not hours
    results = missing_modality_sweep(trainer, BatchIterator(_ds(2), B),
                                     BatchIterator(_ds(3), B),
                                     max_cfg_chunk=1, quiet=True)
    assert len(results) == 15  # all non-empty subsets of 4 modalities
    assert all(np.isfinite(v["valid_acc"]) for v in results.values())
