"""Tests for the modality-combination algebra.

Oracles: hand-derived string sets from the reference semantics
(src/models2.py:21-74) plus the supernet shape math from SURVEY.md §2.2.
"""

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import (
    ActiveConfig,
    Amn,
    AmnSum,
    ModalityStr,
    ModelSpec,
    build_masks,
    full_active_config,
    gen_active_cross,
)


def make_spec(mods="tav", d=8, H=2, Dh=4, Ls=2, Lc=2, Lt=1):
    return ModelSpec(
        modality_set=tuple(mods),
        orig_dimensions=tuple([5] * len(mods)),
        dimension=d,
        num_heads=H,
        head_dim=Dh,
        layers_single_attn=Ls,
        layers_cross_attn=Lc,
        layers_self_attn=Lt,
        attn_dropout=tuple([0.0] * (len(mods) + 1)),
        relu_dropout=0.0,
        res_dropout=0.0,
        out_dropout=0.0,
        embed_dropout=0.0,
        attn_mask=True,
        output_dim=1,
    )


def test_amn_sum():
    # AmnSum(3) = 3 + 6 + 6 = 15 (combined_dim = 15d, SURVEY.md §2.2)
    assert Amn(3, 1) == 3 and Amn(3, 2) == 6 and Amn(3, 3) == 6
    assert AmnSum(1) == 1
    assert AmnSum(2) == 4
    assert AmnSum(3) == 15
    assert AmnSum(4) == 64


def test_gen_modality_str():
    m = ModalityStr(["t", "a", "v"])
    assert m.gen_modality_str("t") == ["ta", "tv"]
    assert m.gen_modality_str("ta") == ["tav"]
    assert m.gen_modality_str("tav") == []


def test_gen_modality_str_all_order_and_content():
    m = ModalityStr(["t", "a", "v"])
    allstr = m.gen_modality_str_all()
    # 6 pairs then 6 triples, prefixes always precede extensions
    assert allstr == [
        "ta", "tv", "at", "av", "vt", "va",
        "tav", "tva", "atv", "avt", "vta", "vat",
    ]
    for s in allstr:
        if len(s) > 2:
            assert s[:-1] in allstr
    # seeded from a single modality -> that branch's chains
    assert m.gen_modality_str_all(["t"]) == ["ta", "tv", "tav", "tva"]
    # single-modality sets have no cross strings
    assert ModalityStr(["i"]).gen_modality_str_all() == []


def test_two_modality_all():
    m = ModalityStr(["i", "A"])
    assert m.gen_modality_str_all() == ["iA", "Ai"]


def test_slot_lists_and_dims():
    spec = make_spec("tav")
    assert spec.combined_dim == 15 * spec.dimension
    assert spec.n_slots == 5
    assert spec.slot_lists[0] == ("t", "ta", "tv", "tav", "tva")
    assert spec.slot_lists[1] == ("a", "at", "av", "atv", "avt")
    assert spec.top_dim == 5 * spec.dimension
    assert len(spec.cross_strings) == 12


def test_rand_gen_is_level_consistent(rng):
    m = ModalityStr(["t", "a", "v"])
    for _ in range(50):
        out = m.rand_gen_modality_str(["t"], p=0.7, rng=rng)
        # every extension's prefix must have been generated before it
        for s in out:
            if len(s) > 2:
                assert s[:-1] in out
            assert s[0] == "t"
        # order is a subsequence of the full enumeration
        full = m.gen_modality_str_all(["t"])
        idx = [full.index(s) for s in out]
        assert idx == sorted(idx)


def test_gen_active_cross_repair_and_single(rng):
    spec = make_spec("tav")
    # single modality short-circuit (dynamic_models2.py:443-446)
    ac, aco = gen_active_cross(spec, [1], rng=rng)
    assert ac == [[], [], []]
    assert aco == [[], ["a"], []]
    # every active modality's info reaches some output (repair pass)
    for _ in range(100):
        active = [0, 2]
        ac, aco = gen_active_cross(spec, active, rng=rng)
        for i in active:
            covered = any(
                spec.modality_set[i] in s for j in active for s in aco[j]
            )
            assert covered
        cfg = ActiveConfig(
            active_modality=active,
            active_cross=ac,
            active_cross_output=aco,
            active_single_attn_layer_num=[1] * 3,
            active_self_attn_layer_num=1,
            active_hybrid_attn_layer_num=2,
            active_dimension=spec.dimension,
            active_head_num=2,
            active_head_dim=4,
        )
        cfg.validate(spec)  # sampler only produces valid configs


def test_full_config_masks():
    spec = make_spec("tav")
    cfg = full_active_config(spec)
    masks = build_masks(spec, cfg)
    assert masks.branch_gate.tolist() == [1.0, 1.0, 1.0]
    # full topology: self slot + the 2 pair slots per branch, triples off
    assert masks.slot_mask.tolist() == [[1, 1, 1, 0, 0]] * 3
    # all 6 pair cross modules enabled, triples disabled
    assert masks.cross_enable.tolist() == [1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    assert masks.head_mask.sum() == spec.num_heads
    # reference quirk: active FFN width defaults to d, not 4*H*Dh
    assert int(masks.ffn_mask.sum()) == spec.dimension
    ch = masks.output_channel_mask(spec.dimension)
    assert ch.shape == (spec.combined_dim,)
    assert int(ch.sum()) == 3 * 3 * spec.dimension


def test_invalid_config_rejected():
    spec = make_spec("tav")
    cfg = full_active_config(spec)
    cfg.active_cross = [["ta"], [], []]
    cfg.active_cross_output = [["tav"], ["a"], ["v"]]  # 'tav' not produced
    with pytest.raises(AssertionError):
        build_masks(spec, cfg)


def test_two_modality_candidate_enumeration_exact():
    """The 13 hand-enumerated sweep candidates (reference train.py:283-344)."""
    from multimodal_transformer_robustness_tpu.train.sweep import (
        enumerate_subset_candidates,
    )

    spec = make_spec("tav")
    active_cross, cands = enumerate_subset_candidates(
        spec, "random_sample", (0, 1))
    assert active_cross == [["ta"], ["at"], []]
    expect = [
        [["t"], ["a"], []],
        [["t", "ta"], [], []],
        [[], ["a", "at"], []],
        [["ta"], ["a"], []],
        [["t"], ["at"], []],
        [["ta"], [], []],
        [[], ["at"], []],
        [["ta"], ["at"], []],
        [["t", "ta"], ["at"], []],
        [["ta"], ["a", "at"], []],
        [["t", "ta"], ["a", "at"], []],
        [[], ["at"], []],       # 12 (reference duplicate)
        [["ta"], [], []],       # 13 (reference duplicate)
    ]
    assert cands == expect
    # subset (0, 2): chars t, v
    ac2, cands2 = enumerate_subset_candidates(spec, "random_sample", (0, 2))
    assert ac2 == [["tv"], [], ["vt"]]
    assert len(cands2) == 13
    # 3-modality subset: single canonical candidate
    ac3, cands3 = enumerate_subset_candidates(spec, "random_sample", (0, 1, 2))
    assert len(cands3) == 1
    assert cands3[0] == [["ta", "tv"], ["at", "av"], ["vt", "va"]]
