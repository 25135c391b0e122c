"""Full-model cross-framework parity: our exported supernet weights loaded
into the REFERENCE's whole ``DynamicMULTModel`` (src/dynamic_models2.py:95),
eval-mode forwards compared end-to-end — headers (incl. the frozen-BERT text
path and its mask/type-id swap quirk), mems0/cross/top stacks, slot channel
masks and the masked head MLP all in one oracle.

The frozen BERT weights are synchronized by materializing ONE tiny
random-init HuggingFace checkpoint on disk and loading it on both sides.
"""

import dataclasses
import importlib.machinery
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import (
    ActiveConfig,
    ModelSpec,
    build_masks,
    full_active_config,
    gen_active_cross,
)
from multimodal_transformer_robustness_tpu.checkpoint import export_torch_state_dict
from multimodal_transformer_robustness_tpu.models import init_supernet, supernet_apply

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")


def _spec():
    # orig_dimensions[0] must equal the BERT hidden size (the reference
    # builds RNN_Header(orig_dimensions[i], d) after BertTextEncoder)
    return ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(16, 10, 8),
        dimension=8, num_heads=2, head_dim=4, layers_single_attn=2,
        layers_cross_attn=1, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0, res_dropout=0.0,
        out_dropout=0.0, embed_dropout=0.0, attn_mask=True, output_dim=3)


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.transforms", "torchvision.models",
                 "fannypack", "src.dataset"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            if name == "src.dataset":
                mod.Multimodal_Datasets = None
            sys.modules[name] = mod

    # one tiny HF BERT checkpoint, shared by both stacks
    bert_dir = str(tmp_path_factory.mktemp("tiny_bert"))
    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    transformers.BertModel(hf_cfg).save_pretrained(bert_dir)

    spec = _spec()
    from multimodal_transformer_robustness_tpu.models.bert import load_hf_bert_params

    bert_cfg = load_hf_bert_params(bert_dir)[1]
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg, bert_dir=bert_dir)

    from src import dynamic_models2 as dm2

    # the reference hardcodes its BERT path (dynamic_models2.py:46); point
    # every BertTextEncoder at the shared tiny checkpoint instead
    real_from_pretrained = transformers.BertModel.from_pretrained
    dm2.BertModel = types.SimpleNamespace(
        from_pretrained=lambda _path: real_from_pretrained(bert_dir))
    ref = dm2.DynamicMULTModel(
        origin_dimensions=list(spec.orig_dimensions), dimension=spec.dimension,
        num_heads=spec.num_heads, head_dim=spec.head_dim,
        layers_single_attn=spec.layers_single_attn,
        layers_hybrid_attn=spec.layers_cross_attn,
        layers_self_attn=spec.layers_self_attn,
        attn_dropout=list(spec.attn_dropout), relu_dropout=spec.relu_dropout,
        res_dropout=spec.res_dropout, out_dropout=spec.out_dropout,
        embed_dropout=spec.embed_dropout, attn_mask=spec.attn_mask,
        output_dim=spec.output_dim, modality_set=list(spec.modality_set),
        all_steps=False, stride=None, padding=None, kernel_size=None,
        experiment_type="random_sample")

    sd = export_torch_state_dict(spec, params)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        strict=False)
    real_missing = [m for m in missing
                    if "version" not in m and "_float_tensor" not in m
                    and ".model." not in m]  # BERT synced via the checkpoint
    assert not real_missing, real_missing
    assert not unexpected, unexpected
    ref.eval()

    rng = np.random.default_rng(0)
    B, T, L = 3, 6, 7
    ids = rng.integers(0, 64, (B, L))
    # stacked text layout [ids, type_ids, attn_mask] (collate order,
    # src/dataset.py:51-55); BOTH stacks then read slot 1 as the attention
    # mask — the replicated reference quirk
    text = np.stack([ids, np.ones((B, L), np.int64),
                     np.zeros((B, L), np.int64)])
    audio = rng.standard_normal((B, T, 10)).astype(np.float32)
    vision = rng.standard_normal((B, T, 8)).astype(np.float32)
    return torch, spec, params, frozen, bert_cfg, ref, (text, audio, vision)


def _ref_forward(torch, ref, inputs):
    with torch.no_grad():
        out, _ = ref([torch.from_numpy(inputs[0]),
                      torch.from_numpy(inputs[1]),
                      torch.from_numpy(inputs[2])])
    return out.numpy()


def _ours_forward(spec, params, frozen, bert_cfg, cfg, inputs):
    masks = build_masks(spec, cfg)
    out = supernet_apply(spec, params, masks,
                         [jnp.asarray(x) for x in inputs], frozen=frozen,
                         bert_cfg=bert_cfg)
    return np.asarray(out)


def _set_ref_active(ref, cfg):
    ref.set_active(
        active_self_attn_layer_num=cfg.active_self_attn_layer_num,
        active_single_attn_layer_num=list(cfg.active_single_attn_layer_num),
        active_hybrid_attn_layer_num=cfg.active_hybrid_attn_layer_num,
        active_dimension=cfg.active_dimension,
        active_head_num=cfg.active_head_num,
        active_head_dim=cfg.active_head_dim,
        active_modality=list(cfg.active_modality),
        active_cross=[list(c) for c in cfg.active_cross],
        active_cross_output=[list(c) for c in cfg.active_cross_output])


def test_full_model_parity_full_config(stacks):
    torch, spec, params, frozen, bert_cfg, ref, inputs = stacks
    cfg = full_active_config(spec)
    _set_ref_active(ref, cfg)
    ref_out = _ref_forward(torch, ref, inputs)
    ours = _ours_forward(spec, params, frozen, bert_cfg, cfg, inputs)
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)


def test_full_model_parity_elastic_configs(stacks):
    torch, spec, params, frozen, bert_cfg, ref, inputs = stacks
    r = np.random.default_rng(7)
    checked = 0
    for am in ([0, 1, 2], [0, 1], [1, 2], [0, 2], [1]):
        ac, aco = gen_active_cross(spec, am, rng=r)
        cfg = ActiveConfig(
            active_modality=list(am), active_cross=ac, active_cross_output=aco,
            active_single_attn_layer_num=[int(v) for v in r.integers(0, 3, 3)],
            active_self_attn_layer_num=1, active_hybrid_attn_layer_num=1,
            active_dimension=int(r.integers(4, spec.ffn_dim + 1)),
            active_head_num=int(r.integers(1, spec.num_heads + 1)),
            active_head_dim=int(r.integers(1, spec.head_dim + 1)))
        _set_ref_active(ref, cfg)
        ref_out = _ref_forward(torch, ref, inputs)
        ours = _ours_forward(spec, params, frozen, bert_cfg, cfg, inputs)
        np.testing.assert_allclose(
            ours, ref_out, atol=1e-4,
            err_msg=f"config diverged: {cfg}")
        checked += 1
    assert checked == 5
