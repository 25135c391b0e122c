"""Checkpoint round-trips + cross-framework parity against the actual
reference modules (loaded from /root/reference with import stubs)."""

import importlib.machinery
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import ModelSpec
from multimodal_transformer_robustness_tpu.checkpoint import (
    export_torch_state_dict,
    import_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
)
from multimodal_transformer_robustness_tpu.models import init_supernet

REF = "/root/reference"


def tiny_spec():
    return ModelSpec(
        modality_set=("a", "v"), orig_dimensions=(6, 4), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=2, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=3)


def test_torch_name_roundtrip():
    spec = tiny_spec()
    params, _ = init_supernet(jax.random.PRNGKey(0), spec)
    sd = export_torch_state_dict(spec, params)
    # names follow the reference module tree
    assert "trans_mems0.mems0a.layers.0.self_attn.in_proj_weight" in sd
    assert "trans.crossav.layers.0.fc1.l.weight" in sd
    assert "proj.0.0.lstm1.weight_ih_l0_reverse" in sd
    assert "proj1.l.weight" in sd
    assert sd["trans_mems0.mems0a.layers.0.self_attn.in_proj_weight"].shape == (24, 8)
    back = import_torch_state_dict(spec, sd)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    spec = tiny_spec()
    params, _ = init_supernet(jax.random.PRNGKey(1), spec)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, extra={"epoch": 3})
    params2, extra = load_checkpoint(path)
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_encoder_parity_vs_reference_torch():
    """Gold parity: load our exported weights into the REFERENCE's
    DynamicTransformerEncoder and compare eval-mode forwards."""
    torch = pytest.importorskip("torch")
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
    from modules.dynamic_transformer import DynamicTransformerEncoder

    from multimodal_transformer_robustness_tpu.ops import EncoderMasks, encoder_forward
    from multimodal_transformer_robustness_tpu.ops.encoder import EncoderHParams, init_encoder

    E, H, Dh, L = 8, 2, 4, 2
    hp = EncoderHParams(embed_dim_in=E, num_heads=H, head_dim=Dh, layers=L,
                        attn_mask=True)
    enc = init_encoder(jax.random.PRNGKey(2), hp)

    spec = tiny_spec()
    from multimodal_transformer_robustness_tpu.checkpoint import _encoder_names

    sd = {}
    _encoder_names("enc", enc, spec, sd)

    ref = DynamicTransformerEncoder(embed_dim=E, head_dim=Dh, num_heads=H,
                                    layers=L, attn_mask=True)
    ref_sd = {k[len("enc."):]: torch.from_numpy(np.array(v))
              for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(ref_sd, strict=False)
    # buffers ('version', PE '_float_tensor') are not learned state
    assert not [m for m in missing
                if "version" not in m and "_float_tensor" not in m], missing
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, E)).astype(np.float32)  # [B, T, E]
    with torch.no_grad():
        # reference is seq-major [T, B, E]
        ref_out = ref(torch.from_numpy(x.transpose(1, 0, 2))).numpy()
    ours = encoder_forward(
        enc, jnp.asarray(x), hp=hp,
        masks=EncoderMasks(
            layer_gates=jnp.ones((L,)), head_mask=jnp.ones((H,)),
            head_dim_mask=jnp.ones((Dh,)), ffn_mask=jnp.ones((4 * H * Dh,)),
            channel_mask=None))
    np.testing.assert_allclose(np.asarray(ours), ref_out.transpose(1, 0, 2),
                               atol=5e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_elastic_encoder_parity_vs_reference_torch():
    """Same, under an elastic configuration (fewer layers/heads/dims/FFN)."""
    torch = pytest.importorskip("torch")
    from modules.dynamic_transformer import DynamicTransformerEncoder

    from multimodal_transformer_robustness_tpu.checkpoint import _encoder_names
    from multimodal_transformer_robustness_tpu.ops import EncoderMasks, encoder_forward
    from multimodal_transformer_robustness_tpu.ops.encoder import EncoderHParams, init_encoder

    E, H, Dh, L = 8, 2, 4, 3
    hp = EncoderHParams(embed_dim_in=E, num_heads=H, head_dim=Dh, layers=L,
                        attn_mask=True)
    enc = init_encoder(jax.random.PRNGKey(3), hp)
    sd = {}
    _encoder_names("enc", enc, tiny_spec(), sd)

    ref = DynamicTransformerEncoder(embed_dim=E, head_dim=Dh, num_heads=H,
                                    layers=L, attn_mask=True)
    ref.load_state_dict({k[4:]: torch.from_numpy(np.array(v))
                         for k, v in sd.items()}, strict=False)
    ref.eval()
    ref.set_active(active_layer_num=2, active_dimension=10,
                   active_head_num=1, active_head_dim=3)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, E)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(1, 0, 2))).numpy()

    def prefix(n, total):
        m = np.zeros((total,), np.float32)
        m[:n] = 1
        return jnp.asarray(m)

    ours = encoder_forward(
        enc, jnp.asarray(x), hp=hp,
        masks=EncoderMasks(layer_gates=prefix(2, L), head_mask=prefix(1, H),
                           head_dim_mask=prefix(3, Dh),
                           ffn_mask=prefix(10, 4 * H * Dh), channel_mask=None))
    np.testing.assert_allclose(np.asarray(ours), ref_out.transpose(1, 0, 2),
                               atol=5e-5)
