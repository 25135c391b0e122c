"""Dense subnet extraction: gather the active weights of the supernet into a
small static model — the reference's ``get_active_subnet`` -> ``MULTModel``
path (src/dynamic_models2.py:293-389, src/models2.py:84-175).

Uses: deployment export (run exactly one configuration with zero masking
overhead) and the parent/subnet equivalence oracle of SURVEY.md §4 — in eval
mode, ``subnet_apply(extract_subnet(spec, params, cfg), inputs)`` must equal
``supernet_apply(spec, params, build_masks(spec, cfg), inputs)`` restricted
to the same configuration.

Documented deviation from the reference: its subnet export copies projection
headers assuming a dead Conv1d layout (``self.proj[i][1].weight`` —
dynamic_models2.py:304-310), which crashes with the RNN/BERT/CNN headers the
model actually builds.  We export the real header parameters unsliced
(headers are not elastic).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ActiveConfig, ModelSpec
from ..ops.attention import future_mask, multihead_attention
from ..ops.encoder import EncoderHParams, EncoderMasks, encoder_forward
from ..ops.linear import masked_linear
from .headers import header_apply
from .mult import SupernetParams
from . import bert as bert_mod


@dataclasses.dataclass
class Subnet:
    """A dense extracted configuration."""

    spec: ModelSpec
    cfg: ActiveConfig
    proj: Tuple[dict, ...]              # headers of ACTIVE modalities
    mems0: Dict[str, dict]              # modality char -> sliced encoder
    cross: Dict[str, dict]              # cross string -> sliced encoder
    mems: Dict[str, dict]               # modality char -> sliced encoder (channel-compacted)
    proj1: dict
    proj2: dict
    out_layer: dict
    active_channels: np.ndarray         # global channel ids into combined_dim
    branch_channel_idx: Dict[int, np.ndarray]  # branch -> channel ids into top_dim


def _take_stack(tree: dict, i: int) -> dict:
    return jax.tree.map(lambda a: a[i], tree)


def _slice_encoder_params(
    enc: dict, L_act: int, h_act: int, dh_act: int, ffn_act: int,
    ch_idx: Optional[np.ndarray] = None,
) -> dict:
    """Prefix-slab + channel-gather slicing of one encoder's params
    (reference get_active_subnet chain: dynamic_transformer.py:91-102,215-234,
    dynamic_multihead_attention.py:122-163, dynamic_layers.py:28-54,68-75)."""
    lp = jax.tree.map(lambda a: a[:L_act], enc["layers"])
    out = {
        "layers": {
            "attn": {
                "in_proj_w": lp["attn"]["in_proj_w"][:, :, :h_act, :dh_act, :],
                "in_proj_b": lp["attn"]["in_proj_b"][:, :, :h_act, :dh_act],
                "out_w": lp["attn"]["out_w"][:, :, :h_act, :dh_act],
                "out_b": lp["attn"]["out_b"],
            },
            "fc1": {"w": lp["fc1"]["w"][:, :ffn_act, :], "b": lp["fc1"]["b"][:, :ffn_act]},
            "fc2": {"w": lp["fc2"]["w"][:, :, :ffn_act], "b": lp["fc2"]["b"]},
            "ln0": lp["ln0"],
            "ln1": lp["ln1"],
        },
        "ln": enc["ln"],
    }
    if ch_idx is not None:
        idx = jnp.asarray(ch_idx)
        l = out["layers"]
        l["attn"]["in_proj_w"] = l["attn"]["in_proj_w"][..., idx]
        l["attn"]["out_w"] = l["attn"]["out_w"][:, idx]
        l["attn"]["out_b"] = l["attn"]["out_b"][:, idx]
        l["fc1"]["w"] = l["fc1"]["w"][..., idx]
        l["fc2"]["w"] = l["fc2"]["w"][:, idx, :]
        l["fc2"]["b"] = l["fc2"]["b"][:, idx]
        l["ln0"] = {"g": l["ln0"]["g"][:, idx], "b": l["ln0"]["b"][:, idx]}
        l["ln1"] = {"g": l["ln1"]["g"][:, idx], "b": l["ln1"]["b"][:, idx]}
        out["ln"] = {"g": out["ln"]["g"][idx], "b": out["ln"]["b"][idx]}
    return out


def _branch_channels(spec: ModelSpec, cfg: ActiveConfig, i: int) -> np.ndarray:
    """Active channel ids within a branch's top width, slot-sorted
    (reference active_mask construction, dynamic_models2.py:243-251)."""
    index = {s: k for k, s in enumerate(spec.slot_lists[i])}
    slots = sorted(index[s] for s in cfg.active_cross_output[i])
    d = spec.dimension
    return np.concatenate([np.arange(k * d, (k + 1) * d) for k in slots]) if slots else np.zeros((0,), np.int64)


def extract_subnet(spec: ModelSpec, params: SupernetParams, cfg: ActiveConfig) -> Subnet:
    cfg.validate(spec)
    L = {
        "h": cfg.active_head_num, "dh": cfg.active_head_dim,
        "ffn": cfg.active_dimension,
    }
    mods = [spec.modality_set[i] for i in cfg.active_modality]
    mems0 = {}
    for i in cfg.active_modality:
        mems0[spec.modality_set[i]] = _slice_encoder_params(
            _take_stack(params.mems0, i), cfg.active_single_attn_layer_num[i],
            L["h"], L["dh"], L["ffn"])
    enabled: List[str] = []
    for i in cfg.active_modality:
        if cfg.active_cross_output[i]:
            for s in cfg.active_cross[i]:
                if s not in enabled:
                    enabled.append(s)
    cross = {}
    for s in enabled:
        j = spec.cross_strings.index(s)
        cross[s] = _slice_encoder_params(
            _take_stack(params.cross, j), cfg.active_hybrid_attn_layer_num,
            L["h"], L["dh"], L["ffn"])
    mems = {}
    branch_idx = {}
    active_global: List[np.ndarray] = []
    n_slots_d = spec.n_slots * spec.dimension
    for i in cfg.active_modality:
        if not cfg.active_cross_output[i]:
            continue
        ch = _branch_channels(spec, cfg, i)
        branch_idx[i] = ch
        active_global.append(ch + i * n_slots_d)
        mems[spec.modality_set[i]] = _slice_encoder_params(
            _take_stack(params.mems, i), cfg.active_self_attn_layer_num,
            L["h"], L["dh"], L["ffn"], ch_idx=ch)
    active_channels = (np.concatenate(active_global)
                       if active_global else np.zeros((0,), np.int64))
    gidx = jnp.asarray(active_channels)
    proj1 = {"w": params.proj1["w"][:, gidx], "b": params.proj1["b"]}
    proj2 = {"w": params.proj2["w"][gidx], "b": params.proj2["b"][gidx]}
    out_layer = {"w": params.out_layer["w"][:, gidx], "b": params.out_layer["b"]}
    return Subnet(
        spec=spec, cfg=cfg,
        proj=tuple(params.proj[i] for i in cfg.active_modality),
        mems0=mems0, cross=cross, mems=mems,
        proj1=proj1, proj2=proj2, out_layer=out_layer,
        active_channels=active_channels, branch_channel_idx=branch_idx)


def _dense_encoder_forward(
    enc: dict, x: jnp.ndarray, x_kv: Optional[jnp.ndarray], spec: ModelSpec,
    cfg: ActiveConfig, full_embed_dim: int,
) -> jnp.ndarray:
    """Run a sliced encoder densely.  ``full_embed_dim`` preserves the
    parent's ``embed_scale = sqrt(full width)`` (dynamic_transformer.py:27,
    fixed at construction even under channel masks)."""
    L_act = enc["layers"]["ln0"]["g"].shape[0]
    hp = EncoderHParams(
        embed_dim_in=full_embed_dim, num_heads=cfg.active_head_num,
        head_dim=cfg.active_head_dim, layers=L_act, attn_mask=spec.attn_mask)
    ffn_act = enc["layers"]["fc1"]["b"].shape[1] if L_act else cfg.active_dimension
    masks = EncoderMasks(
        layer_gates=jnp.ones((L_act,), jnp.float32),
        head_mask=jnp.ones((cfg.active_head_num,), jnp.float32),
        head_dim_mask=jnp.ones((cfg.active_head_dim,), jnp.float32),
        ffn_mask=jnp.ones((ffn_act,), jnp.float32),
        channel_mask=None)
    c = x.shape[-1]
    if c == full_embed_dim:
        return encoder_forward(enc, x, x_kv, hp=hp, masks=masks)
    # channel-compacted stack: widths differ from the scale width; inline the
    # same computation with compact PE (see tests/test_ops.py oracle)
    from ..ops.layernorm import masked_layer_norm
    from ..ops.positional import make_positions, sinusoidal_pe

    pos = make_positions(x[:, :, 0])
    pe = sinusoidal_pe(pos, c, None)
    h = math.sqrt(full_embed_dim) * x + pe
    bias = future_mask(x.shape[1], x.shape[1]) if spec.attn_mask else None
    for l in range(L_act):
        lp = jax.tree.map(lambda a: a[l], enc["layers"])
        res = h
        y = masked_layer_norm(h, lp["ln0"]["g"], lp["ln0"]["b"])
        y = multihead_attention(lp["attn"], y, y, y, head_mask=masks.head_mask,
                                head_dim_mask=masks.head_dim_mask, attn_bias=bias)
        h = res + y
        res = h
        y = masked_layer_norm(h, lp["ln1"]["g"], lp["ln1"]["b"])
        y = masked_linear(y, lp["fc1"]["w"], lp["fc1"]["b"], mask_out=masks.ffn_mask)
        y = jax.nn.relu(y)
        y = masked_linear(y, lp["fc2"]["w"], lp["fc2"]["b"])
        h = res + y
    return masked_layer_norm(h, enc["ln"]["g"], enc["ln"]["b"])


def subnet_apply(
    subnet: Subnet,
    inputs: Sequence[jnp.ndarray],
    *,
    frozen: Optional[dict] = None,
    bert_cfg: Optional[bert_mod.BertConfig] = None,
) -> jnp.ndarray:
    """Eval-mode dense forward of an extracted configuration.  ``inputs``
    are the ACTIVE modalities' arrays, in active-modality order (matching the
    reference subnet's forward contract, src/models2.py:140-174)."""
    spec, cfg = subnet.spec, subnet.cfg
    d = spec.dimension

    streams: Dict[str, jnp.ndarray] = {}
    for n, i in enumerate(cfg.active_modality):
        ch = spec.modality_set[i]
        kind = spec.header_kind(ch)
        px = header_apply(kind, subnet.proj[n], inputs[n], frozen, bert_cfg)
        streams[ch] = _dense_encoder_forward(
            subnet.mems0[ch], px, None, spec, cfg, d)

    for i in cfg.active_modality:
        if not cfg.active_cross_output[i]:
            continue
        for s in cfg.active_cross[i]:
            streams[s] = _dense_encoder_forward(
                subnet.cross[s], streams[s[-1]], streams[s[:-1]], spec, cfg, d)

    outs = []
    for i in cfg.active_modality:
        if not cfg.active_cross_output[i]:
            continue
        ch_name = spec.modality_set[i]
        index = {s: k for k, s in enumerate(spec.slot_lists[i])}
        ordered = sorted(cfg.active_cross_output[i], key=lambda s: index[s])
        h = jnp.concatenate([streams[s] for s in ordered], axis=-1)
        h = _dense_encoder_forward(subnet.mems[ch_name], h, None, spec, cfg,
                                   spec.top_dim)
        if spec.all_steps:
            outs.append(h)
        else:
            outs.append(h[:, -1, :])
    out = jnp.concatenate(outs, axis=-1)
    h1 = jax.nn.relu(masked_linear(out, subnet.proj1["w"], subnet.proj1["b"]))
    h2 = masked_linear(h1, subnet.proj2["w"], subnet.proj2["b"]) + out
    return masked_linear(h2, subnet.out_layer["w"], subnet.out_layer["b"])
