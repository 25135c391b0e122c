"""OFA-style importance sorting as pure parameter-pytree permutations.

Reference (citing mit-han-lab/once-for-all):
  * ``DynamicMultiheadAttention.sort_hidden_layers``
    (modules/dynamic_multihead_attention.py:166-206): L1 importance of each
    per-head unit, summed over {q,k,v} and input channels -> sort the Dh
    units WITHIN each head (one shared order across q/k/v), permuting
    in_proj rows/bias and out_proj input columns consistently;
  * ``DynamicMultiheadAttention.sort_heads`` (:209-241): L1 importance per
    head -> reorder whole head blocks.  NOTE the reference function crashes
    on a bare ``head_dim`` NameError (:229 — its own "TO be Tested!!!!!!"
    marker); the intended semantics are unambiguous and implemented here;
  * ``DynamicTransformerEncoderLayer.sort_hidden_layers``
    (modules/dynamic_transformer.py:191-212): L1 row importance of fc1 ->
    permute fc1 rows/bias and fc2 input columns;
  * the model-level ``sort`` (src/dynamic_models2.py:426-437) indexes
    ``self.trans`` as a list (stale vs ModuleDict) and crashes;
    :func:`sort_supernet` is the working equivalent.

Because every permutation is applied consistently to producer and consumer
sides, the FULL-config forward is exactly invariant; what changes is which
units a PREFIX mask keeps — after sorting, prefix-slab elasticity retains
the most important heads/units, which is the whole point of the OFA recipe.

Our packed layouts: ``in_proj_w [3, H, Dh, E]``, ``in_proj_b [3, H, Dh]``,
``out_w [E_out, H, Dh]``, ``fc1.w [ffn, E]``, ``fc2.w [E, ffn]`` — the
permutations are plain gathers on the H / Dh / ffn axes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelSpec
from .mult import SupernetParams


def sort_attn_hidden(attn: dict) -> Tuple[dict, jnp.ndarray]:
    """Within-head unit sort.  Returns (params, idx [H, Dh]) with
    importance descending along Dh for every head."""
    w = attn["in_proj_w"]                       # [3, H, Dh, E]
    imp = jnp.abs(w).sum(axis=(0, 3))           # [H, Dh]
    idx = jnp.argsort(-imp, axis=1)              # descending
    gather = idx[None, :, :, None]
    out = dict(attn)
    out["in_proj_w"] = jnp.take_along_axis(w, gather, axis=2)
    out["in_proj_b"] = jnp.take_along_axis(attn["in_proj_b"], idx[None], axis=2)
    out["out_w"] = jnp.take_along_axis(attn["out_w"], idx[None], axis=2)
    return out, idx


def sort_attn_heads(attn: dict) -> Tuple[dict, jnp.ndarray]:
    """Whole-head sort.  Returns (params, idx [H])."""
    w = attn["in_proj_w"]
    imp = jnp.abs(w).sum(axis=(0, 2, 3))         # [H]
    idx = jnp.argsort(-imp)
    out = dict(attn)
    out["in_proj_w"] = w[:, idx]
    out["in_proj_b"] = attn["in_proj_b"][:, idx]
    out["out_w"] = attn["out_w"][:, idx]
    return out, idx


def sort_ffn(fc1: dict, fc2: dict) -> Tuple[dict, dict, jnp.ndarray]:
    """FFN hidden-unit sort.  Returns (fc1, fc2, idx [ffn])."""
    imp = jnp.abs(fc1["w"]).sum(axis=1)          # [ffn]
    idx = jnp.argsort(-imp)
    return ({"w": fc1["w"][idx], "b": fc1["b"][idx]},
            {"w": fc2["w"][:, idx], "b": fc2["b"]},
            idx)


def sort_encoder_layer(lp: dict, heads: bool = True, hidden: bool = True,
                       ffn: bool = True) -> dict:
    """One encoder layer: heads, then within-head units, then FFN units
    (matching the reference's DynamicTransformerEncoder.sort order,
    dynamic_transformer.py:~95-102 would-be call sequence)."""
    out = dict(lp)
    attn = lp["attn"]
    if heads:
        attn, _ = sort_attn_heads(attn)
    if hidden:
        attn, _ = sort_attn_hidden(attn)
    out["attn"] = attn
    if ffn:
        out["fc1"], out["fc2"], _ = sort_ffn(lp["fc1"], lp["fc2"])
    return out


def sort_supernet(spec: ModelSpec, params: SupernetParams) -> SupernetParams:
    """Importance-sort every encoder layer of every stack (mems0 / cross /
    mems).  Headers, LayerNorms and the head MLP have no prefix-elastic
    unit axis, so they are untouched.  Full-config forward is invariant;
    prefix-masked configs now keep the most important units."""
    def sort_stack(enc: dict) -> dict:
        layers = enc["layers"]
        if layers["attn"]["in_proj_w"].shape[1] == 0:  # zero-depth stacks
            return enc
        # leaves carry [n_stacks, L, ...]: vmap the per-layer sort twice
        sorted_layers = jax.vmap(jax.vmap(sort_encoder_layer))(layers)
        return {**enc, "layers": sorted_layers}

    return params._replace(
        mems0=sort_stack(params.mems0),
        cross=sort_stack(params.cross) if params.cross is not None else None,
        mems=sort_stack(params.mems),
    )
