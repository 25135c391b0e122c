"""Lowering of :class:`~.config.ActiveConfig` to on-device mask arrays.

The reference implements elasticity by slicing weights per call
(``[:active]`` prefix slabs + ``index_select`` channel gathers —
modules/dynamic_layers.py, modules/dynamic_multihead_attention.py:259-282).
That design forces a fresh shape per configuration.  Here every structural
choice becomes *data*: boolean/float masks with static shapes, so that one
jitted step serves every (modality subset × fusion topology × depth × width)
configuration with zero recompilation.  Masked-out units contribute exactly
zero, which is numerically identical to the reference's gather-then-dense
for every linear/attention op; LayerNorm and the sinusoidal positional
embedding need mask-aware statistics (see ops/layernorm.py, ops/positional.py).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from .config import ActiveConfig, ModelSpec

__all__ = ["SupernetMasks", "build_masks", "stack_masks"]


def _prefix(n_active: int, n_total: int, dtype=np.float32) -> np.ndarray:
    m = np.zeros((n_total,), dtype=dtype)
    m[:n_active] = 1
    return m


@register_dataclass
@dataclasses.dataclass(frozen=True)
class SupernetMasks:
    """Pytree of masks: the device-side form of one active configuration.

    All leaves are arrays (float32 for multiplicative masks / gates), so a
    batch of configurations can be stacked along a leading axis and swept
    with ``vmap`` (the robustness sweep / EA fitness axis — SURVEY.md §3.3).
    """

    # per-stack depth gates: 1.0 for layers that run
    mems0_gates: jnp.ndarray      # [M, L_single]
    cross_gates: jnp.ndarray      # [L_cross] (shared by all cross stacks —
    #                               reference set_active loops all keys,
    #                               src/dynamic_models2.py:408-412)
    mems_gates: jnp.ndarray       # [L_self]
    # width masks (shared across stacks: reference pushes the same dims
    # everywhere — src/dynamic_models2.py:391-418)
    head_mask: jnp.ndarray        # [H]
    head_dim_mask: jnp.ndarray    # [Dh]
    ffn_mask: jnp.ndarray         # [ffn_dim] prefix mask of active_dimension
    # topology
    cross_enable: jnp.ndarray     # [n_cross] 1.0 if the cross module's output
    #                               is consumed (for translation-loss gating /
    #                               introspection; compute is static anyway)
    slot_mask: jnp.ndarray        # [M, n_slots] fused-output slot selection
    branch_gate: jnp.ndarray      # [M] 1.0 if branch contributes outputs

    @property
    def active_head_dim(self) -> jnp.ndarray:
        return jnp.sum(self.head_dim_mask)

    def channel_mask(self, spec_dimension: int) -> jnp.ndarray:
        """Per-branch channel mask over the top-stack width
        [M, n_slots * d]: slot k active => its d channels active.
        Matches the index set built at reference src/dynamic_models2.py:243-251.
        """
        gated = self.slot_mask * self.branch_gate[:, None]
        return jnp.repeat(gated, spec_dimension, axis=-1)

    def output_channel_mask(self, spec_dimension: int) -> jnp.ndarray:
        """Global channel mask over combined_dim = M * n_slots * d — the
        ``active_mask_output`` of the reference head MLP
        (src/dynamic_models2.py:247-250,276)."""
        return self.channel_mask(spec_dimension).reshape(-1)


def build_masks(spec: ModelSpec, cfg: ActiveConfig, validate: bool = True) -> SupernetMasks:
    """Host-side lowering.  Raises on configurations the reference would
    crash on (consuming a never-produced stream — KeyError at
    src/dynamic_models2.py:240).

    Note one documented canonicalization: the reference concatenates output
    streams in ``active_cross_output[i]`` *list order*; we canonicalize to
    slot order.  Every config produced by the reference's own samplers and
    sweeps is already slot-ordered (gen_active_cross preserves generation
    order; the sweep candidates are hand-written in slot order), so this only
    affects pathological hand-built configs, where the reference's positional
    embedding would differ.
    """
    if validate:
        cfg.validate(spec)
    M = spec.modality_num
    n_cross = len(spec.cross_strings)
    n_slots = spec.n_slots

    if spec.layers_single_attn:
        mems0 = np.stack(
            [_prefix(cfg.active_single_attn_layer_num[i], spec.layers_single_attn)
             for i in range(M)]
        )
    else:
        mems0 = np.zeros((M, 0), np.float32)
    cross_g = _prefix(cfg.active_hybrid_attn_layer_num, spec.layers_cross_attn)
    mems_g = _prefix(cfg.active_self_attn_layer_num, spec.layers_self_attn)

    head = _prefix(cfg.active_head_num, spec.num_heads)
    hdim = _prefix(cfg.active_head_dim, spec.head_dim)
    ffn = _prefix(cfg.active_dimension, spec.ffn_dim)

    enabled = set()
    active_set = set(cfg.active_modality)
    for i in cfg.active_modality:
        # reference runs branch i's chain only when it emits output
        # (src/dynamic_models2.py:238); chains of silent branches may still be
        # consumed by other branches' outputs only via their own chains, so
        # gating on emission matches.
        if cfg.active_cross_output[i]:
            enabled.update(cfg.active_cross[i])
    cross_en = np.array([1.0 if s in enabled else 0.0 for s in spec.cross_strings], np.float32)

    slot = np.zeros((M, n_slots), np.float32)
    branch = np.zeros((M,), np.float32)
    for i in range(M):
        if i in active_set and cfg.active_cross_output[i]:
            branch[i] = 1.0
            index = {s: k for k, s in enumerate(spec.slot_lists[i])}
            for s in cfg.active_cross_output[i]:
                slot[i, index[s]] = 1.0

    # leaves stay NUMPY: masks are built per configuration on the host, and
    # host arrays cost one device transfer at jit-call time instead of one
    # tiny transfer per leaf per config at build time (on a remote-tunnel
    # TPU, per-op dispatch dominates — stacking 32 device-array mask pytrees
    # measured 12 s vs ~0 for numpy)
    return SupernetMasks(
        mems0_gates=mems0,
        cross_gates=cross_g,
        mems_gates=mems_g,
        head_mask=head,
        head_dim_mask=hdim,
        ffn_mask=ffn,
        cross_enable=cross_en,
        slot_mask=slot,
        branch_gate=branch,
    )


def stack_masks(masks: "list[SupernetMasks]") -> SupernetMasks:
    """Stack a list of configurations along a new leading axis, producing the
    config axis that eval sweeps / EA fitness vmap over (SURVEY.md §5
    'distributed communication backend': the configuration axis is sharded
    across devices instead of the reference's serial loops).  Host-side
    np.stack; the single device transfer happens at dispatch."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *masks)
