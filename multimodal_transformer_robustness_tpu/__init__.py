"""TPU-native framework for robust multimodal learning under missing
modalities — a ground-up JAX/XLA/Pallas re-design with the capabilities of
the dynamic Multimodal Transformer reference (duyubo/
Multimodal-Transformer-Robustness).

Design pillars (see SURVEY.md §7):
  * static full-size parameters + on-device masks instead of per-call weight
    slicing — one jitted step serves every elastic configuration;
  * the (modality-subset × fusion-topology) sweep and EA fitness are batched
    over a configuration axis and sharded across devices;
  * batch-major layouts, fused attention, MXU-shaped matmuls.
"""

from .config import (
    ActiveConfig,
    Amn,
    AmnSum,
    ModalityStr,
    ModelSpec,
    full_active_config,
    gen_active_cross,
    gen_subnet,
)
from .masks import SupernetMasks, build_masks, stack_masks

__version__ = "0.1.0"

__all__ = [
    "ActiveConfig",
    "Amn",
    "AmnSum",
    "ModalityStr",
    "ModelSpec",
    "full_active_config",
    "gen_active_cross",
    "gen_subnet",
    "SupernetMasks",
    "build_masks",
    "stack_masks",
]
