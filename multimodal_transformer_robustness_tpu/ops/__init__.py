"""TPU-native elastic ops: static-shape, mask-parameterized primitives.

Every op here is shape-static and jit/vmap/shard_map friendly; elasticity is
expressed through mask arrays (see ``masks.py``) rather than weight slicing.
"""

from .linear import masked_linear
from .layernorm import masked_layer_norm
from .positional import make_positions, sinusoidal_pe
from .attention import future_mask, multihead_attention, init_mha
from .dropout import dropout
from .encoder import (
    init_encoder,
    encoder_forward,
    EncoderMasks,
)
from .gru import init_gru, gru_forward, init_bigru, bigru_forward

__all__ = [
    "masked_linear",
    "masked_layer_norm",
    "make_positions",
    "sinusoidal_pe",
    "future_mask",
    "multihead_attention",
    "init_mha",
    "dropout",
    "init_encoder",
    "encoder_forward",
    "EncoderMasks",
    "init_gru",
    "gru_forward",
    "init_bigru",
    "bigru_forward",
]
