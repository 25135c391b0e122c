"""The staged stack knobs must not change values or gradients.

SCAN_UNROLL (ops/encoder.py, models/bert.py) unrolls the layer scan —
pure scheduling, so outputs must match rolled vs unrolled, including with
depth gates active and in train mode (same rng draws).  Bit-identical on
today's CPU backend; asserted to near-zero tolerance because XLA does not
GUARANTEE identical rounding once it may fuse across unrolled layers.

REMAT_MIN_TIME=2 exempts T==1 stacks from layer remat: values are
bit-identical (same forward program, same rngs) but gradients agree only
to ULP level (measured 1.8e-7 rel) — the backward graph differs (replay
vs stored activations), so XLA fuses/rounds differently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.ops import (
    EncoderMasks, encoder_forward, init_encoder)
from multimodal_transformer_robustness_tpu.ops import encoder as enc_mod
from multimodal_transformer_robustness_tpu.ops.encoder import EncoderHParams


def _prefix(n, k):
    m = np.zeros((n,), np.float32)
    m[:k] = 1.0
    return jnp.asarray(m)


def _masks(hp, L_act):
    return EncoderMasks(
        layer_gates=_prefix(hp.layers, L_act),
        head_mask=_prefix(hp.num_heads, hp.num_heads),
        head_dim_mask=_prefix(hp.head_dim, hp.head_dim),
        ffn_mask=_prefix(4 * hp.num_heads * hp.head_dim,
                         4 * hp.num_heads * hp.head_dim),
    )


@pytest.fixture
def restore_knobs():
    saved = (enc_mod.SCAN_UNROLL, enc_mod.REMAT_MIN_TIME,
             enc_mod.REMAT_MIN_ROWS, enc_mod.REMAT_LAYERS)
    yield
    (enc_mod.SCAN_UNROLL, enc_mod.REMAT_MIN_TIME,
     enc_mod.REMAT_MIN_ROWS, enc_mod.REMAT_LAYERS) = saved


@pytest.mark.parametrize("L_act", [1, 3])
@pytest.mark.parametrize("train", [False, True])
def test_unroll_bit_identical(restore_knobs, L_act, train):
    B, T, E, H, Dh, L = 2, 5, 12, 3, 4, 3
    hp = EncoderHParams(embed_dim_in=E, num_heads=H, head_dim=Dh,
                        layers=L, attn_mask=True)
    params = init_encoder(jax.random.PRNGKey(2), hp)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, E)),
                    jnp.float32)
    rng = jax.random.PRNGKey(9) if train else None
    outs = {}
    for unroll in (False, True):
        enc_mod.SCAN_UNROLL = unroll
        outs[unroll] = encoder_forward(
            params, x, hp=hp, masks=_masks(hp, L_act),
            attn_rate=jnp.float32(0.1), train=train, rng=rng)
    # bit-identical today; near-zero tolerance so an XLA upgrade that fuses
    # across unrolled layers doesn't turn scheduling into a red suite
    np.testing.assert_allclose(np.asarray(outs[False]), np.asarray(outs[True]),
                               rtol=1e-6, atol=1e-7)


def test_unroll_bit_identical_cross(restore_knobs):
    B, T, Tk, E, H, Dh, L = 2, 4, 6, 12, 3, 4, 2
    hp = EncoderHParams(embed_dim_in=E, num_heads=H, head_dim=Dh,
                        layers=L, attn_mask=True)
    params = init_encoder(jax.random.PRNGKey(3), hp)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((B, T, E)), jnp.float32)
    kv = jnp.asarray(r.standard_normal((B, Tk, E)), jnp.float32)
    outs = {}
    for unroll in (False, True):
        enc_mod.SCAN_UNROLL = unroll
        outs[unroll] = encoder_forward(
            params, x, kv, hp=hp, masks=_masks(hp, L),
            attn_rate=jnp.float32(0.1), train=True, rng=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(outs[False]), np.asarray(outs[True]),
                               rtol=1e-6, atol=1e-7)


def test_t1_remat_exemption_identical_grads(restore_knobs):
    """T==1 input, remat forced on (MIN_ROWS=1): exempting T==1 stacks from
    remat (REMAT_MIN_TIME=2) must not change values or gradients."""
    B, T, E, H, Dh, L = 4, 1, 12, 3, 4, 2
    hp = EncoderHParams(embed_dim_in=E, num_heads=H, head_dim=Dh,
                        layers=L, attn_mask=True)
    params = init_encoder(jax.random.PRNGKey(5), hp)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B, T, E)),
                    jnp.float32)
    enc_mod.REMAT_LAYERS = True
    enc_mod.REMAT_MIN_ROWS = 1

    def loss(p, xx):
        out = encoder_forward(p, xx, hp=hp, masks=_masks(hp, L),
                              attn_rate=jnp.float32(0.1), train=True,
                              rng=jax.random.PRNGKey(6))
        return jnp.sum(out ** 2)

    got = {}
    for min_time in (1, 2):
        enc_mod.REMAT_MIN_TIME = min_time
        v, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        got[min_time] = (v, grads)
    # Values are bit-identical (same forward program); gradients agree to
    # ULP level only — the backward graph differs (replay vs stored
    # activations), so XLA fuses/rounds differently. Measured 1.8e-7 rel.
    assert jnp.array_equal(got[1][0], got[2][0])
    for a, b in zip(jax.tree.leaves(got[1][1]), jax.tree.leaves(got[2][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
