"""Fused residual-block LIBRARY kernel (ops/trunk_block_pallas.py).

The kernel was retired from the encoder dispatch surface (measured loss at
both production regimes — see the module docstring / BENCH_NOTES); these are
its kernel-level oracle tests, in interpret mode on CPU:
  * the kernel (fwd AND custom-VJP grads, all 8 differentiable leaves)
    against ``fused_residual_block_reference`` — a dense XLA composition
    with the SAME position-hash dropout realization, differentiated by JAX
    autodiff (the flash kernel's oracle pattern);
  * the kernel against the production op composition
    (masked_layer_norm / multihead_attention T==1 fast path / masked_linear)
    for the three block shapes of a T==1 encoder layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.ops import (
    EncoderMasks, encoder_forward, init_encoder, init_mha,
    masked_layer_norm, masked_linear, multihead_attention)
from multimodal_transformer_robustness_tpu.ops.encoder import EncoderHParams
from multimodal_transformer_robustness_tpu.ops.linear import init_linear
from multimodal_transformer_robustness_tpu.ops.trunk_block_pallas import (
    fused_residual_block, fused_residual_block_reference)


def _prefix(n, k):
    m = np.zeros((n,), np.float32)
    m[:k] = 1.0
    return jnp.asarray(m)


def _rand_operands(rng, B, E, F):
    r = rng
    return dict(
        x=jnp.asarray(r.standard_normal((B, E)), jnp.float32),
        src=jnp.asarray(r.standard_normal((B, E)), jnp.float32),
        w1=jnp.asarray(r.standard_normal((F, E)) * 0.1, jnp.float32),
        b1=jnp.asarray(r.standard_normal((F,)) * 0.1, jnp.float32),
        w2=jnp.asarray(r.standard_normal((E, F)) * 0.1, jnp.float32),
        b2=jnp.asarray(r.standard_normal((E,)) * 0.1, jnp.float32),
        ln_g=jnp.asarray(1 + 0.1 * r.standard_normal((E,)), jnp.float32),
        ln_b=jnp.asarray(0.1 * r.standard_normal((E,)), jnp.float32),
    )


@pytest.mark.parametrize("act,mid_rep", [("relu", 1), ("id", 4)])
@pytest.mark.parametrize("masked", [False, True])
def test_kernel_matches_hash_reference_fwd_and_grads(act, mid_rep, masked):
    r = np.random.default_rng(0)
    B, E, F = 13, 16, 24  # B deliberately not a multiple of block_rows
    ops = _rand_operands(r, B, E, F)
    m_in = _prefix(E, 12) if masked else None
    m_mid = _prefix(F, 18) if masked else None
    m_out = _prefix(E, 12) if masked else None
    kw = dict(act=act, mid_rep=mid_rep, rate_mid=0.3, rate_res=0.2,
              seed_mid=123, seed_res=456, use_drop_mid=True,
              use_drop_res=True)
    args = (ops["x"], ops["src"], ops["w1"], ops["b1"], ops["w2"], ops["b2"],
            ops["ln_g"], ops["ln_b"])

    def lk(*a):
        return jnp.sum(fused_residual_block(
            *a, m_in, m_mid, m_out, block_rows=8, interpret=True, **kw) ** 2)

    def lr(*a):
        return jnp.sum(fused_residual_block_reference(
            *a, m_in, m_mid, m_out, **kw) ** 2)

    out_k = fused_residual_block(*args, m_in, m_mid, m_out, block_rows=8,
                                 interpret=True, **kw)
    out_r = fused_residual_block_reference(*args, m_in, m_mid, m_out, **kw)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    gk = jax.grad(lk, argnums=tuple(range(8)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(8)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_kernel_matches_production_ops_composition():
    """attn-self / attn-cross / FFN sub-blocks against the exact op chain
    ops/encoder._layer_forward runs (dropout off)."""
    r = np.random.default_rng(1)
    B, E, H, Dh = 12, 16, 2, 4
    F = 4 * H * Dh
    attn = init_mha(jax.random.PRNGKey(0), E, H, Dh)
    fc1 = init_linear(jax.random.PRNGKey(1), E, F)
    fc2 = init_linear(jax.random.PRNGKey(2), F, E)
    g = jnp.asarray(1 + 0.1 * r.standard_normal((E,)), jnp.float32)
    lb = jnp.asarray(0.1 * r.standard_normal((E,)), jnp.float32)
    cm = _prefix(E, 12)
    hm, dm = _prefix(H, 1), _prefix(Dh, 3)
    ffnm = _prefix(F, 10)
    x3 = jnp.asarray(r.standard_normal((B, 1, E)), jnp.float32) * cm
    xv = jnp.asarray(r.standard_normal((B, 1, E)), jnp.float32)
    w1 = attn["in_proj_w"][2].reshape(H * Dh, E)
    b1 = attn["in_proj_b"][2].reshape(H * Dh)
    w2 = attn["out_w"].reshape(E, H * Dh)
    b2 = attn["out_b"]
    m_mid = (hm[:, None] * dm[None, :]).reshape(H * Dh)

    # self-attention block with channel mask
    h = masked_layer_norm(x3, g, lb, cm)
    ref = x3 + multihead_attention(attn, h, h, h, head_mask=hm,
                                   head_dim_mask=dm, channel_mask=cm,
                                   attn_dropout=0.0, train=False)
    out = fused_residual_block(x3, x3, w1, b1, w2, b2, g, lb, cm, m_mid, cm,
                               act="id", mid_rep=Dh, block_rows=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # cross block: value stream is the kv input, no channel mask
    hq = masked_layer_norm(x3, g, lb, None)
    k = masked_layer_norm(xv, g, lb, None)
    v = masked_layer_norm(xv, g, lb, None)
    ref_c = x3 + multihead_attention(attn, hq, k, v, head_mask=hm,
                                     head_dim_mask=dm, channel_mask=None,
                                     attn_dropout=0.0, train=False)
    out_c = fused_residual_block(x3, xv, w1, b1, w2, b2, g, lb, None, m_mid,
                                 None, act="id", mid_rep=Dh, block_rows=8,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-6)

    # FFN block
    h2 = masked_layer_norm(x3, g, lb, cm)
    h2 = masked_linear(h2, fc1["w"], fc1["b"], mask_out=ffnm)
    h2 = masked_linear(jax.nn.relu(h2), fc2["w"], fc2["b"], mask_out=cm)
    out_f = fused_residual_block(x3, x3, fc1["w"], fc1["b"], fc2["w"],
                                 fc2["b"], g, lb, cm, ffnm, cm, act="relu",
                                 mid_rep=1, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(x3 + h2),
                               rtol=1e-5, atol=1e-6)


def test_kernel_bf16_tolerance():
    r = np.random.default_rng(3)
    B, E, F = 16, 16, 24
    ops = _rand_operands(r, B, E, F)
    args16 = tuple(v.astype(jnp.bfloat16) if k in ("x", "src") else v
                   for k, v in ops.items())
    out16 = fused_residual_block(*args16, None, None, None, act="relu",
                                 block_rows=8, interpret=True)
    out32 = fused_residual_block(*ops.values(), None, None, None, act="relu",
                                 block_rows=8, interpret=True)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), rtol=0.05, atol=0.05)
