"""Fused bidirectional-GRU level kernel (ops/bigru_pallas.py) — exactness
vs the lax.scan path, values and gradients, interpret mode on CPU.

The kernel replaces the whole per-level XLA glue (gate stack/split/
transpose/time-reverse/bias passes) with layout-aware BlockSpecs, so these
tests pin the full contract: packed-gi projection, in-kernel time reversal
of the backward direction, in-kernel biases, fwd‖bwd packed output, and
the recomputing backward's packed gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.ops import gru as gru_mod
from multimodal_transformer_robustness_tpu.ops.bigru_pallas import (
    bigru_finals_tmajor,
    bigru_level_tmajor,
)
from multimodal_transformer_robustness_tpu.ops.gru import bigru_forward, init_bigru


@pytest.fixture(autouse=True)
def _xla_reference():
    old = gru_mod.RECURRENCE_IMPL
    gru_mod.RECURRENCE_IMPL = "xla"
    yield
    gru_mod.RECURRENCE_IMPL = old


def test_bigru_level_matches_xla_values():
    rng = np.random.default_rng(0)
    B, T, I, H = 3, 10, 7, 12
    params = init_bigru(jax.random.PRNGKey(0), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)), jnp.float32)

    out_ref, fin_ref = bigru_forward(params, x)
    hs_t = bigru_level_tmajor(params, jnp.swapaxes(x, 0, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(hs_t, 0, 1)),
                               np.asarray(out_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bigru_finals_tmajor(hs_t)),
                               np.asarray(fin_ref), rtol=1e-5, atol=1e-6)


def test_bigru_level_matches_xla_grads():
    rng = np.random.default_rng(1)
    B, T, I, H = 2, 8, 5, 9
    params = init_bigru(jax.random.PRNGKey(1), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, T, 2 * H)), jnp.float32)
    tgt2 = jnp.asarray(rng.standard_normal((B, 2 * H)), jnp.float32)

    def loss_ref(p, x):
        o, f = bigru_forward(p, x)
        return jnp.sum(jnp.sin(o) * tgt) + jnp.sum(jnp.cos(f) * tgt2)

    def loss_new(p, x):
        hs = bigru_level_tmajor(p, jnp.swapaxes(x, 0, 1), interpret=True)
        return (jnp.sum(jnp.sin(jnp.swapaxes(hs, 0, 1)) * tgt)
                + jnp.sum(jnp.cos(bigru_finals_tmajor(hs)) * tgt2))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_new = jax.grad(loss_new, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(g_ref[0]), jax.tree.leaves(g_new[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_header_pipeline_fused_equals_xla():
    """_rnn_header_apply / grouped_rnn_header_apply on the fused path
    (pallas_interpret) == the lax.scan path, including the inter-level LN
    and the final-hidden extraction."""
    from multimodal_transformer_robustness_tpu.models.headers import (
        _init_rnn_header, _rnn_header_apply, grouped_rnn_header_apply)

    rng = np.random.default_rng(2)
    d, T, B = 8, 6, 3
    widths = (10, 7, 4)
    params = [_init_rnn_header(jax.random.PRNGKey(i), w, d)
              for i, w in enumerate(widths)]
    xs = [jnp.asarray(rng.standard_normal((B, T, w)), jnp.float32)
          for w in widths]

    gru_mod.RECURRENCE_IMPL = "xla"
    ref = [_rnn_header_apply(p, x) for p, x in zip(params, xs)]
    gru_mod.RECURRENCE_IMPL = "pallas_interpret"
    solo = [_rnn_header_apply(p, x) for p, x in zip(params, xs)]
    grouped = grouped_rnn_header_apply(params, xs)
    for r, a, b in zip(ref, solo, grouped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_bigru_level_odd_batch_and_bf16():
    """Non-multiple-of-8 batch rows and a bf16 gi path stay correct (the
    grid pads the batch dimension; values track the f32 oracle at bf16
    tolerance)."""
    rng = np.random.default_rng(3)
    B, T, I, H = 5, 6, 4, 8
    params = init_bigru(jax.random.PRNGKey(2), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)), jnp.float32)

    out_ref, _ = bigru_forward(params, x)
    hs32 = bigru_level_tmajor(params, jnp.swapaxes(x, 0, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(hs32, 0, 1)),
                               np.asarray(out_ref), rtol=1e-5, atol=1e-6)

    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    hs16 = bigru_level_tmajor(cast(params), jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16),
                              interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(hs16, 0, 1).astype(jnp.float32)),
        np.asarray(out_ref), rtol=0.08, atol=0.08)


def test_bigru_bf16_grads_track_f32():
    """The bf16 path's backward runs every block matmul in bf16 (native
    dtype); its gradients must still point the same way as the f32
    oracle's — cosine > 0.995 and matching norms per leaf."""
    rng = np.random.default_rng(4)
    B, T, I, H = 4, 6, 5, 8
    params = init_bigru(jax.random.PRNGKey(3), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, T, 2 * H)), jnp.float32)
    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)

    def loss(p, x):
        hs = bigru_level_tmajor(p, jnp.swapaxes(x, 0, 1), interpret=True)
        return jnp.sum(jnp.sin(jnp.swapaxes(hs, 0, 1).astype(jnp.float32))
                       * tgt)

    g32 = jax.grad(loss)(params, x)
    g16 = jax.grad(loss)(cast(params), x.astype(jnp.bfloat16))
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.995, cos
        assert 0.8 < np.linalg.norm(b) / (np.linalg.norm(a) + 1e-30) < 1.25


def test_bigru_need_dx_false_param_grads_unchanged():
    """need_dx=False (the production first-level wiring: nothing trainable
    upstream of the header input) must leave every PARAM gradient
    bit-identical to need_dx=True and match the lax.scan oracle — only the
    structurally-dead input cotangent is elided (returned as zeros)."""
    rng = np.random.default_rng(5)
    B, T, I, H = 3, 8, 5, 9
    params = init_bigru(jax.random.PRNGKey(4), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, T, 2 * H)), jnp.float32)

    def loss_ref(p):
        o, _ = bigru_forward(p, x)
        return jnp.sum(jnp.sin(o) * tgt)

    def loss_new(p, need_dx):
        hs = bigru_level_tmajor(p, jnp.swapaxes(x, 0, 1), interpret=True,
                                need_dx=need_dx)
        return jnp.sum(jnp.sin(jnp.swapaxes(hs, 0, 1)) * tgt)

    g_ref = jax.grad(loss_ref)(params)
    g_t = jax.grad(lambda p: loss_new(p, True))(params)
    g_f = jax.grad(lambda p: loss_new(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=0)
    gx = jax.grad(lambda xx: jnp.sum(bigru_level_tmajor(
        params, jnp.swapaxes(xx, 0, 1), interpret=True, need_dx=False)))(x)
    assert float(jnp.abs(gx).max()) == 0.0


def test_cnn_header_conv_grad_live_on_tmajor_path():
    """cnn_rnn headers have the TRAINABLE Conv2d upstream of gru1, so the
    fused T-major path must keep gru1's input cotangent (live_input=True).
    The r5 need_dx=False elision originally applied to every header kind
    and silently zeroed d(loss)/d(conv) on TPU only — CPU tests take the
    lax.scan path, which is why this test pins the pallas_interpret impl
    through the full header_apply dispatch."""
    from multimodal_transformer_robustness_tpu.models.headers import (
        _init_cnn, _init_rnn_header, header_apply)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # the init_header("cnn_rnn") layout at orig=8, d=6 (headers.py:init_header)
    params = {"cnn": _init_cnn(k1), "rnn": _init_rnn_header(k2, 4, 6)}
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 1, 8, 8)), jnp.float32)

    def loss(p):
        return jnp.sum(header_apply("cnn_rnn", p, x) ** 2)

    gru_mod.RECURRENCE_IMPL = "xla"
    g_ref = jax.grad(loss)(params)
    gru_mod.RECURRENCE_IMPL = "pallas_interpret"
    g_fused = jax.grad(loss)(params)
    # the conv gradient must be nonzero AND match the scan path
    ref_cw = np.asarray(g_ref["cnn"]["w"])
    assert np.abs(ref_cw).max() > 0
    np.testing.assert_allclose(np.asarray(g_fused["cnn"]["w"]), ref_cw,
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
