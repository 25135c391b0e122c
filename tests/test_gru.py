"""GRU parity vs torch.nn.GRU (the reference headers are built on torch GRU —
src/dynamic_models2.py:23-39)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.ops import (
    bigru_forward,
    gru_forward,
    init_bigru,
)

torch = pytest.importorskip("torch")


def _torch_gru(input_dim, hidden, bidirectional, seed=0):
    torch.manual_seed(seed)
    return torch.nn.GRU(input_size=input_dim, hidden_size=hidden, num_layers=1,
                        batch_first=True, bidirectional=bidirectional)


def _params_from_torch(g, suffix=""):
    return {
        "w_ih": jnp.asarray(getattr(g, f"weight_ih_l0{suffix}").detach().numpy()),
        "w_hh": jnp.asarray(getattr(g, f"weight_hh_l0{suffix}").detach().numpy()),
        "b_ih": jnp.asarray(getattr(g, f"bias_ih_l0{suffix}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(g, f"bias_hh_l0{suffix}").detach().numpy()),
    }


def test_gru_forward_matches_torch(rng):
    B, T, I, H = 3, 7, 5, 4
    g = _torch_gru(I, H, bidirectional=False)
    params = _params_from_torch(g)
    x = rng.standard_normal((B, T, I)).astype(np.float32)

    with torch.no_grad():
        out_t, h_t = g(torch.from_numpy(x))
    out_j, h_j = gru_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-4)


def test_bigru_final_hidden_matches_torch(rng):
    B, T, I, H = 2, 6, 4, 3
    g = _torch_gru(I, H, bidirectional=True, seed=1)
    params = {"fwd": _params_from_torch(g), "bwd": _params_from_torch(g, "_reverse")}
    x = rng.standard_normal((B, T, I)).astype(np.float32)

    with torch.no_grad():
        out_t, h_t = g(torch.from_numpy(x))
    out_j, h_j = bigru_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4)
    # reference RNN_Header: torch.cat((h[0], h[1]), dim=1)
    expect = torch.cat((h_t[0], h_t[1]), dim=1).numpy()
    np.testing.assert_allclose(np.asarray(h_j), expect, atol=1e-4)


def test_bigru_init_shapes():
    p = init_bigru(__import__("jax").random.PRNGKey(0), 5, 4)
    assert p["fwd"]["w_ih"].shape == (12, 5)
    assert p["bwd"]["w_hh"].shape == (12, 4)


def test_pallas_recurrence_matches_xla_fwd_and_grads():
    """Fused-kernel recurrence (interpret mode on CPU) == lax.scan path,
    values and gradients, including the G axis and the recomputing
    backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_transformer_robustness_tpu.ops import gru as gru_mod
    from multimodal_transformer_robustness_tpu.ops.gru import (
        _gate_views, _gi_gates, _recurrence_xla)
    from multimodal_transformer_robustness_tpu.ops.gru_pallas import (
        gru_recurrence_pallas)

    rng = np.random.default_rng(0)
    G, T, N, H = 3, 7, 5, 12
    gi = jnp.asarray(rng.standard_normal((G, N, T, 3 * H)), jnp.float32)
    gi_r, gi_z, gi_n = (jnp.moveaxis(a, 1, 2)
                        for a in _gi_gates(gi, H))        # [G, T, N, H]
    w_hh = jnp.asarray(rng.standard_normal((G, 3 * H, H)) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
    wr, wz, wn, br, bz, bn = _gate_views(w_hh, b_hh)

    hs_x = _recurrence_xla(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn)
    hs_p = gru_recurrence_pallas(gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn,
                                 True)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_x),
                               rtol=1e-5, atol=1e-5)

    tgt = jnp.asarray(rng.standard_normal(hs_x.shape), jnp.float32)

    def loss(fn, args):
        return jnp.sum(jnp.sin(fn(*args)) * tgt)

    args = (gi_r, gi_z, gi_n, wr, wz, wn, br, bz, bn)
    g_x = jax.grad(lambda *a: loss(_recurrence_xla, a), argnums=range(9))(*args)
    g_p = jax.grad(
        lambda *a: loss(lambda *b: gru_recurrence_pallas(*b, True), a),
        argnums=range(9))(*args)
    for a, b, name in zip(g_x, g_p,
                          "gi_r gi_z gi_n wr wz wn br bz bn".split()):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_grouped_header_equals_individual():
    """grouped_rnn_header_apply (shared-kernel G-axis path) == running each
    RNN header individually."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_transformer_robustness_tpu.models.headers import (
        _init_rnn_header, _rnn_header_apply, grouped_rnn_header_apply)

    rng = np.random.default_rng(1)
    d, T, B = 8, 6, 3
    widths = (10, 7, 4)
    params = [_init_rnn_header(jax.random.PRNGKey(i), w, d)
              for i, w in enumerate(widths)]
    xs = [jnp.asarray(rng.standard_normal((B, T, w)), jnp.float32)
          for w in widths]
    grouped = grouped_rnn_header_apply(params, xs)
    for p, x, g in zip(params, xs, grouped):
        solo = _rnn_header_apply(p, x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(solo),
                                   rtol=1e-5, atol=1e-6)
