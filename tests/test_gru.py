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
