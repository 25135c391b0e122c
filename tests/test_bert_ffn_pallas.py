"""Fused frozen-BERT FFN kernel (ops/bert_ffn_pallas.py) — equivalence vs
the unfused XLA composition, on CPU via interpret mode.

The kernel is forward-only (the text BERT is frozen — no gradients route
through it, models/mult.py), so these tests pin values only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.models import bert as bert_mod
from multimodal_transformer_robustness_tpu.models.bert import _ln, bert_apply, init_bert
from multimodal_transformer_robustness_tpu.ops.bert_ffn_pallas import ffn_ln_block


def _unfused(x, w1, b1, w2, b2, g, b, eps):
    ff = jax.nn.gelu(x @ w1.T + b1, approximate=False)
    return _ln(x + (ff @ w2.T + b2), g, b, eps)


@pytest.mark.parametrize("rows,h,ffn,dtype,tol", [
    (64, 128, 256, jnp.float32, 1e-6),
    (200, 128, 384, jnp.float32, 1e-6),   # rows % block_rows != 0 (padding)
    (96, 256, 512, jnp.bfloat16, 0.05),
])
def test_kernel_matches_unfused(rows, h, ffn, dtype, tol):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, h)), dtype)
    w1 = jnp.asarray(rng.normal(size=(ffn, h)) * 0.05, dtype)
    b1 = jnp.asarray(rng.normal(size=(ffn,)) * 0.05, dtype)
    w2 = jnp.asarray(rng.normal(size=(h, ffn)) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(h,)) * 0.05, dtype)
    g = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    ref = _unfused(x, w1, b1, w2, b2, g, b, 1e-12).astype(jnp.float32)
    out = ffn_ln_block(x, w1, b1, w2, b2, g, b, eps=1e-12, block_rows=64,
                       interpret=True).astype(jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=tol, rtol=tol)


def test_kernel_handles_3d_input():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 7, 128)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    b1 = jnp.zeros((256,))
    w2 = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    b2 = jnp.zeros((128,))
    g, b = jnp.ones((128,)), jnp.zeros((128,))
    ref = _unfused(x, w1, b1, w2, b2, g, b, 1e-12)
    out = ffn_ln_block(x, w1, b1, w2, b2, g, b, eps=1e-12, block_rows=32,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bert_apply_pallas_ffn_equals_xla(monkeypatch):
    """Full bert_apply with the fused FFN (interpret mode) == the XLA path,
    at an MXU-aligned tiny config."""
    cfg = bert_mod.BertConfig(vocab_size=97, hidden_size=128, num_layers=2,
                              num_heads=2, intermediate_size=256,
                              max_position=32, type_vocab_size=2)
    params = init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 97, size=(3, 9)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(3, 9)), jnp.int32)
    types = jnp.zeros((3, 9), jnp.int32)

    ref = bert_apply(params, ids, mask, types, cfg)
    monkeypatch.setattr(bert_mod, "FFN_IMPL", "pallas")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    out = bert_apply(params, ids, mask, types, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_proj_ln_block_matches_unfused():
    from multimodal_transformer_robustness_tpu.ops.bert_ffn_pallas import proj_ln_block

    rng = np.random.default_rng(5)
    for rows, dt, tol in [(100, jnp.float32, 1e-6), (96, jnp.bfloat16, 0.05)]:
        h = 128
        resid = jnp.asarray(rng.normal(size=(rows, h)), dt)
        a = jnp.asarray(rng.normal(size=(rows, h)), dt)
        w = jnp.asarray(rng.normal(size=(h, h)) * 0.05, dt)
        b = jnp.asarray(rng.normal(size=(h,)) * 0.05, dt)
        g = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1.0, jnp.float32)
        bb = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        ref = _ln(resid + (a @ w.T + b), g, bb, 1e-12).astype(jnp.float32)
        out = proj_ln_block(resid, a, w, b, g, bb, eps=1e-12, block_rows=64,
                            interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=tol, rtol=tol)


def test_unaligned_dims_fall_back_to_xla():
    # h=16 (tiny test config) must resolve to the XLA path even when the
    # module flag asks for pallas
    assert bert_mod._ffn_resolved_impl(16, 64, False) == "xla"
    assert bert_mod._ffn_resolved_impl(768, 100, False) == "xla"


def test_int8_kernel_matches_unfused_qproj():
    from multimodal_transformer_robustness_tpu.models.bert import _qproj, quantize_bert_params
    from multimodal_transformer_robustness_tpu.ops.bert_ffn_pallas import ffn_ln_block_q

    rng = np.random.default_rng(3)
    rows, h, ffn = 100, 128, 256   # rows % block_rows != 0 (padding path)
    x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(ffn, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(ffn,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, ffn)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
    g = jnp.ones((h,), jnp.float32)
    b = jnp.zeros((h,), jnp.float32)
    qp = quantize_bert_params(
        {"layers": {"q_w": w1, "k_w": w1, "v_w": w1, "o_w": w1,
                    "fc1_w": w1, "fc2_w": w2}})
    w1q, w2q = qp["layers"]["fc1_w"], qp["layers"]["fc2_w"]

    ff = jax.nn.gelu(_qproj(x, w1q, b1), approximate=False)
    ref = _ln(x + _qproj(ff, w2q, b2), g, b, 1e-12)
    out = ffn_ln_block_q(x, w1q, b1, w2q, b2, g, b, eps=1e-12,
                         block_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_bert_apply_pallas_ffn_int8_equals_xla(monkeypatch):
    from multimodal_transformer_robustness_tpu.models.bert import quantize_bert_params

    cfg = bert_mod.BertConfig(vocab_size=97, hidden_size=128, num_layers=2,
                              num_heads=2, intermediate_size=256,
                              max_position=32, type_vocab_size=2)
    params = quantize_bert_params(init_bert(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 97, size=(3, 9)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(3, 9)), jnp.int32)
    types = jnp.zeros((3, 9), jnp.int32)

    ref = bert_apply(params, ids, mask, types, cfg)
    monkeypatch.setattr(bert_mod, "FFN_IMPL", "pallas")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    out = bert_apply(params, ids, mask, types, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
