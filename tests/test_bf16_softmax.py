"""Accuracy oracle for the policy-gated bf16-softmax attention cell
(VERDICT r3 #8; models/bert.ATTN_SOFTMAX, ops/bert_attn_pallas.py).

Same oracle shape as the int8 path's (tests/test_bert_int8.py): frozen-BERT
feature fidelity vs the f32-softmax production path, per-token cosine floor
+ global cosine, plus end-to-end supernet-output cosine.  The default stays
f32 regardless (the replicated reference numeric); this pins the error the
bf16 cell WOULD introduce so the on-chip accept/reject (BENCH_NOTES "bf16
softmax cell") rests on evidence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_transformer_robustness_tpu.models import bert as bert_mod


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "fused")


def _cos(a, b, axis=-1):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=axis)
    den = np.linalg.norm(a, axis=axis) * np.linalg.norm(b, axis=axis) + 1e-12
    return num / den


def test_bf16_softmax_feature_fidelity(interp, monkeypatch):
    cfg = bert_mod.BertConfig(vocab_size=256, hidden_size=128, num_layers=4,
                              num_heads=2, intermediate_size=512,
                              max_position=64)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, L = 4, 32
    ids = jnp.asarray(rng.integers(0, 256, (B, L)), jnp.int32)
    lengths = np.array([L, 20, 9, L])
    mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None], jnp.float32)
    types = jnp.zeros((B, L), jnp.int32)

    # bf16 activations — the production compute policy the cell would run in
    emb = {k: (v.astype(jnp.bfloat16) if k != "layers" else
               jax.tree.map(lambda x: x.astype(jnp.bfloat16), v))
           for k, v in params.items()}

    want = bert_mod.bert_apply(emb, ids, mask, types, cfg)
    monkeypatch.setattr(bert_mod, "ATTN_SOFTMAX", "bfloat16")
    got = bert_mod.bert_apply(emb, ids, mask, types, cfg)

    tok_cos = _cos(got, want)           # [B, L] per-token
    assert float(tok_cos.min()) > 0.995, float(tok_cos.min())
    assert float(_cos(np.ravel(got), np.ravel(want), axis=0)) > 0.999


def test_bf16_softmax_probabilities_sum_to_one(interp, monkeypatch):
    """The bf16 exp/sum/div stays a valid distribution on padded rows."""
    from multimodal_transformer_robustness_tpu.ops.bert_attn_pallas import (
        attention_block_fused)

    rng = np.random.default_rng(1)
    B, L, h, heads = 3, 16, 32, 2
    x = jnp.asarray(rng.standard_normal((B, L, h)), jnp.bfloat16)
    mask = jnp.asarray(np.arange(L)[None, :] < np.array([L, 5, 1])[:, None],
                       jnp.int32)
    mats = [jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
            for _ in range(4)]
    vecs = [jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
            for _ in range(4)]
    outs = {}
    for sm in ("float32", "bfloat16"):
        outs[sm] = attention_block_fused(
            x, mask, mats[0], vecs[0], mats[1], vecs[1], mats[2], vecs[2],
            mats[3], vecs[3], jnp.ones((h,)), jnp.zeros((h,)),
            n_heads=heads, eps=1e-12, interpret=True, softmax_dtype=sm)
        assert np.isfinite(np.asarray(outs[sm], np.float32)).all()
    d = np.abs(np.asarray(outs["float32"], np.float32)
               - np.asarray(outs["bfloat16"], np.float32))
    # bf16 softmax noise only — not a different computation
    assert float(d.max()) < 0.15, float(d.max())
