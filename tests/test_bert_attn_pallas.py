"""Dense block-diagonal attention kernel (ops/bert_attn_pallas.py) —
equivalence vs models/bert's unfused XLA composition, on CPU via interpret
mode.

The kernel is forward-only (the text BERT is frozen — no gradients route
through it, models/mult.py), so these tests pin values only.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.models import bert as bert_mod
from multimodal_transformer_robustness_tpu.ops.bert_attn_pallas import (
    default_units_per_block, dense_attention_blockdiag)


def _xla_attention(q, k, v, key_mask):
    """models/bert.bert_apply's einsum/softmax path, verbatim semantics."""
    B, L, H, dh = q.shape
    bias = (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
              / math.sqrt(dh) + bias)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, H * dh)


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.normal(size=shape), dtype)


@pytest.mark.parametrize("B,L,H,dh,upb,dtype,tol", [
    (3, 5, 2, 8, 4, jnp.float32, 1e-6),    # units=6 % upb=4 -> padded units
    (2, 32, 4, 16, None, jnp.float32, 1e-6),
    (4, 7, 3, 8, 1, jnp.float32, 1e-6),    # upb=1 edge (no packing)
    (2, 16, 2, 8, 8, jnp.bfloat16, 0.03),
])
def test_kernel_matches_xla_composition(B, L, H, dh, upb, dtype, tol):
    rng = np.random.default_rng(0)
    q = _rand(rng, (B, L, H, dh), dtype)
    k = _rand(rng, (B, L, H, dh), dtype)
    v = _rand(rng, (B, L, H, dh), dtype)
    # ragged key-padding mask, including one fully-padded sample (the
    # zero-fill missing-text eval produces those)
    mask = np.ones((B, L), np.int32)
    for i in range(B):
        mask[i, rng.integers(1, L + 1):] = 0
    mask[0, :] = 0
    mask = jnp.asarray(mask)
    ref = _xla_attention(q, k, v, mask).astype(jnp.float32)
    out = dense_attention_blockdiag(q, k, v, mask, units_per_block=upb,
                                    interpret=True).astype(jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=tol, rtol=tol)


def test_default_units_per_block_alignment():
    for L in (1, 7, 16, 32, 50, 128):
        upb = default_units_per_block(L)
        assert (upb * L) % 8 == 0 or L < 8  # sublane-aligned blocks
        assert upb >= 1
    assert default_units_per_block(32) == 16     # 512-row blocks at prod L
    assert default_units_per_block(50) == 12     # rounded up from 10 for %8


def test_bert_apply_dense_attn_equals_xla(monkeypatch):
    """Full bert_apply with ATTN_IMPL='dense' (interpret mode) == the XLA
    attention path, through embeddings, both fused epilogues off (so the
    delta isolates the attention swap)."""
    cfg = bert_mod.tiny_bert_config(hidden=32, layers=2, heads=4)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, L = 5, 9
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.int32))
    types = jnp.zeros((B, L), jnp.int32)
    ref = bert_mod.bert_apply(params, ids, mask, types, cfg)
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "dense")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    monkeypatch.setattr(bert_mod, "FFN_IMPL", "xla")
    out = bert_mod.bert_apply(params, ids, mask, types, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _xla_attention_block(x, key_mask, wq, qb, wk, kb, wv, vb, wo, ob,
                         ln_g, ln_b, n_heads, eps):
    """bert_apply's unfused attention block: q/k/v proj -> einsum attention
    -> o-proj -> residual -> LN1."""
    B, L, h = x.shape
    dh = h // n_heads

    def proj(w, bb):
        return (x @ w.T + bb).reshape(B, L, n_heads, dh)

    q, k, v = proj(wq, qb), proj(wk, kb), proj(wv, vb)
    attn = _xla_attention(q, k, v, key_mask)
    from multimodal_transformer_robustness_tpu.models.bert import _ln
    return _ln(x + (attn @ wo.T + ob), ln_g, ln_b, eps)


@pytest.mark.parametrize("B,L,heads,h,bi,dtype,tol", [
    (5, 6, 2, 16, 2, jnp.float32, 1e-5),     # B % bi != 0 -> padded items
    (4, 8, 4, 32, None, jnp.float32, 1e-5),
    (3, 4, 2, 16, 8, jnp.bfloat16, 0.05),    # bi > B
    # real-MOSEI token cap: L=50 -> default bi=4 -> R=200 row blocks (a
    # multiple of 8 but NOT of the bf16 16-row tile; Mosaic pads).  On-chip
    # parity verified 2026-08-18 at B in {37, 256}, bf16 rel 5.3e-3 /
    # f32 4.2e-5 — this cell guards the same logic in interpret mode.
    (7, 50, 4, 32, None, jnp.float32, 1e-5),
    # L that leaves R % 16 != 0 even after the sublane round-up (R=136),
    # odd B; on-chip 2026-08-18: bf16 rel 6.7e-3 / f32 4.2e-5
    (9, 17, 2, 16, 8, jnp.float32, 1e-5),
])
def test_fused_block_matches_xla(B, L, heads, h, bi, dtype, tol):
    from multimodal_transformer_robustness_tpu.ops.bert_attn_pallas import (
        attention_block_fused)
    rng = np.random.default_rng(3)
    x = _rand(rng, (B, L, h), dtype)
    ws = [jnp.asarray(rng.normal(size=(h, h)) * 0.1, dtype) for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(h,)) * 0.05, dtype) for _ in range(4)]
    ln_g = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    mask = np.ones((B, L), np.int32)
    for i in range(B):
        mask[i, rng.integers(1, L + 1):] = 0
    mask = jnp.asarray(mask)
    eps = 1e-12
    ref = _xla_attention_block(x, mask, ws[0], bs[0], ws[1], bs[1], ws[2],
                               bs[2], ws[3], bs[3], ln_g, ln_b, heads,
                               eps).astype(jnp.float32)
    out = attention_block_fused(x, mask, ws[0], bs[0], ws[1], bs[1], ws[2],
                                bs[2], ws[3], bs[3], ln_g, ln_b,
                                n_heads=heads, eps=eps, block_items=bi,
                                interpret=True).astype(jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=tol, rtol=tol)


def test_bert_apply_fused_attn_equals_xla(monkeypatch):
    """Full bert_apply with ATTN_IMPL='fused' (interpret mode) == the XLA
    path end to end."""
    cfg = bert_mod.tiny_bert_config(hidden=32, layers=2, heads=4)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    B, L = 5, 9
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.int32))
    types = jnp.zeros((B, L), jnp.int32)
    ref = bert_mod.bert_apply(params, ids, mask, types, cfg)
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "fused")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    monkeypatch.setattr(bert_mod, "FFN_IMPL", "xla")
    out = bert_mod.bert_apply(params, ids, mask, types, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bert_apply_auto_gate(monkeypatch):
    """'auto' resolves to dense only under the shape gate (interpret mode
    stands in for TPU here)."""
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "auto")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", True)
    # production shape -> the stage-2 fused block kernel
    assert bert_mod._attn_resolved_impl(32, 64, h=768) == "fused"
    # very wide model -> per-layer weights exceed VMEM -> dense kernel
    assert bert_mod._attn_resolved_impl(32, 128, h=2048) == "dense"
    assert bert_mod._attn_resolved_impl(256, 64, h=768) == "xla"  # long text
    assert bert_mod._attn_resolved_impl(32, 63, h=756) == "xla"   # odd dh
    # --bert_int8 layers keep the XLA einsums (dense measured a loss there)
    assert bert_mod._attn_resolved_impl(32, 64, h=768,
                                        quantized=True) == "xla"
    # odd L in (64, 128]: the sublane round-up would inflate the default
    # block to R = 8*L > 1000 rows (past the measured VMEM-safe geometry)
    # — the gate must keep such shapes on XLA instead of failing to compile
    assert bert_mod._attn_resolved_impl(127, 64, h=768) == "xla"
    assert bert_mod._attn_resolved_impl(127, 64, h=2048) == "xla"
    # an explicit small block override re-admits the same L
    monkeypatch.setattr(bert_mod, "ATTN_BLOCK_ITEMS", 2)
    assert bert_mod._attn_resolved_impl(127, 64, h=768) == "fused"
    monkeypatch.setattr(bert_mod, "ATTN_BLOCK_ITEMS", None)
    # forced 'fused' on an int8-quantized layer falls back (the fused
    # kernel has no int8 dot path; dict weights would fail at trace time)
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "fused")
    assert bert_mod._attn_resolved_impl(32, 64, h=768,
                                        quantized=True) == "xla"
    assert bert_mod._attn_resolved_impl(32, 64, h=768) == "fused"
    monkeypatch.setattr(bert_mod, "ATTN_IMPL", "auto")
    monkeypatch.setattr(bert_mod, "FFN_INTERPRET", False)
    # CPU backend: auto stays on XLA
    assert bert_mod._attn_resolved_impl(32, 64) == "xla"
