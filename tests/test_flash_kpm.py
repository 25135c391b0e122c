"""flash_attention_masked (ops/attention_pallas.py): the forward-only
key-padding-mask kernel that can serve the frozen BERT's attention
(HF additive ``(1-mask)*-10000`` semantics, models/bert.py:199-200).

Oracle = the additive-bias XLA path in f32.  Equivalence cases proved:
variable per-sample lengths, non-contiguous masks, the ALL-zero mask row
(softmax shift invariance), Tk not a multiple of the key block, and bf16
inputs.  Interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_transformer_robustness_tpu.ops.attention_pallas import (
    flash_attention_masked)


def _oracle(q, k, v, key_mask):
    """softmax(q @ k.T + (1 - mask) * -10000) @ v, statistics in f32 —
    the XLA path this kernel replaces (models/bert.py bert_apply)."""
    bias = (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) + bias
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


@pytest.mark.parametrize("b,h,t,d", [(2, 3, 32, 64), (1, 2, 48, 16)])
def test_variable_lengths_match_additive_bias(b, h, t, d):
    rng = np.random.default_rng(0)
    q, k, v = (_rand(rng, (b, h, t, d)) for _ in range(3))
    lengths = rng.integers(1, t + 1, size=(b,))
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None], jnp.int32)
    got = flash_attention_masked(q, k, v, mask, interpret=True)
    want = _oracle(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_non_contiguous_mask():
    rng = np.random.default_rng(1)
    b, h, t, d = 2, 2, 32, 32
    q, k, v = (_rand(rng, (b, h, t, d)) for _ in range(3))
    mask = jnp.asarray(rng.integers(0, 2, size=(b, t)), jnp.int32)
    mask = mask.at[:, 0].set(1)  # keep at least one key
    got = flash_attention_masked(q, k, v, mask, interpret=True)
    want = _oracle(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_all_zero_mask_row_equals_unmasked_softmax():
    """A fully-masked sample gets a uniform -10000 shift in the additive
    path, which softmax cancels — the kernel rewrites it to all-ones.
    The additive oracle pays one extra f32 rounding of ``logit - 10000``,
    so the comparison is to ~1e-4 (the kernel is the more precise one);
    exactness to the UNSHIFTED softmax is strict."""
    rng = np.random.default_rng(2)
    b, h, t, d = 3, 2, 32, 64
    q, k, v = (_rand(rng, (b, h, t, d)) for _ in range(3))
    mask = jnp.ones((b, t), jnp.int32).at[1].set(0)  # sample 1 all-masked
    got = flash_attention_masked(q, k, v, mask, interpret=True)
    # strict: all-masked row == softmax with NO bias at all
    want_unshifted = _oracle(q, k, v, jnp.ones((b, t), jnp.int32))
    np.testing.assert_allclose(np.asarray(got[1]),
                               np.asarray(want_unshifted[1]),
                               atol=1e-5, rtol=1e-5)
    # tolerance: matches the additive path's extra rounding
    want_additive = _oracle(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got[1]),
                               np.asarray(want_additive[1]),
                               atol=5e-4, rtol=5e-4)
    # unmasked samples stay strict
    np.testing.assert_allclose(np.asarray(got[0]),
                               np.asarray(want_additive[0]),
                               atol=1e-5, rtol=1e-5)


def test_bf16_inputs():
    rng = np.random.default_rng(3)
    b, h, t, d = 2, 2, 32, 64
    q, k, v = (_rand(rng, (b, h, t, d), jnp.bfloat16) for _ in range(3))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[20], [32]]),
                       jnp.int32)
    got = flash_attention_masked(q, k, v, mask, interpret=True)
    want = _oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32), mask)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.03, rtol=0.03)


def test_tk_not_block_multiple():
    """Tk=40 rounds up to the 128 key block: the pad columns must not leak
    into the softmax."""
    rng = np.random.default_rng(4)
    b, h, t, d = 2, 2, 40, 32
    q, k, v = (_rand(rng, (b, h, t, d)) for _ in range(3))
    mask = jnp.ones((b, t), jnp.int32)
    got = flash_attention_masked(q, k, v, mask, interpret=True)
    want = _oracle(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_matches_bert_attention_math():
    """The kernel == the BERT additive-bias attention formulation at BERT
    head geometry, variable wordpiece lengths + one all-zero mask row (the
    zero-filled missing-text case).  (The kernel was RETIRED from the
    bert_apply dispatch — measured loss at every shape incl. T=512-4096,
    benchmarks/kpm_regime_bench.py — and lives on as a library op; this
    keeps its mask semantics pinned to the HF contract it implements.)"""
    rng = np.random.default_rng(5)
    b, h, t, d = 3, 4, 32, 16
    q, k, v = (_rand(rng, (b, h, t, d)) for _ in range(3))
    lengths = np.array([t, 11, 0])  # full, partial, all-masked
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None], jnp.int32)

    got = flash_attention_masked(q, k, v, mask, interpret=True)
    want = _oracle(q, k, v, mask)
    # rows 0-1: strict (formulation noise only); row 2 (all-masked) adds
    # the additive path's -10000 rounding => ~1e-4 relative
    np.testing.assert_allclose(np.asarray(got[:2]), np.asarray(want[:2]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               atol=2e-3, rtol=2e-3)
