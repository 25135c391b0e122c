"""int8-quantized frozen BERT (models/bert.quantize_bert_params + _qproj).

An ADDITIVE TPU-native capability (no reference counterpart — the reference
runs its frozen BERT in f32 under torch.no_grad, dynamic_models2.py:42-55):
per-out-channel int8 weights + dynamic per-token int8 activations for the
six projection/FFN matmuls, f32 dequant epilogue.  These tests bound the
feature error vs the float oracle and prove the full supernet path runs on
quantized frozen params.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_transformer_robustness_tpu.models import bert as bert_mod
from multimodal_transformer_robustness_tpu.models.bert import (
    quantize_bert_params, _qproj)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_qproj_matches_dense_within_quant_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((48,)), jnp.float32)
    wq = quantize_bert_params({"layers": {"q_w": w, "k_w": w, "v_w": w,
                                          "o_w": w, "fc1_w": w, "fc2_w": w}}
                              )["layers"]["q_w"]
    assert wq["q"].dtype == jnp.int8 and wq["s"].dtype == jnp.float32
    got = _qproj(x, wq, b)
    want = x @ w.T + b
    assert _cosine(got, want) > 0.9995
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
    assert rel < 0.02, rel


def test_quantized_bert_features_track_f32_oracle():
    cfg = bert_mod.BertConfig(vocab_size=128, hidden_size=64, num_layers=2,
                              num_heads=4, intermediate_size=256,
                              max_position=32)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    qparams = quantize_bert_params(params)
    # stacked quantized layout: [L, out, in] int8 + [L, out] f32
    assert qparams["layers"]["fc1_w"]["q"].shape == (2, 256, 64)
    assert qparams["layers"]["fc1_w"]["s"].shape == (2, 256)

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, (4, 16)), jnp.int32)
    mask = jnp.asarray((rng.random((4, 16)) > 0.2).astype(np.float32))
    types = jnp.zeros((4, 16), jnp.int32)

    ref = bert_mod.bert_apply(params, ids, mask, types, cfg)
    got = bert_mod.bert_apply(qparams, ids, mask, types, cfg)
    assert np.isfinite(np.asarray(got)).all()
    # per-token feature cosine: quantization noise, not structure change
    ref2 = np.asarray(ref, np.float64).reshape(-1, 64)
    got2 = np.asarray(got, np.float64).reshape(-1, 64)
    cos = np.sum(ref2 * got2, -1) / (
        np.linalg.norm(ref2, axis=-1) * np.linalg.norm(got2, axis=-1) + 1e-30)
    assert cos.min() > 0.98, cos.min()
    assert _cosine(got, ref) > 0.995


def test_ffn_only_quantization():
    """attn=False (the production --bert_int8 composition) quantizes only
    fc1/fc2, leaves the attention projections float, and tracks the f32
    oracle at least as tightly as full quantization."""
    cfg = bert_mod.BertConfig(vocab_size=128, hidden_size=64, num_layers=2,
                              num_heads=4, intermediate_size=256,
                              max_position=32)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    qf = quantize_bert_params(params, attn=False)
    assert isinstance(qf["layers"]["fc1_w"], dict)
    assert isinstance(qf["layers"]["fc2_w"], dict)
    for name in ("q_w", "k_w", "v_w", "o_w"):
        assert not isinstance(qf["layers"][name], dict)

    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 128, (4, 16)), jnp.int32)
    mask = jnp.asarray((rng.random((4, 16)) > 0.2).astype(np.float32))
    types = jnp.zeros((4, 16), jnp.int32)
    ref = bert_mod.bert_apply(params, ids, mask, types, cfg)
    got_ffn = bert_mod.bert_apply(qf, ids, mask, types, cfg)
    got_full = bert_mod.bert_apply(quantize_bert_params(params), ids, mask,
                                   types, cfg)
    assert np.isfinite(np.asarray(got_ffn)).all()
    assert _cosine(got_ffn, ref) >= _cosine(got_full, ref) - 1e-6
    assert _cosine(got_ffn, ref) > 0.997


def test_supernet_runs_on_quantized_frozen():
    """End-to-end: text header consumes int8 frozen BERT inside the jitted
    supernet forward; output tracks the unquantized forward."""
    import functools

    from multimodal_transformer_robustness_tpu import (
        ModelSpec, build_masks, full_active_config)
    from multimodal_transformer_robustness_tpu.models import (
        init_supernet, supernet_apply)

    spec = ModelSpec(modality_set=("t", "a"), orig_dimensions=(3, 10),
                     dimension=8, num_heads=2, head_dim=4,
                     layers_single_attn=1, layers_cross_attn=1,
                     layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0),
                     relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
                     embed_dropout=0.0, attn_mask=True, output_dim=1)
    bert_cfg = bert_mod.tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)
    qfrozen = dict(frozen, bert=quantize_bert_params(frozen["bert"]))

    rng = np.random.default_rng(2)
    text = jnp.asarray(np.stack([rng.integers(0, 64, (4, 8)),
                                 np.ones((4, 8), np.int64),
                                 np.zeros((4, 8), np.int64)]))
    audio = jnp.asarray(rng.standard_normal((4, 6, 10)), jnp.float32)
    masks = build_masks(spec, full_active_config(spec))
    fwd = jax.jit(functools.partial(supernet_apply, spec),
                  static_argnames=("train", "bert_cfg"))
    ref = fwd(params, masks, [text, audio], frozen=frozen, bert_cfg=bert_cfg)
    got = fwd(params, masks, [text, audio], frozen=qfrozen, bert_cfg=bert_cfg)
    assert np.isfinite(np.asarray(got)).all()
    assert _cosine(got, ref) > 0.98, _cosine(got, ref)


def test_training_curve_tracks_f32_frozen():
    """A short SGD run with the int8 frozen extractor stays close to the
    f32-frozen run: quantization perturbs the (frozen) features slightly but
    must not change the optimization behavior."""
    import functools
    import optax

    from multimodal_transformer_robustness_tpu import (
        ModelSpec, build_masks, full_active_config)
    from multimodal_transformer_robustness_tpu.models import (
        init_supernet, supernet_apply)

    spec = ModelSpec(modality_set=("t", "a"), orig_dimensions=(3, 10),
                     dimension=8, num_heads=2, head_dim=4,
                     layers_single_attn=1, layers_cross_attn=1,
                     layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0),
                     relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
                     embed_dropout=0.0, attn_mask=True, output_dim=1)
    bert_cfg = bert_mod.tiny_bert_config()
    params0, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                    bert_cfg=bert_cfg)
    qfrozen = dict(frozen, bert=quantize_bert_params(frozen["bert"]))

    rng = np.random.default_rng(3)
    text = jnp.asarray(np.stack([rng.integers(0, 64, (8, 8)),
                                 np.ones((8, 8), np.int64),
                                 np.zeros((8, 8), np.int64)]))
    audio = jnp.asarray(rng.standard_normal((8, 6, 10)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((8, 1)), jnp.float32)
    masks = build_masks(spec, full_active_config(spec))
    tx = optax.sgd(1e-2)

    @functools.partial(jax.jit, static_argnames=("bert_cfg",))
    def step(params, opt_state, frozen, bert_cfg):
        def loss_fn(p):
            preds = supernet_apply(spec, p, masks, [text, audio],
                                   frozen=frozen, bert_cfg=bert_cfg)
            return jnp.mean(jnp.abs(preds - labels))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(fr):
        params, opt_state = params0, tx.init(params0)
        losses = []
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, fr, bert_cfg)
            losses.append(float(loss))
        return np.asarray(losses)

    ref = run(frozen)
    got = run(qfrozen)
    assert np.all(np.isfinite(got))
    # same trajectory shape: monotone agreement within a small absolute band
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.1)
