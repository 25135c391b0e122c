"""In-process A/B of frozen-BERT layer formulations.

The axon tunnel drifts ~10% on the hour, so sequential whole-bench
comparisons cannot resolve layer-level effects; this times each variant
back-to-back in ONE process with the data-dependent-loop protocol
(BENCH_NOTES "Timing protocol").  Forward-only, like the train step's
frozen BERT block.

Run: python benchmarks/bert_variants_bench.py [--batch 1024] [--iters 30]
"""

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from multimodal_transformer_robustness_tpu import utils
from multimodal_transformer_robustness_tpu.models import bert as bert_mod


def make_apply(variant: str, cfg):
    """bert_apply clone with the attention block in one of three layouts."""
    n_heads, eps = cfg.num_heads, cfg.eps
    _ln = bert_mod._ln

    def apply(params, input_ids, attention_mask, token_type_ids):
        b, L = input_ids.shape
        h = params["word_emb"].shape[1]
        dh = h // n_heads
        x = (params["word_emb"][input_ids]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][token_type_ids])
        x = _ln(x, params["emb_ln_g"], params["emb_ln_b"], eps)
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0

        def layer(x, lp):
            if variant == "transpose":  # pre-r3 layout: bhqd via transposes
                def proj(w, bb):
                    y = x @ w.T + bb
                    return y.reshape(b, L, n_heads, dh).transpose(0, 2, 1, 3)
                q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
                logits = (jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                     preferred_element_type=jnp.float32)
                          / math.sqrt(dh) + bias)
                w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
                attn = jnp.einsum("bhqk,bhkd->bhqd", w_, v)
                attn = attn.transpose(0, 2, 1, 3).reshape(b, L, h)
                o = attn @ lp["o_w"].T + lp["o_b"]
            else:
                def proj(w, bb):
                    return (x @ w.T + bb).reshape(b, L, n_heads, dh)
                q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
                logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                     preferred_element_type=jnp.float32)
                          / math.sqrt(dh) + bias)
                w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
                attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v)
                if variant == "bqhd_reshape":  # merge-reshape + dense o-proj
                    o = attn.reshape(b, L, h) @ lp["o_w"].T + lp["o_b"]
                else:  # "bqhd_fusedo": contraction absorbs the merge
                    o = jnp.einsum("bqhd,ehd->bqe", attn,
                                   lp["o_w"].reshape(h, n_heads, dh)) + lp["o_b"]
            x2 = _ln(x + o, lp["ln1_g"], lp["ln1_b"], eps)
            ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"], approximate=False)
            return _ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                       lp["ln2_g"], lp["ln2_b"], eps), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return x

    return apply


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--seq", type=int, default=50)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    utils.enable_compilation_cache()
    cfg = bert_mod.BertConfig(num_layers=args.layers)
    params = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    ids = jnp.zeros((args.batch, args.seq), jnp.int32)
    mask = jnp.ones((args.batch, args.seq), jnp.int32)
    types = jnp.zeros((args.batch, args.seq), jnp.int32)

    params_f32 = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)

    def depyce(x):
        # runtime-zero carry that is NOT foldable — `max(out) * 0` would let
        # XLA dead-code-eliminate the whole forward
        return (jnp.max(x).astype(jnp.float32)
                * jnp.float32(1e-30)).astype(jnp.int32)

    variants = ["transpose", "bqhd_reshape", "bqhd_fusedo", "prod_castin",
                "prod_x2", "dots_only", "unrolled", "bf16_softmax",
                "gelu_tanh", "fused_qkv", "pallas_ffn", "pallas_ffn_r256",
                "prod_int8", "pallas_ffn_int8"]
    fns = {}
    for v in variants[:3]:
        # thread a scalar through ids so iterations have a data dependency
        def step(carry, params, v=v):
            out = make_apply(v, cfg)(params, ids + carry, mask, types)
            return depyce(out)
        fns[v] = jax.jit(step)

    def prod_castin(carry, params):
        """production semantics: f32 frozen params, bf16 boundary cast
        inside the jitted step (mult.py supernet_apply)"""
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a, params)
        return depyce(bert_mod.bert_apply(p16, ids + carry, mask, types, cfg))

    def prod_x2(carry, params):
        """two chained applies in ONE dispatch — if per-dispatch overhead
        inflates the others, this shows < 2x their time"""
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a, params)
        o1 = bert_mod.bert_apply(p16, ids + carry, mask, types, cfg)
        o2 = bert_mod.bert_apply(p16, ids + depyce(o1), mask, types, cfg)
        return depyce(o2)

    fns["prod_castin"] = jax.jit(prod_castin)
    fns["prod_x2"] = jax.jit(prod_x2)

    def dots_only(carry, params):
        """matmuls only — no LN / softmax / bias / residual elementwise.
        NOT numerically meaningful; the lower bound on layer time if every
        non-dot op were fused to zero (sizes an eventual fused-layer
        kernel's payoff)."""
        b, L = ids.shape
        h = params["word_emb"].shape[1]
        n_heads = cfg.num_heads
        dh = h // n_heads
        x = params["word_emb"][ids + carry]

        def layer(x, lp):
            def proj(w):
                return (x @ w.T).reshape(b, L, n_heads, dh)
            q, k, v = proj(lp["q_w"]), proj(lp["k_w"]), proj(lp["v_w"])
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            attn = jnp.einsum("bhqk,bkhd->bqhd", logits.astype(v.dtype), v
                              ).reshape(b, L, h)
            x = x + attn @ lp["o_w"].T
            return x + (x @ lp["fc1_w"].T) @ lp["fc2_w"].T, None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return depyce(x)

    fns["dots_only"] = jax.jit(dots_only)

    def unrolled(carry, params):
        """prod semantics but a python loop over layers instead of lax.scan:
        weights become separate HLO constants (no dynamic-slice per layer)
        and XLA may fuse/pipeline across layer boundaries."""
        b, L = ids.shape
        h = params["word_emb"].shape[1]
        dh = h // cfg.num_heads
        iids = ids + carry
        x = (params["word_emb"][iids]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][types])
        x = bert_mod._ln(x, params["emb_ln_g"], params["emb_ln_b"], cfg.eps)
        bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -10000.0
        n_layers = params["layers"]["q_w"].shape[0]
        for i in range(n_layers):
            lp = {k: a[i] for k, a in params["layers"].items()}

            def proj(w, bb):
                return (x @ w.T + bb).reshape(b, L, cfg.num_heads, dh)
            q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
                      / math.sqrt(dh) + bias)
            w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v).reshape(b, L, h)
            o = attn @ lp["o_w"].T + lp["o_b"]
            x2 = bert_mod._ln(x + o, lp["ln1_g"], lp["ln1_b"], cfg.eps)
            ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"],
                             approximate=False)
            x = bert_mod._ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                             lp["ln2_g"], lp["ln2_b"], cfg.eps)
        return depyce(x)

    fns["unrolled"] = jax.jit(unrolled)

    def bf16_softmax(carry, params):
        """bqhd layout but logits/softmax stay bf16 — prices the f32
        softmax policy (NOT proposed for production; fidelity data only)."""
        b, L = ids.shape
        h = params["word_emb"].shape[1]
        dh = h // cfg.num_heads
        x = (params["word_emb"][ids + carry]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][types])
        x = bert_mod._ln(x, params["emb_ln_g"], params["emb_ln_b"], cfg.eps)
        bias = ((1.0 - mask.astype(jnp.float32))[:, None, None, :]
                * -10000.0).astype(jnp.bfloat16)

        def layer(x, lp):
            def proj(w, bb):
                return (x @ w.T + bb).reshape(b, L, cfg.num_heads, dh)
            q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k)
                      / jnp.bfloat16(math.sqrt(dh)) + bias)
            w_ = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v).reshape(b, L, h)
            o = attn @ lp["o_w"].T + lp["o_b"]
            x2 = bert_mod._ln(x + o, lp["ln1_g"], lp["ln1_b"], cfg.eps)
            ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"],
                             approximate=False)
            return bert_mod._ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                                lp["ln2_g"], lp["ln2_b"], cfg.eps), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return depyce(x)

    fns["bf16_softmax"] = jax.jit(bf16_softmax)

    def gelu_tanh(carry, params):
        """bqhd layout but tanh-approximate gelu — prices the exact-erf
        gelu (100M elements/layer on the VPU).  Diagnostic only: production
        keeps erf (HF BertIntermediate default, fidelity contract)."""
        b, L = ids.shape
        h = params["word_emb"].shape[1]
        dh = h // cfg.num_heads
        x = (params["word_emb"][ids + carry]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][types])
        x = bert_mod._ln(x, params["emb_ln_g"], params["emb_ln_b"], cfg.eps)
        bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -10000.0

        def layer(x, lp):
            def proj(w, bb):
                return (x @ w.T + bb).reshape(b, L, cfg.num_heads, dh)
            q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
                      / math.sqrt(dh) + bias)
            w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v).reshape(b, L, h)
            o = attn @ lp["o_w"].T + lp["o_b"]
            x2 = bert_mod._ln(x + o, lp["ln1_g"], lp["ln1_b"], cfg.eps)
            ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"],
                             approximate=True)
            return bert_mod._ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                                lp["ln2_g"], lp["ln2_b"], cfg.eps), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return depyce(x)

    fns["gelu_tanh"] = jax.jit(gelu_tanh)

    def fused_qkv(carry, params):
        """q/k/v as ONE [768 -> 3*768] dot (concat along the output dim is
        exact — output columns of a dot are independent).  The concat of the
        frozen weights happens in-step (copies ~3.5 MB/layer, negligible) so
        the stored param structure / checkpoint names are untouched."""
        b, L = ids.shape
        h = params["word_emb"].shape[1]
        dh = h // cfg.num_heads
        x = (params["word_emb"][ids + carry]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][types])
        x = bert_mod._ln(x, params["emb_ln_g"], params["emb_ln_b"], cfg.eps)
        bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -10000.0

        def layer(x, lp):
            qkv_w = jnp.concatenate([lp["q_w"], lp["k_w"], lp["v_w"]], axis=0)
            qkv_b = jnp.concatenate([lp["q_b"], lp["k_b"], lp["v_b"]])
            qkv = (x @ qkv_w.T + qkv_b).reshape(b, L, 3, cfg.num_heads, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
                      / math.sqrt(dh) + bias)
            w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v).reshape(b, L, h)
            o = attn @ lp["o_w"].T + lp["o_b"]
            x2 = bert_mod._ln(x + o, lp["ln1_g"], lp["ln1_b"], cfg.eps)
            ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"],
                             approximate=False)
            return bert_mod._ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                                lp["ln2_g"], lp["ln2_b"], cfg.eps), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return depyce(x)

    fns["fused_qkv"] = jax.jit(fused_qkv)

    def pallas_ffn(carry, params):
        """the production bert_apply with the fused Pallas FFN kernel
        (ops/bert_ffn_pallas.py) — measures the kernel candidate end to end."""
        old = bert_mod.FFN_IMPL
        bert_mod.FFN_IMPL = "pallas"
        try:
            out = bert_mod.bert_apply(params, ids + carry, mask, types, cfg)
        finally:
            bert_mod.FFN_IMPL = old
        return depyce(out)

    fns["pallas_ffn"] = jax.jit(pallas_ffn)

    def pallas_ffn_r256(carry, params):
        """pallas_ffn with 256-row kernel blocks (VMEM-pressure probe)"""
        old_impl, old_rows = bert_mod.FFN_IMPL, bert_mod.FFN_BLOCK_ROWS
        bert_mod.FFN_IMPL, bert_mod.FFN_BLOCK_ROWS = "pallas", 256
        try:
            out = bert_mod.bert_apply(params, ids + carry, mask, types, cfg)
        finally:
            bert_mod.FFN_IMPL, bert_mod.FFN_BLOCK_ROWS = old_impl, old_rows
        return depyce(out)

    fns["pallas_ffn_r256"] = jax.jit(pallas_ffn_r256)

    params_q = bert_mod.quantize_bert_params(params_f32)

    def prod_int8(carry, params):
        """the production --bert_int8 XLA path (quantized weights, dynamic
        per-token int8 activations) — in-process baseline for the int8
        kernel variant"""
        return depyce(bert_mod.bert_apply(params, ids + carry, mask, types,
                                          cfg))

    def pallas_ffn_int8(carry, params):
        """--bert_int8 with the fused int8 FFN kernel (ffn_ln_block_q)"""
        old = bert_mod.FFN_IMPL
        bert_mod.FFN_IMPL = "pallas"
        try:
            out = bert_mod.bert_apply(params, ids + carry, mask, types, cfg)
        finally:
            bert_mod.FFN_IMPL = old
        return depyce(out)

    fns["prod_int8"] = jax.jit(prod_int8)
    fns["pallas_ffn_int8"] = jax.jit(pallas_ffn_int8)
    inp = {v: params for v in variants[:3]}
    inp["prod_castin"] = params_f32
    inp["prod_x2"] = params_f32
    inp["dots_only"] = params
    inp["unrolled"] = params
    inp["bf16_softmax"] = params
    inp["gelu_tanh"] = params
    inp["fused_qkv"] = params
    inp["pallas_ffn"] = params
    inp["pallas_ffn_r256"] = params
    inp["prod_int8"] = params_q
    inp["pallas_ffn_int8"] = params_q
    for v in variants:
        fns[v](jnp.int32(0), inp[v]).block_until_ready()  # compile

    results = {v: [] for v in variants}
    for _ in range(args.rounds):
        for v in variants:  # interleave rounds so drift hits all equally
            c = jnp.int32(0)
            fns[v](c, inp[v]).block_until_ready()  # warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = fns[v](c, inp[v])
            c.block_until_ready()
            results[v].append((time.perf_counter() - t0) / args.iters * 1e3)

    for v in variants:
        ms = sorted(results[v])[len(results[v]) // 2]
        print(f"{v:>14}: median {ms:7.2f} ms  (rounds: "
              + ", ".join(f"{m:.2f}" for m in results[v]) + ")")


if __name__ == "__main__":
    main()
