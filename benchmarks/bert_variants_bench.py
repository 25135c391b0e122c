"""In-process A/B of frozen-BERT layer formulations.

The axon tunnel drifts ~10% on the hour, so sequential whole-bench
comparisons cannot resolve layer-level effects; this times each variant
back-to-back in ONE process with the data-dependent-loop protocol
(BENCH_NOTES "Timing protocol").  Forward-only, like the train step's
frozen BERT block.

Regime discipline: every decision cell (prod_castin / prod_int8 /
pallas_ffn* / pallas_ffn_int8) receives f32-leaved frozen params and pays
the production in-step bf16 boundary cast (mult.py supernet_apply), so
A/B deltas measure the formulation, not a missing cast.  The layout /
attribution cells (transpose .. fused_qkv) share one pre-cast bf16 param
tree — they are compared only against each other.

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


def _cast16(tree):
    """The production bf16 boundary cast (mult.py supernet_apply): every
    f32 leaf -> bf16; int8 'q' tensors pass through."""
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, tree)


def make_apply(cfg, *, layout="bqhd", softmax_f32=True, gelu_exact=True,
               unroll=False, fuse_qkv=False):
    """bert_apply clone parameterized by one knob per variant:

    layout      "transpose" (pre-r3 bhqd via transposes) | "bqhd" |
                "fusedo" (o-proj contraction absorbs the head merge)
    softmax_f32 False = logits/softmax stay bf16 (prices the f32 policy)
    gelu_exact  False = tanh-approx gelu (prices the exact erf)
    unroll      True = python loop over layers instead of lax.scan
    fuse_qkv    True = q/k/v as ONE [h -> 3h] dot (exact: output columns
                of a dot are independent)
    """
    n_heads, eps = cfg.num_heads, cfg.eps
    _ln = bert_mod._ln

    def layer_fn(x, lp, bias, b, L, h, dh):
        if fuse_qkv:
            qkv_w = jnp.concatenate([lp["q_w"], lp["k_w"], lp["v_w"]], axis=0)
            qkv_b = jnp.concatenate([lp["q_b"], lp["k_b"], lp["v_b"]])
            qkv = (x @ qkv_w.T + qkv_b).reshape(b, L, 3, n_heads, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        elif layout == "transpose":
            def proj(w, bb):
                y = x @ w.T + bb
                return y.reshape(b, L, n_heads, dh).transpose(0, 2, 1, 3)
            q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")
        else:
            def proj(w, bb):
                return (x @ w.T + bb).reshape(b, L, n_heads, dh)
            q, k, v = (proj(lp[n + "_w"], lp[n + "_b"]) for n in "qkv")

        eq = "bhqd,bhkd->bhqk" if layout == "transpose" else "bqhd,bkhd->bhqk"
        pet = jnp.float32 if softmax_f32 else None
        logits = jnp.einsum(eq, q, k, preferred_element_type=pet)
        scale = math.sqrt(dh) if softmax_f32 else jnp.bfloat16(math.sqrt(dh))
        logits = logits / scale + bias
        w_ = jax.nn.softmax(logits, axis=-1)
        if softmax_f32:
            w_ = w_.astype(v.dtype)
        if layout == "transpose":
            attn = jnp.einsum("bhqk,bhkd->bhqd", w_, v)
            attn = attn.transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum("bhqk,bkhd->bqhd", w_, v)
        if layout == "fusedo":
            o = jnp.einsum("bqhd,ehd->bqe", attn,
                           lp["o_w"].reshape(h, n_heads, dh)) + lp["o_b"]
        else:
            o = attn.reshape(b, L, h) @ lp["o_w"].T + lp["o_b"]
        x2 = _ln(x + o, lp["ln1_g"], lp["ln1_b"], eps)
        ff = jax.nn.gelu(x2 @ lp["fc1_w"].T + lp["fc1_b"],
                         approximate=not gelu_exact)
        return _ln(x2 + (ff @ lp["fc2_w"].T + lp["fc2_b"]),
                   lp["ln2_g"], lp["ln2_b"], eps)

    def apply(params, input_ids, attention_mask, token_type_ids):
        b, L = input_ids.shape
        h = params["word_emb"].shape[1]
        dh = h // n_heads
        x = (params["word_emb"][input_ids]
             + params["pos_emb"][jnp.arange(L)][None]
             + params["type_emb"][token_type_ids])
        x = _ln(x, params["emb_ln_g"], params["emb_ln_b"], eps)
        bias = (1.0 - attention_mask.astype(jnp.float32)
                )[:, None, None, :] * -10000.0
        if not softmax_f32:
            bias = bias.astype(jnp.bfloat16)
        if unroll:
            n_layers = params["layers"]["q_w"].shape[0]
            for i in range(n_layers):
                x = layer_fn(x, {k: a[i] for k, a in params["layers"].items()},
                             bias, b, L, h, dh)
        else:
            x, _ = jax.lax.scan(
                lambda c, lp: (layer_fn(c, lp, bias, b, L, h, dh), None),
                x, params["layers"])
        return x

    return apply


VARIANT_KNOBS = {
    # layout A/B (measured identical r3 — XLA canonicalizes)
    "transpose": dict(layout="transpose"),
    "bqhd_reshape": dict(),
    "bqhd_fusedo": dict(layout="fusedo"),
    # attribution cells
    "unrolled": dict(unroll=True),
    "bf16_softmax": dict(softmax_f32=False),
    "gelu_tanh": dict(gelu_exact=False),
    "fused_qkv": dict(fuse_qkv=True),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--seq", type=int, default=50)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated cell names to run (default: all)")
    args = p.parse_args(argv)

    utils.enable_compilation_cache()
    cfg = bert_mod.BertConfig(num_layers=args.layers)
    params_f32 = bert_mod.init_bert(jax.random.PRNGKey(0), cfg)
    params = _cast16(params_f32)             # pre-cast tree (layout cells)
    params_q = bert_mod.quantize_bert_params(params_f32)
    params_qf = bert_mod.quantize_bert_params(params_f32, attn=False)
    ids = jnp.zeros((args.batch, args.seq), jnp.int32)
    mask = jnp.ones((args.batch, args.seq), jnp.int32)
    types = jnp.zeros((args.batch, args.seq), jnp.int32)

    def depyce(x):
        # runtime-zero carry that is NOT foldable — `max(out) * 0` would let
        # XLA dead-code-eliminate the whole forward
        return (jnp.max(x).astype(jnp.float32)
                * jnp.float32(1e-30)).astype(jnp.int32)

    variants = ["transpose", "bqhd_reshape", "bqhd_fusedo", "unrolled",
                "bf16_softmax", "gelu_tanh", "fused_qkv", "dots_only",
                "prod_castin", "prod_x2", "pallas_ffn", "pallas_ffn_r256",
                "prod_int8", "pallas_ffn_int8", "xla_ffn", "xla_ffn_int8",
                "flash_attn", "dense_attn", "dense_attn_u8",
                "dense_attn_u32", "dense_attn_int8", "attn_fused",
                "attn_fused_b8", "attn_fused_b4", "attn_fused_b12",
                "attn_fused_b2", "attn_fused_b1", "attn_fused_int8ffn",
                "attn_fused_sm16", "attn_xla"]
    if args.only:
        keep = [s.strip() for s in args.only.split(",")]
        unknown = set(keep) - set(variants)
        if unknown:
            raise SystemExit(f"--only: unknown cells {sorted(unknown)}")
        variants = [v for v in variants if v in keep]
    fns, inp = {}, {}

    for v, knobs in VARIANT_KNOBS.items():
        def step(carry, params, knobs=knobs):
            # thread a scalar through ids so iterations have a data dependency
            out = make_apply(cfg, **knobs)(params, ids + carry, mask, types)
            return depyce(out)
        fns[v] = jax.jit(step)
        inp[v] = params

    def dots_only(carry, params):
        """matmuls only — no LN / softmax / bias / residual elementwise.
        NOT numerically meaningful; the lower bound on layer time if every
        non-dot op were fused to zero (sizes a fused-layer kernel's
        payoff)."""
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
    inp["dots_only"] = params

    def _prod(params, carry, *, impl_attr=None, block_rows=None,
              impl_value="pallas", extra=None):
        """production semantics: f32 frozen params, bf16 boundary cast
        inside the jitted step (mult.py supernet_apply), optionally with a
        fused-kernel impl flag set for the trace.  NOTE since the
        2026-08-18 flip (FFN_IMPL defaults "auto") the plain prod cells
        resolve to the Pallas kernels on TPU — the `xla_ffn*` cells force
        the pre-flip XLA formulation for regression baselines.  ``extra``:
        {module attr: value} overrides for the trace (the dense-attn
        cells)."""
        olds = (bert_mod.FFN_IMPL, bert_mod.FFN_IMPL_INT8,
                bert_mod.FFN_BLOCK_ROWS)
        extra = extra or {}
        extra_olds = {a: getattr(bert_mod, a) for a in extra}
        if impl_attr:
            setattr(bert_mod, impl_attr, impl_value)
        if block_rows:
            bert_mod.FFN_BLOCK_ROWS = block_rows
        for a, val in extra.items():
            setattr(bert_mod, a, val)
        try:
            out = bert_mod.bert_apply(_cast16(params), ids + carry, mask,
                                      types, cfg)
        finally:
            (bert_mod.FFN_IMPL, bert_mod.FFN_IMPL_INT8,
             bert_mod.FFN_BLOCK_ROWS) = olds
            for a, val in extra_olds.items():
                setattr(bert_mod, a, val)
        return depyce(out)

    fns["prod_castin"] = jax.jit(lambda c, p: _prod(p, c))
    inp["prod_castin"] = params_f32

    def prod_x2(carry, params):
        """two chained applies in ONE dispatch — if per-dispatch overhead
        inflates the others, this shows < 2x their time"""
        p16 = _cast16(params)
        o1 = bert_mod.bert_apply(p16, ids + carry, mask, types, cfg)
        o2 = bert_mod.bert_apply(p16, ids + depyce(o1), mask, types, cfg)
        return depyce(o2)

    fns["prod_x2"] = jax.jit(prod_x2)
    inp["prod_x2"] = params_f32

    fns["pallas_ffn"] = jax.jit(lambda c, p: _prod(p, c, impl_attr="FFN_IMPL"))
    inp["pallas_ffn"] = params_f32

    n_heads_g = (cfg.num_heads,)
    _ln = bert_mod._ln

    def flash_attn(carry, params):
        """Production path (cast-in + fused Pallas FFN/proj blocks) with the
        logits/softmax/attn einsum chain replaced by the flash kernel
        (ops/attention_pallas.py, causal=False, no dropout — the frozen BERT
        runs eval-mode).  Sizes the attention-segment fusion win; all-ones
        attention mask (the bench regime), so key-padding is uniform.
        NOT production-ready: the kernel has no per-sample key-length mask,
        which real tokenized batches need."""
        from multimodal_transformer_robustness_tpu.ops.attention_pallas import (
            flash_attention)
        p16 = _cast16(params)
        olds = bert_mod.FFN_IMPL
        bert_mod.FFN_IMPL = "pallas"
        try:
            b, L = ids.shape
            h = p16["word_emb"].shape[1]
            dh = h // n_heads_g[0]
            x = (p16["word_emb"][ids + carry]
                 + p16["pos_emb"][jnp.arange(L)][None]
                 + p16["type_emb"][types])
            x = _ln(x, p16["emb_ln_g"], p16["emb_ln_b"], cfg.eps)

            from multimodal_transformer_robustness_tpu.ops.bert_ffn_pallas import (
                ffn_ln_block, proj_ln_block)

            def layer(x, lp):
                def proj(w, bb):
                    y = x @ w.T + bb
                    return y.reshape(b, L, n_heads_g[0], dh
                                     ).transpose(0, 2, 1, 3)
                q = proj(lp["q_w"], lp["q_b"]) * (1.0 / math.sqrt(dh))
                k = proj(lp["k_w"], lp["k_b"])
                v = proj(lp["v_w"], lp["v_b"])
                attn = flash_attention(q.astype(v.dtype), k, v, causal=False
                                       ).transpose(0, 2, 1, 3).reshape(b, L, h)
                x = proj_ln_block(x, attn, lp["o_w"], lp["o_b"], lp["ln1_g"],
                                  lp["ln1_b"], eps=cfg.eps,
                                  block_rows=min(bert_mod.FFN_BLOCK_ROWS * 2,
                                                 512))
                x = ffn_ln_block(x, lp["fc1_w"], lp["fc1_b"], lp["fc2_w"],
                                 lp["fc2_b"], lp["ln2_g"], lp["ln2_b"],
                                 eps=cfg.eps,
                                 block_rows=bert_mod.FFN_BLOCK_ROWS)
                return x, None

            x, _ = jax.lax.scan(layer, x, p16["layers"])
        finally:
            bert_mod.FFN_IMPL = olds
        return depyce(x)

    fns["flash_attn"] = jax.jit(flash_attn)
    inp["flash_attn"] = params_f32
    fns["pallas_ffn_r256"] = jax.jit(
        lambda c, p: _prod(p, c, impl_attr="FFN_IMPL", block_rows=256))
    inp["pallas_ffn_r256"] = params_f32
    fns["prod_int8"] = jax.jit(lambda c, p: _prod(p, c))
    inp["prod_int8"] = params_q
    fns["pallas_ffn_int8"] = jax.jit(
        lambda c, p: _prod(p, c, impl_attr="FFN_IMPL_INT8"))
    inp["pallas_ffn_int8"] = params_q
    fns["xla_ffn"] = jax.jit(
        lambda c, p: _prod(p, c, impl_attr="FFN_IMPL", impl_value="xla"))
    inp["xla_ffn"] = params_f32
    fns["xla_ffn_int8"] = jax.jit(
        lambda c, p: _prod(p, c, impl_attr="FFN_IMPL_INT8",
                           impl_value="xla"))
    inp["xla_ffn_int8"] = params_q
    # dense block-diag attention cells (ops/bert_attn_pallas.py):
    # production path with the einsum/softmax chain swapped for the fused
    # kernel, at three units-per-block sizes (None = the ~512-row default)
    for cell, upb in (("dense_attn", None), ("dense_attn_u8", 8),
                      ("dense_attn_u32", 32)):
        fns[cell] = jax.jit(
            lambda c, p, upb=upb: _prod(
                p, c, extra={"ATTN_IMPL": "dense", "ATTN_UPB": upb}))
        inp[cell] = params_f32
    fns["dense_attn_int8"] = jax.jit(
        lambda c, p: _prod(p, c, extra={"ATTN_IMPL": "dense"}))
    inp["dense_attn_int8"] = params_q
    # regression baseline: pre-kernel XLA einsum attention, FFN kernels on
    fns["attn_xla"] = jax.jit(
        lambda c, p: _prod(p, c, extra={"ATTN_IMPL": "xla"}))
    inp["attn_xla"] = params_f32
    # FFN-only int8 + fused float attention: the measured-best --bert_int8
    # composition candidate (int8 attention dots lost; int8 FFN won)
    fns["attn_fused_int8ffn"] = jax.jit(
        lambda c, p: _prod(p, c, extra={"ATTN_IMPL": "auto"}))
    inp["attn_fused_int8ffn"] = params_qf
    # stage 2: whole attention block (q/k/v/o + attention + LN1) in one
    # kernel, at two item-block sizes
    for cell, bi in (("attn_fused", None), ("attn_fused_b8", 8),
                     ("attn_fused_b4", 4), ("attn_fused_b12", 12),
                     ("attn_fused_b2", 2), ("attn_fused_b1", 1)):
        fns[cell] = jax.jit(
            lambda c, p, bi=bi: _prod(
                p, c, extra={"ATTN_IMPL": "fused", "ATTN_BLOCK_ITEMS": bi}))
        inp[cell] = params_f32
    # policy-gated bf16-softmax inside the fused kernel (VERDICT r3 #8;
    # accuracy oracle tests/test_bf16_softmax.py)
    fns["attn_fused_sm16"] = jax.jit(
        lambda c, p: _prod(p, c, extra={"ATTN_IMPL": "fused",
                                        "ATTN_SOFTMAX": "bfloat16"}))
    inp["attn_fused_sm16"] = params_f32

    compiled = []
    for v in variants:
        try:
            fns[v](jnp.int32(0), inp[v]).block_until_ready()  # compile
            compiled.append(v)
        except Exception as e:  # a cell that fails to lower (first real-TPU
            # Mosaic shot) must not kill the serialized measurement batch
            print(f"{v}: COMPILE FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
    variants = compiled

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
        print(f"{v:>15}: median {ms:7.2f} ms  (rounds: "
              + ", ".join(f"{m:.2f}" for m in results[v]) + ")")


if __name__ == "__main__":
    main()
