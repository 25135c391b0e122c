"""Minimal JAX BERT encoder for the frozen text header.

The reference loads a pretrained ``BertModel`` from a hardcoded local path
(src/dynamic_models2.py:42-55) and runs it under ``torch.no_grad``.  Here the
encoder is a plain functional JAX implementation; weights can be imported
from a HuggingFace torch checkpoint directory via
:func:`load_hf_bert_params`, or randomly initialized (e.g. a tiny config for
tests, or when no checkpoint is available in an air-gapped environment).

The forward matches HF ``BertModel``'s last_hidden_state in eval mode:
embeddings (word + position + token_type, LayerNorm) -> N post-norm
transformer layers with GELU FFN -> hidden states.

Known deviation: the reference never calls ``.eval()`` on its frozen BERT,
so HF's internal dropout stays ACTIVE during the reference's training
forwards (``torch.no_grad`` stops gradients, not dropout —
dynamic_models2.py:46-55).  This port omits BERT-internal dropout entirely,
i.e. it behaves like the reference at eval time and is slightly less noisy
than the reference at train time.  Deliberate: deterministic frozen features
are the sane semantics for a frozen extractor; parity tests compare eval
forwards where the two agree exactly.
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import numpy as np


FFN_IMPL = "auto"  # "auto" | "pallas" | "xla" — float-weight FFN-block impl.
#   "auto" resolves to the fused Pallas kernel (ops/bert_ffn_pallas.py) on
#   TPU for MXU-aligned dims, "xla" elsewhere.  Flipped to "auto" on the
#   2026-08-18 on-chip A/B (benchmarks/bert_variants_bench.py, B=1024
#   L=32 4-layer frozen BERT fwd): pallas_ffn_r256 27.20 ms vs
#   prod_castin 31.49 ms (-13%); dots-only floor 17.80 ms.
FFN_IMPL_INT8 = "auto"  # same contract for --bert_int8 quantized weights
#   (ffn_ln_block_q); gated SEPARATELY so each kernel flips on its own
#   measurement.  Flipped 2026-08-18: pallas_ffn_int8 23.20 ms vs
#   prod_int8 27.36 ms (-15%) in the same in-process A/B.
ATTN_IMPL = "auto"  # "auto" | "fused" | "dense" | "xla" —
#   frozen-BERT attention impl.
#   "fused" = attention_block_fused (ops/bert_attn_pallas.py stage 2): the
#   ENTIRE BertSelfAttention+BertSelfOutput block (q/k/v/o dots + per-head
#   block-diag attention + residual + LN1) in one pallas_call, natural
#   layout (no transposes, no q/k/v HBM round-trips).  "auto" resolves to
#   it for float layers under the shape gate.  Flipped on 2026-08-18:
#   attn_fused_b4 14.52 ms vs dense 23.1 vs pre-r3 XLA 27.25 — BELOW the
#   17.8 ms XLA matmul-only floor (it replaces XLA's low-utilization
#   batched attention einsums with full-width VMEM dots).
#   "dense" = dense_attention_blockdiag (ops/bert_attn_pallas.py): packs
#   (batch, head) units into full-width MXU tiles and keeps the whole
#   logits/softmax in VMEM — built for the production SHORT-L regime
#   (L<=128) where flash loses; measured 23.17 ms vs XLA 27.25 (-15%),
#   upb 16 optimal — "auto" uses it only for very wide models (h > 1024)
#   where the fused block's weights would not fit VMEM.  The int8 combo
#   MEASURED A LOSS (dense_attn_int8 28.20 vs prod_int8 22.68), so
#   quantized layers keep the XLA einsums under "auto".
#   The former "pallas" option (flash_attention_masked) was RETIRED from
#   this dispatch 2026-08-19 (VERDICT r3 #7): it measured a loss at BERT
#   shapes (bert_variants_bench `flash_attn`, 2026-08-18: B=1024 L=32
#   52.7 ms vs 27.2 XLA) AND at its claimed long-text regime
#   (benchmarks/kpm_regime_bench.py, 2026-08-19: 0.31-0.76x vs XLA at
#   T=512-4096, both bf16 and f32, incl. T=4096 where the O(T^2) logits
#   memory argument was supposed to bite — XLA's own attention fusion
#   handles it).  The kernel remains a tested library op
#   (ops/attention_pallas.flash_attention_masked, tests/test_flash_kpm.py).
ATTN_SOFTMAX = "float32"  # "float32" | "bfloat16" — softmax exp/sum/div
#   dtype inside the fused attention kernel (the max subtraction and masks
#   stay f32).  Policy-gated cell (VERDICT r3 #8): default stays f32 — the
#   replicated reference numeric — unless the on-chip A/B shows a win AND
#   the accuracy oracle (tests/test_bf16_softmax.py) holds.  Measured
#   accept/reject record: BENCH_NOTES "bf16 softmax cell".
ATTN_UPB = None    # "dense" kernel block size: (batch, head) units per
#                    program (None = ~512 packed rows, measured optimum)
ATTN_BLOCK_ITEMS = None  # "fused" kernel block size: batch items per
#                    program (None = ~128 packed rows, measured optimum).
#                    Deliberately a SEPARATE knob from ATTN_UPB: a value
#                    tuned for one kernel means a different row count in
#                    the other (dense upb=16 ~= 512 rows at L=32; fused
#                    items=16 would be 4x its measured optimum).
# Row-block ceiling for the auto gate: 512 packed rows is the largest
# on-chip-MEASURED geometry (dense upb16 / fused b16 cells, 2026-08-18);
# beyond it the fused kernel's per-head [R, R] f32 logits + weights
# approach the ~16 MB scoped-VMEM limit.  default_units_per_block rounds
# the unit count up for sublane alignment, so odd L in (64, 128] would
# otherwise inflate to R = 8*L > 1000 rows and fail to compile.
_ATTN_MAX_ROWS = 512
FFN_INTERPRET = False  # tests: run the kernels in interpret mode on CPU
FFN_BLOCK_ROWS = 256   # kernel row-block; 128 fits VMEM with margin, 256
#                        halves grid overhead and measured 0.2 ms faster
#                        (pallas_ffn_r256 27.20 vs pallas_ffn 27.39)
SCAN_UNROLL = False  # unroll the 4-layer scan so XLA schedules across
#                      layers; the variants bench "unrolled" cell measures
#                      it — flip only on a win (costs compile time + code).


def _attn_resolved_impl(L: int, dh: int, quantized: bool = False,
                        h: int = 0) -> str:
    """Shape gate for the Pallas attention kernels: short sequences only
    (their S tiles are [R, R]) with sublane-aligned head dim, float layers
    only (--bert_int8 measured a loss under the dense kernel — see the
    ATTN_IMPL note).  "auto" prefers the stage-2 fused block kernel
    (measured 14.5 ms vs dense 23.1 vs XLA 27.2 at B=1024 L=32); very wide
    models (h > 1024: >8 MB of per-layer weights in VMEM) fall back to the
    projection-free dense kernel."""
    from ..ops.bert_attn_pallas import (default_block_items,
                                        default_units_per_block)

    if ATTN_IMPL == "auto":
        on_tpu = jax.default_backend() == "tpu" or FFN_INTERPRET
        if not (on_tpu and not quantized and L <= 128 and dh % 8 == 0):
            return "xla"
        impl = "fused" if (h and h <= 1024) else "dense"
        # sublane round-up can inflate the default row block far past the
        # measured geometry (odd L in (64, 128]: R = 8*L rows) — those
        # shapes would blow the kernels' VMEM budget, so they stay on XLA
        units = (ATTN_BLOCK_ITEMS or default_block_items(L)) if \
            impl == "fused" else (ATTN_UPB or default_units_per_block(L))
        if units * L > _ATTN_MAX_ROWS:
            return "xla"
        return impl
    if ATTN_IMPL == "fused" and quantized:
        # attention_block_fused has no int8 dot path (the int8 attention
        # combo measured a LOSS, so one was never built): a forced "fused"
        # on a quantized layer falls back rather than tracing dict weights
        return "xla"
    if ATTN_IMPL not in ("fused", "dense", "xla"):
        # reject stale values loudly — "pallas" (retired 2026-08-19) or a
        # typo would otherwise silently run the XLA else-branch and label
        # measurements with the wrong implementation
        raise ValueError(f"unknown ATTN_IMPL {ATTN_IMPL!r}; valid: "
                         "'auto' | 'fused' | 'dense' | 'xla'")
    return ATTN_IMPL


def _ffn_resolved_impl(h: int, ffn: int, quantized: bool) -> str:
    if h % 128 or ffn % 128:
        return "xla"
    impl = FFN_IMPL_INT8 if quantized else FFN_IMPL
    if impl == "auto":
        return ("pallas" if jax.default_backend() == "tpu" or FFN_INTERPRET
                else "xla")
    return impl


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    eps: float = 1e-12


def tiny_bert_config(hidden: int = 16, layers: int = 2, heads: int = 2,
                     vocab: int = 64) -> BertConfig:
    return BertConfig(vocab_size=vocab, hidden_size=hidden, num_layers=layers,
                      num_heads=heads, intermediate_size=hidden * 4,
                      max_position=64, type_vocab_size=2)


def init_bert(rng: jax.Array, cfg: BertConfig) -> dict:
    """Random init (normal(0.02), HF default) — a stand-in when no pretrained
    checkpoint directory is supplied."""
    def norm(key, shape):
        return 0.02 * jax.random.normal(key, shape, jnp.float32)

    keys = iter(jax.random.split(rng, 6 + 16 * cfg.num_layers))
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    params = {
        "word_emb": norm(next(keys), (cfg.vocab_size, h)),
        "pos_emb": norm(next(keys), (cfg.max_position, h)),
        "type_emb": norm(next(keys), (cfg.type_vocab_size, h)),
        "emb_ln_g": jnp.ones((h,)), "emb_ln_b": jnp.zeros((h,)),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "q_w": norm(next(keys), (h, h)), "q_b": jnp.zeros((h,)),
            "k_w": norm(next(keys), (h, h)), "k_b": jnp.zeros((h,)),
            "v_w": norm(next(keys), (h, h)), "v_b": jnp.zeros((h,)),
            "o_w": norm(next(keys), (h, h)), "o_b": jnp.zeros((h,)),
            "ln1_g": jnp.ones((h,)), "ln1_b": jnp.zeros((h,)),
            "fc1_w": norm(next(keys), (ffn, h)), "fc1_b": jnp.zeros((ffn,)),
            "fc2_w": norm(next(keys), (h, ffn)), "fc2_b": jnp.zeros((h,)),
            "ln2_g": jnp.ones((h,)), "ln2_b": jnp.zeros((h,)),
        })
    # stack layers for scan
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    return params


def quantize_bert_params(params: dict, attn: bool = True) -> dict:
    """Symmetric per-out-channel int8 quantization of the six projection /
    FFN weight matrices per layer (q/k/v/o/fc1/fc2).  Everything else —
    embeddings, LayerNorms, biases, the attention dots themselves — keeps
    its float dtype.

    This is an ADDITIVE TPU-native capability with no reference counterpart
    (the reference runs its frozen BERT in f32, dynamic_models2.py:42-55):
    the v5e MXU's int8 rate is 2x its bf16 rate, and the frozen BERT block
    dominates the online train step, so a quantized frozen *extractor* (the
    trunk still trains in the spec's compute dtype) trades a measured,
    bounded feature error (tests/test_bert_int8.py) for step throughput.
    Opt-in via ``--bert_int8`` (cli.main / bench.py).

    Each weight ``w [out, in]`` (stacked ``[L, out, in]``) becomes
    ``{"q": int8, "s": f32 [.., out]}`` with ``w ≈ s[..., None] * q``;
    :func:`bert_apply` dispatches on the dict structure.

    ``attn=False`` quantizes only the FFN matrices (fc1/fc2) and leaves
    q/k/v/o float — that keeps the fused attention-block kernel eligible
    (the dense/fused kernels measured a LOSS with int8 attention dots,
    see ATTN_IMPL) while the FFN still takes the int8 MXU rate: the
    measured-fastest --bert_int8 composition, and the more accurate one
    (attention error drops out of the bound in tests/test_bert_int8.py).
    """
    def qw(w):
        s = jnp.max(jnp.abs(w), axis=-1) / 127.0          # [..., out]
        s = jnp.maximum(s, 1e-12)
        q = jnp.clip(jnp.round(w / s[..., None]), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s.astype(jnp.float32)}

    names = (("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w") if attn
             else ("fc1_w", "fc2_w"))
    layers = dict(params["layers"])
    for name in names:
        layers[name] = qw(jnp.asarray(layers[name], jnp.float32))
    out = dict(params)
    out["layers"] = layers
    return out


def _qrows(x):
    """Dynamic per-row (per-token) int8 quantization of ``x [..., in]``.
    Returns (xq int8 [rows, in], sx f32 [rows, 1]).  Split from the dot so
    an activation consumed by several projections (the QKV input) is
    quantized ONCE — the round/cast pass over the activation is the main
    int8 overhead (profiled ~1.4 ms/layer at B=1024 when run per-dot)."""
    rows = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(rows / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _qdot(xq, sx, wq: dict, bias, out_shape, out_dtype):
    """int8 x int8 -> int32 MXU dot with f32 dequant epilogue."""
    acc = jax.lax.dot_general(xq, wq["q"], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    sw = wq["s"].astype(jnp.float32)
    out = acc.astype(jnp.float32) * sx * sw[None, :] + bias.astype(jnp.float32)
    return out.reshape(*out_shape, -1).astype(out_dtype)


def _qproj(x, wq: dict, bias):
    """``x @ w.T + bias`` with int8 weights and dynamic per-token int8
    activations (see _qrows/_qdot)."""
    xq, sx = _qrows(x)
    return _qdot(xq, sx, wq, bias, x.shape[:-1], x.dtype)


def _ln(x, g, b, eps):
    # f32 moments under any compute policy, CENTERED two-pass variance
    # (torch LayerNorm's formulation): the one-pass E[x^2]-mu^2 form loses
    # up to ~7 significant digits when mu^2 >> var — real pretrained BERT
    # residual streams carry large-magnitude outlier channels, exactly that
    # regime.  The centered subtraction is needed for the output anyway, so
    # this costs one extra fused read of the (bf16) activation, nothing
    # more.  Keep in sync with ops/bert_ffn_pallas._ln_epilogue (the fused
    # kernels' LN) and ops/layernorm.py (the trunk's, already centered).
    mu = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    xc = x.astype(jnp.float32) - mu
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return ((xc * inv) * g + b).astype(x.dtype)


def bert_apply(params: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
               token_type_ids: jnp.ndarray, cfg: BertConfig) -> jnp.ndarray:
    """[B, L] ids/mask/types -> [B, L, H] last hidden states (eval mode).
    ``cfg`` is static (head count / eps live outside the param pytree so the
    frozen weights can be jit arguments)."""
    b, L = input_ids.shape
    h = params["word_emb"].shape[1]
    n_heads = cfg.num_heads
    eps = cfg.eps
    x = (params["word_emb"][input_ids]
         + params["pos_emb"][jnp.arange(L)][None]
         + params["type_emb"][token_type_ids])
    x = _ln(x, params["emb_ln_g"], params["emb_ln_b"], eps)

    # HF extended attention mask: (1 - mask) * -10000 additive bias
    bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0

    dh = h // n_heads

    def layer(x, lp):
        def lin(x_, w, bb):
            # ``x @ w.T + b``; int8 path when the weight is a quantized
            # {"q", "s"} dict (quantize_bert_params)
            if isinstance(w, dict):
                return _qproj(x_, w, bb)
            return x_ @ w.T + bb

        def _layer_ffn(x2, lp):
            # Intermediate + Output block (fc1/gelu/fc2/residual/LN2);
            # shared by the fused-attention early return and the tail
            quantized = isinstance(lp["fc1_w"], dict)
            if _ffn_resolved_impl(h, lp["fc1_b"].shape[-1],
                                  quantized) == "pallas":
                # fused fc1 -> gelu -> fc2 -> residual -> LN, one VMEM pass
                # (ops/bert_ffn_pallas.py; forward-only — BERT is frozen)
                from ..ops.bert_ffn_pallas import ffn_ln_block, ffn_ln_block_q
                fused = ffn_ln_block_q if quantized else ffn_ln_block
                return fused(x2, lp["fc1_w"], lp["fc1_b"], lp["fc2_w"],
                             lp["fc2_b"], lp["ln2_g"], lp["ln2_b"], eps=eps,
                             interpret=FFN_INTERPRET,
                             block_rows=FFN_BLOCK_ROWS)
            ff = jax.nn.gelu(lin(x2, lp["fc1_w"], lp["fc1_b"]),
                             approximate=False)
            return _ln(x2 + lin(ff, lp["fc2_w"], lp["fc2_b"]),
                       lp["ln2_g"], lp["ln2_b"], eps)

        if isinstance(lp["q_w"], dict):
            # quantize the shared QKV input ONCE (three dots, one
            # round/cast pass — see _qrows)
            xq, sx = _qrows(x)

            def proj(w, bb):
                return _qdot(xq, sx, w, bb, (b, L), x.dtype
                             ).reshape(b, L, n_heads, dh)
        else:
            def proj(w, bb):
                # stay in [B, L, heads, dh]; the einsums contract with
                # (b, h) as dot batch dims.  NOTE: an in-process A/B of this
                # layout vs the explicit-transpose bhqd layout vs an
                # o-proj-fused variant (benchmarks/bert_variants_bench.py,
                # on-chip 2026-08-17) timed all three IDENTICAL to <0.3% —
                # XLA canonicalizes the layouts; profiler per-op attribution
                # of the relayout copies is not causal.
                return (x @ w.T + bb).reshape(b, L, n_heads, dh)

        attn_impl = _attn_resolved_impl(L, dh, h=h,
                                        quantized=isinstance(lp["q_w"], dict))
        if attn_impl == "fused":
            # the whole BertSelfAttention + BertSelfOutput block in ONE
            # pallas_call (q/k/v/o dots + block-diag attention + residual
            # + LN1, natural layout — ops/bert_attn_pallas.py stage 2)
            from ..ops.bert_attn_pallas import attention_block_fused
            x2 = attention_block_fused(
                x, attention_mask, lp["q_w"], lp["q_b"], lp["k_w"],
                lp["k_b"], lp["v_w"], lp["v_b"], lp["o_w"], lp["o_b"],
                lp["ln1_g"], lp["ln1_b"], n_heads=n_heads, eps=eps,
                block_items=ATTN_BLOCK_ITEMS, interpret=FFN_INTERPRET,
                softmax_dtype=ATTN_SOFTMAX)
            return _layer_ffn(x2, lp), None

        q = proj(lp["q_w"], lp["q_b"])
        k = proj(lp["k_w"], lp["k_b"])
        v = proj(lp["v_w"], lp["v_b"])
        if attn_impl == "dense":
            # dense block-diag kernel: whole logits/softmax in VMEM, one
            # full-width MXU dot per side (ops/bert_attn_pallas.py)
            from ..ops.bert_attn_pallas import dense_attention_blockdiag
            attn = dense_attention_blockdiag(
                q, k, v, attention_mask, units_per_block=ATTN_UPB,
                interpret=FFN_INTERPRET)
        else:
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
                      / math.sqrt(dh) + bias)
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)  # f32
            #                         softmax, cast back (keeps the scan
            #                         carry dtype stable under bf16 policy)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, L, h)
        if (not isinstance(lp["o_w"], dict)
                and _ffn_resolved_impl(h, h, False) == "pallas"):
            # fused o-proj + residual + LN1 (ops/bert_ffn_pallas.py)
            from ..ops.bert_ffn_pallas import proj_ln_block
            x = proj_ln_block(x, attn, lp["o_w"], lp["o_b"], lp["ln1_g"],
                              lp["ln1_b"], eps=eps, interpret=FFN_INTERPRET,
                              block_rows=min(FFN_BLOCK_ROWS * 2, 512))
        else:
            x = _ln(x + lin(attn, lp["o_w"], lp["o_b"]), lp["ln1_g"], lp["ln1_b"], eps)
        return _layer_ffn(x, lp), None

    x, _ = jax.lax.scan(layer, x, params["layers"], unroll=SCAN_UNROLL)
    return x


def load_hf_bert_params(model_dir: str):
    """Import weights from a HuggingFace BERT torch checkpoint directory.
    Returns (params, BertConfig) or None if unavailable (caller falls back to
    random init)."""
    try:
        import transformers

        model = transformers.BertModel.from_pretrained(model_dir)
    except Exception:
        return None
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = model.config
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "q_w": sd[p + "attention.self.query.weight"],
            "q_b": sd[p + "attention.self.query.bias"],
            "k_w": sd[p + "attention.self.key.weight"],
            "k_b": sd[p + "attention.self.key.bias"],
            "v_w": sd[p + "attention.self.value.weight"],
            "v_b": sd[p + "attention.self.value.bias"],
            "o_w": sd[p + "attention.output.dense.weight"],
            "o_b": sd[p + "attention.output.dense.bias"],
            "ln1_g": sd[p + "attention.output.LayerNorm.weight"],
            "ln1_b": sd[p + "attention.output.LayerNorm.bias"],
            "fc1_w": sd[p + "intermediate.dense.weight"],
            "fc1_b": sd[p + "intermediate.dense.bias"],
            "fc2_w": sd[p + "output.dense.weight"],
            "fc2_b": sd[p + "output.dense.bias"],
            "ln2_g": sd[p + "output.LayerNorm.weight"],
            "ln2_b": sd[p + "output.LayerNorm.bias"],
        })
    params = {
        "word_emb": sd["embeddings.word_embeddings.weight"],
        "pos_emb": sd["embeddings.position_embeddings.weight"],
        "type_emb": sd["embeddings.token_type_embeddings.weight"],
        "emb_ln_g": sd["embeddings.LayerNorm.weight"],
        "emb_ln_b": sd["embeddings.LayerNorm.bias"],
        "layers": jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers),
    }
    out_cfg = BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers, num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, eps=cfg.layer_norm_eps)
    return jax.tree.map(jnp.asarray, params), out_cfg
