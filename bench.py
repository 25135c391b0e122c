"""Driver benchmark: MOSEI-config train-step throughput (samples/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches the reference's canonical MOSEI command (run.sh: d=200,
8 heads, head_dim 25, layers 3/4/2, batch 16) with the same synthetic input
shapes and a random-init 4-layer BERT text encoder on both sides (no
pretrained weights exist in this environment; identical compute either way).

``vs_baseline`` compares against the measured reference throughput in
BASELINE_MEASURED.json (produced by benchmarks/reference_baseline.py —
torch-CPU, the only hardware the reference can run on here; the reference
repo publishes no numbers, BASELINE.md).  Extra context (step ms, hardware)
goes to stderr.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main(batch_size=4096, steps=30, warmup=2, bert_layers=4,
         compute_dtype="bfloat16", cached_text=False, emit_json=True,
         prng="rbg", repeats=3, bert_int8=False, feed_f32=False):
    """One measured train-throughput config.  Defaults = the headline:
    throughput-optimal batch (4096 since the 2026-08-19 post-kernel-flip
    sweep — B=1024 before; BENCH_NOTES.md) with the bf16 compute policy
    (params f32, compute bf16 — ModelSpec.compute_dtype).  ``main(batch_size=16,
    compute_dtype="float32")`` reproduces the strict run.sh-parity
    configuration (the reference trains f32 at B=16).

    ``cached_text=True`` measures the --cache_text pipeline (frozen-BERT
    features precomputed once per dataset, train/features.py): the steady-
    state train step consumes [B, L, 768] features instead of token stacks.
    Semantically exact (tests/test_cached_text.py) and the per-sample
    extraction cost amortizes over every epoch/sweep/EA reuse, but it is a
    different pipeline than the reference's recompute-every-step — both
    numbers are recorded in BENCH_NOTES.md."""
    import dataclasses

    import jax

    from multimodal_transformer_robustness_tpu.utils import (
        enable_compilation_cache, set_default_prng)

    enable_compilation_cache()
    # rbg dropout draws: -11% step time vs threefry (utils.set_default_prng)
    set_default_prng(prng)
    import jax.numpy as jnp
    import optax

    from multimodal_transformer_robustness_tpu import build_masks, full_active_config
    from multimodal_transformer_robustness_tpu.masks import build_masks as _bm
    from multimodal_transformer_robustness_tpu.models import init_supernet, supernet_apply
    from multimodal_transformer_robustness_tpu.models.bert import BertConfig
    from multimodal_transformer_robustness_tpu.train.loop import make_criterion
    from multimodal_transformer_robustness_tpu.train.sampling import sample_train_config
    from __graft_entry__ import _mosei_spec

    spec = dataclasses.replace(_mosei_spec(), compute_dtype=compute_dtype)
    bert_cfg = BertConfig(num_layers=bert_layers)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec, bert_cfg=bert_cfg)
    if bert_int8 and cached_text:
        # same contract as cli/main.py: the cached step contains no BERT,
        # so quantization would only corrupt the precomputed features while
        # measuring nothing int8-related
        print("--bert_int8 ignored with --cached_text (the cached step "
              "runs no BERT)", file=sys.stderr)
        bert_int8 = False
    if bert_int8 and "bert" in frozen:
        from multimodal_transformer_robustness_tpu.models.bert import (
            quantize_bert_params)

        # FFN-only (attn=False): the measured-fastest composition —
        # int8 FFN + fused float attention block (BENCH_NOTES)
        frozen = dict(frozen, bert=quantize_bert_params(frozen["bert"],
                                                        attn=False))

    B, T, L = batch_size, 50, 32
    rng = np.random.default_rng(0)
    # float modality feeds arrive ALREADY in the compute dtype (the data
    # pipeline stores/uploads bf16 under the bf16 policy — store_dtype on the
    # --device_data path, data/loaders.cast_float_inputs on the host path):
    # supernet_apply's boundary cast is the first op to
    # touch these inputs, so pre-casting is bit-identical
    # (tests/test_bf16_policy.py::test_precast_feed_bit_identical) while the
    # upload + the per-step header transpose move half the bytes and the
    # on-device cast pass disappears.  --feed_f32 restores the r4 behavior
    # (the A/B control).
    feed_dt = jnp.float32 if feed_f32 else jnp.dtype(compute_dtype)
    text = jnp.asarray(np.stack([
        rng.integers(0, bert_cfg.vocab_size, (B, L)),
        np.zeros((B, L), np.int64), np.ones((B, L), np.int64)]))
    audio = jnp.asarray(rng.standard_normal((B, T, 768)), feed_dt)
    vision = jnp.asarray(rng.standard_normal((B, T, 512)), feed_dt)
    labels = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    inputs = [text, audio, vision]
    if cached_text:
        from multimodal_transformer_robustness_tpu.train.features import (
            precompute_text_features)

        t0 = time.time()
        feats = precompute_text_features(frozen, bert_cfg, np.asarray(text),
                                         batch_size=min(B, 1024),
                                         compute_dtype=compute_dtype)
        print(f"text-feature precompute: {time.time() - t0:.2f} s for "
              f"{B} rows (once per dataset, amortized over all epochs)",
              file=sys.stderr)
        # feats hold bf16-computed values in f32 storage (lossless), so the
        # feed cast back to bf16 reproduces the online activations exactly
        inputs = [jnp.asarray(feats, feed_dt), audio, vision]

    criterion = make_criterion("L1Loss")
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    opt_state = tx.init(params)
    valid = jnp.ones((B,), jnp.float32)

    # frozen/inputs/labels are explicit jit args: closure arrays embed as
    # HLO constants and inflate the remote-compile request
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, frozen, inputs, labels, masks, key):
        def loss_fn(p):
            preds = supernet_apply(spec, p, masks, inputs, frozen=frozen,
                                   bert_cfg=bert_cfg, train=True, rng=key)
            return criterion(preds, labels, valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # per-step random_sample configs, as training does (host-side sampling,
    # zero retraces on the device step)
    host_rng = np.random.default_rng(0)
    pool = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    mask_stream = [
        jax.tree.map(jnp.asarray, build_masks(
            spec, sample_train_config(spec, "random_sample", pool, host_rng)))
        for _ in range(steps + warmup)]

    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, frozen, inputs, labels, mask_stream[i], k)
    float(loss)  # host readback: warmup must be DONE before the timer
    #              starts (block_until_ready alone can return early
    #              through the tunnel — BENCH_NOTES timing traps)
    # ``repeats`` > 1: median-of-N protocol for latency-bound cells — small-
    # batch steps swing ±40% day-to-day through the remote tunnel
    # (BENCH_NOTES), so each timing loop repeats and the MEDIAN is reported
    # with the min/max spread on stderr
    dts = []
    for _ in range(max(1, repeats)):
        t0 = time.time()
        for i in range(steps):
            key, k = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, frozen, inputs, labels,
                mask_stream[warmup + i], k)
        # HOST READBACK, not just block_until_ready: through the axon
        # tunnel block_until_ready can return before remote completion
        # (BENCH_NOTES "Timing protocol, STRENGTHENED" trap #3); float()
        # of the final loss — which depends on the whole donated-params
        # chain — is the synchronization that provably waits.  Costs one
        # ~4 ms RTT per timed loop (~0.1 ms/step at steps=30), included
        # in the reported time.
        loss_val = float(loss)  # the readback itself must never be stripped
        if not np.isfinite(loss_val):  # (python -O removes asserts)
            raise RuntimeError(f"non-finite loss in timed loop: {loss_val}")
        dts.append((time.time() - t0) / steps)
    dt = float(np.median(dts))
    if len(dts) > 1:
        print(f"median of {len(dts)} timing loops; per-loop step ms: "
              f"{[round(d * 1000, 2) for d in sorted(dts)]}", file=sys.stderr)

    sps = batch_size / dt
    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs = 1.0
    base_note = "no baseline file"
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = sps / base["reference_samples_per_sec"]
        base_note = (f"reference {base['reference_samples_per_sec']:.2f} "
                     f"samples/s on {base['hardware']}")
    # FLOP/MFU accounting: ANALYTIC model (flops.py) — XLA's cost_analysis
    # undercounts ~5-13x here (scan bodies costed once, Pallas custom calls
    # invisible; BENCH_NOTES "FLOP accounting").  The XLA-visible number is
    # still recorded for cross-round comparability.
    from multimodal_transformer_robustness_tpu.flops import (
        count_params, device_peak_flops, train_step_flops)

    # seq_lens derived from the spec's header kinds (not positionally
    # hardcoded): wordpiece count L drives bert_rnn modalities, T the rest
    seq_lens = [L if spec.header_kind(ch) == "bert_rnn" else T
                for ch in spec.modality_set]
    fl = train_step_flops(spec, bert_cfg, batch_size, seq_lens,
                          cached_text=cached_text,
                          n_params=count_params(params))
    tflops = fl.total / dt / 1e12
    peak = device_peak_flops(jax.devices()[0])
    mfu = tflops * 1e12 / peak if peak else None
    flops_note = (f"; analytic {fl.total / 1e9:.1f} GFLOP/step = "
                  f"{tflops:.1f} TFLOP/s"
                  + (f" = {mfu * 100:.1f}% MFU (bf16 peak {peak / 1e12:.0f})"
                     if mfu is not None else "")
                  + f"; +remat replay {fl.remat_replay / 1e9:.1f} GFLOP")
    mem_info = {
        "gflop_step_analytic": round(fl.total / 1e9, 1),
        "tflops_per_sec": round(tflops, 1),
    }
    if mfu is not None:
        mem_info["mfu"] = round(mfu, 3)
    try:
        compiled = train_step.lower(
            params, opt_state, frozen, inputs, labels, mask_stream[0],
            key).compile()
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", 0.0))
        if flops:
            mem_info["gflop_step_xla_visible"] = round(flops / 1e9, 1)
        if cost.get("bytes accessed"):
            mem_info["hbm_bytes_accessed_gb"] = round(
                float(cost["bytes accessed"]) / 1e9, 2)
        ma = compiled.memory_analysis()
        if ma is not None:
            mem_info["hbm_temp_gb"] = round(ma.temp_size_in_bytes / 1e9, 2)
            mem_info["hbm_args_gb"] = round(
                ma.argument_size_in_bytes / 1e9, 2)
    except Exception:
        pass
    print(f"step {dt * 1000:.1f} ms on {jax.devices()[0].platform} "
          f"({jax.devices()[0]}) B={batch_size} {compute_dtype}; "
          f"{base_note}{flops_note}", file=sys.stderr)
    result = {
        "metric": "mosei_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(vs, 2),
    }
    if len(dts) > 1:
        result["step_ms_loops"] = [round(d * 1000, 2) for d in sorted(dts)]
    result.update(mem_info)
    if emit_json:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--bert_layers", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--cached_text", action="store_true")
    ap.add_argument("--bert_int8", action="store_true",
                    help="int8-quantize the frozen BERT matmuls (additive "
                         "TPU feature; see models/bert.quantize_bert_params)")
    ap.add_argument("--prng", default="rbg",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    ap.add_argument("--repeats", type=int, default=3,
                    help="median-of-N timing loops (tunnel drift evidence; "
                         "BENCH_NOTES)")
    ap.add_argument("--feed_f32", action="store_true",
                    help="feed float modality inputs as f32 instead of the "
                         "compute dtype (the pre-r5 pipeline; A/B control)")
    a = ap.parse_args()
    main(batch_size=a.batch, steps=a.steps, bert_layers=a.bert_layers,
         compute_dtype=a.dtype, cached_text=a.cached_text, prng=a.prng,
         bert_int8=a.bert_int8, repeats=a.repeats, feed_f32=a.feed_f32)
