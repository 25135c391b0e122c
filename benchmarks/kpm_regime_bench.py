"""Find (or refute) a winning regime for ``flash_attention_masked`` — the
fwd-only key-padding-mask flash kernel (VERDICT r3 #7 retire-or-justify).

It already LOSES at the production BERT shape (L=32: 4x key-block + 2x
head-dim padding, BENCH_NOTES "flash_attn sizing cell"); its claimed regime
is LONG-sequence text where the [B, H, T, T] logits tensor dominates HBM
traffic on the XLA path.  Cells: XLA additive-bias attention vs the kernel
at BERT-base head geometry (H=12, dh=64) over T ∈ {512, 1024, 2048, 4096},
25% key padding, bf16 operands, in-process threaded-carry protocol
(BENCH_NOTES "Timing protocol").

Usage: python benchmarks/kpm_regime_bench.py [--iters 30] [--rounds 3]
"""

import argparse
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=2 ** 15,
                    help="B*T held ~constant so every cell is ~equal work "
                         "per iteration scale-wise")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_transformer_robustness_tpu.ops.attention_pallas import (
        flash_attention_masked)
    from multimodal_transformer_robustness_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()
    H, dh = a.heads, a.head_dim
    scale = 1.0 / math.sqrt(dh)

    def xla_masked(q, k, v, key_mask):
        bias = (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    for T in (512, 1024, 2048, 4096):
        B = max(1, a.tokens // T)
        r = np.random.default_rng(0)
        q = jnp.asarray(r.standard_normal((B, H, T, dh)), jnp.bfloat16) * scale
        k = jnp.asarray(r.standard_normal((B, H, T, dh)), jnp.bfloat16)
        v = jnp.asarray(r.standard_normal((B, H, T, dh)), jnp.bfloat16)
        mask = np.ones((B, T), np.int32)
        mask[:, int(T * 0.75):] = 0  # 25% padding
        mask = jnp.asarray(mask)

        def make_step(fn):
            @jax.jit
            def step(c, q, k, v, m):
                # thread the carry through q so iterations have a data dep
                out = fn(q + c, k, v, m)
                return (jnp.sum(out[0, 0, 0]) * jnp.bfloat16(1e-24)).astype(
                    jnp.bfloat16)
            return step

        cells = {
            "xla": make_step(xla_masked),
            "kernel": make_step(lambda q, k, v, m: flash_attention_masked(
                q, k, v, m)),
            "xla_again": make_step(xla_masked),
        }
        res = {name: [] for name in cells}
        for name, step in cells.items():
            step(jnp.bfloat16(0), q, k, v, mask).block_until_ready()  # compile
        for _ in range(a.rounds):
            for name, step in cells.items():
                c = jnp.bfloat16(0)
                step(c, q, k, v, mask).block_until_ready()  # warm
                t0 = time.perf_counter()
                for _ in range(a.iters):
                    c = step(c, q, k, v, mask)
                c.block_until_ready()
                res[name].append((time.perf_counter() - t0) / a.iters * 1e3)
        line = " ".join(f"{n}={float(np.median(v)):.3f}ms" for n, v in res.items())
        # attention-only matmul flops (fwd): 2*B*H*T*T*dh * 2 dots
        gf = 4.0 * B * H * T * T * dh / 1e9
        med = float(np.median(res["kernel"]))
        print(f"T={T} B={B}: {line}  speedup={float(np.median(res['xla'])) / med:.2f}x "
              f"({gf:.1f} GFLOP -> {gf / med:.1f} TFLOP/s kernel)", flush=True)


if __name__ == "__main__":
    main()
