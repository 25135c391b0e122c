"""Find (or refute) a winning regime for ``flash_attention_masked`` — the
fwd-only key-padding-mask flash kernel (VERDICT r3 #7 retire-or-justify).

It already LOSES at the production BERT shape (L=32: 4x key-block + 2x
head-dim padding, BENCH_NOTES "flash_attn sizing cell"); its claimed regime
is LONG-sequence text where the [B, H, T, T] logits tensor dominates HBM
traffic on the XLA path.  Cells: XLA additive-bias attention vs the kernel
at BERT-base head geometry (H=12, dh=64) over T ∈ {512, 1024, 2048, 4096},
25% key padding, device-side scan loops with scalar readback
(the ONLY protocol that measures through the axon tunnel — see the
make_loop comment and BENCH_NOTES "Timing protocol").

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
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_transformer_robustness_tpu.ops.attention_pallas import (
        flash_attention_masked)
    from multimodal_transformer_robustness_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()
    H, dh = a.heads, a.head_dim
    dt = jnp.dtype(a.dtype)
    c_dt = lambda x: jnp.asarray(x, dt)
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
        q = jnp.asarray(r.standard_normal((B, H, T, dh)), dt) * c_dt(scale)
        k = jnp.asarray(r.standard_normal((B, H, T, dh)), dt)
        v = jnp.asarray(r.standard_normal((B, H, T, dh)), dt)
        mask = np.ones((B, T), np.int32)
        mask[:, int(T * 0.75):] = 0  # 25% padding
        mask = jnp.asarray(mask)

        def make_loop(fn, n):
            # DEVICE-SIDE timing loop with a SCALAR READBACK: one dispatch
            # runs n chained iterations via lax.scan (each feeding the full
            # output back into q at real magnitude), and the caller fetches
            # float(sum) — the only synchronization that measures through
            # the axon tunnel.  Two traps this dodges (both measured as
            # ~50,000 "TFLOP/s" 2026-08-19, BENCH_NOTES "Timing protocol"):
            # the client memoizes bit-identical repeat executions, and
            # block_until_ready() does NOT wait for remote completion.
            @jax.jit
            def loop(q, k, v, m):
                def body(c, _):
                    out = fn(q + c * c_dt(1e-3), k, v, m)
                    return out, ()
                c, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
                return jnp.sum(c.astype(jnp.float32))
            return loop

        cells = {
            "xla": make_loop(xla_masked, a.iters),
            "kernel": make_loop(lambda q, k, v, m: flash_attention_masked(
                q, k, v, m), a.iters),
            "xla_again": make_loop(xla_masked, a.iters),
        }
        res = {name: [] for name in cells}
        for name, loop in cells.items():
            float(loop(q, k, v, mask))  # compile + first exec
        for _ in range(a.rounds):
            for name, loop in cells.items():
                # q differs per round so the memoizer cannot elide the call
                q = q + c_dt(1e-3)
                t0 = time.perf_counter()
                float(loop(q, k, v, mask))
                res[name].append((time.perf_counter() - t0) / a.iters * 1e3)
        line = " ".join(f"{n}={float(np.median(v)):.3f}ms" for n, v in res.items())
        # attention-only matmul flops (fwd): 2*B*H*T*T*dh * 2 dots
        gf = 4.0 * B * H * T * T * dh / 1e9
        med = float(np.median(res["kernel"]))
        print(f"T={T} B={B}: {line}  speedup={float(np.median(res['xla'])) / med:.2f}x "
              f"({gf:.1f} GFLOP -> {gf / med:.1f} TFLOP/s kernel)", flush=True)


if __name__ == "__main__":
    main()
