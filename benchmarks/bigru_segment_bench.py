"""BiGRU header-segment A/B at the flagship shapes (VERDICT r4 next #3a).

Isolates the production header pipelines (two fused BiGRU levels + the
inter-level LN, models/headers._rnn_header_tmajor composition) for all three
MOSEI modalities — t: [B, 32, 768] (cached-BERT features), a: [B, 50, 768],
v: [B, 50, 512] — and times forward+backward under a param-grad loss with a
device-side scan loop + scalar readback (the only protocol that measures
through the axon tunnel; see kpm_regime_bench.py).

Cells (inputs held [B, T, in] — the layout the production step receives):
  * dx      — first-level kernels compute + write the input gradient
              (the pre-r5 behavior: need_dx=True everywhere) after an
              in-step [B,T,in]->[T,B,in] transpose
  * no_dx   — first-level input gradients declared structurally dead
              (need_dx=False, the r5 header wiring): the backward
              kernel skips the three projection-sized dx contractions and
              the [T, B, in] dx HBM writes; transpose still paid
  * tm      — no_dx with inputs ALREADY T-major (transposed outside the
              timed step): the ceiling for any transpose-elision scheme —
              the no_dx − tm delta IS the in-step [B,T,in]->[T,B,in] cost
  * fwd     — forward-only reference point (the eval/serving cost)

A batch-major kernel variant (x_bmajor BlockSpecs reading [B,T,in]
directly) was built and interpret-validated on 2026-08-20, then REJECTED
on two measurements: (1) it cannot lower on current Mosaic at the
flagship shapes — the x block (nblk, kt=5, in) violates the last-two-dims
rule (second-minor must be a multiple of 8 or the full T=50, and a full-T
block exceeds VMEM at in=768); (2) the tm ceiling cell showed the in-step
transpose costs 0.054 ms at B=4096 (XLA fuses it into the producer), so
even a lowering fix could win nothing.  The variant was removed rather
than kept as an opt-in.

Analytic matmul GFLOPs per cell are printed beside the measured ms so the
MFU of the segment is explicit (flops-counting mirrors flops.py: bwd dots =
recompute + dh-chain + dW (+ dx when computed); biases/elementwise
uncounted).

Run on the TPU:  python benchmarks/bigru_segment_bench.py [--batch 4096]
                 [--iters 20] [--rounds 3] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (name, T, in_dim) at the MOSEI flagship (d=200 -> H=100 per direction)
MODALITIES = (("t", 32, 768), ("a", 50, 768), ("v", 50, 512))
D = 200


def header_flops(b: int, need_dx: bool, fwd_only: bool = False) -> float:
    """Analytic matmul GFLOPs for the three header pipelines."""
    h3 = 3 * (D // 2) * 2  # per-direction 3H columns x 2 flops/MAC
    total = 0.0
    for _, t, in_dim in MODALITIES:
        for lvl_in in (in_dim, D):  # gru1, gru2
            proj = t * b * lvl_in * h3
            rec = t * b * (D // 2) * h3
            fwd = proj + rec
            if fwd_only:
                total += 2 * fwd  # two directions
                continue
            # bwd = recompute(fwd) + dh-chain(rec) + dW_ih(proj) + dW_hh(rec)
            bwd = fwd + rec + proj + rec
            if need_dx or lvl_in == D:  # gru2's dx is always live
                bwd += proj
            total += 2 * (fwd + bwd)
    return total / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_transformer_robustness_tpu.models.headers import (
        _init_rnn_header)
    from multimodal_transformer_robustness_tpu.ops.bigru_pallas import (
        bigru_finals_tmajor, bigru_level_tmajor)
    from multimodal_transformer_robustness_tpu.ops.layernorm import (
        masked_layer_norm)
    from multimodal_transformer_robustness_tpu.utils import (
        enable_compilation_cache, set_default_prng)

    enable_compilation_cache()
    set_default_prng()
    dt = jnp.dtype(a.dtype)
    B = a.batch

    rng = np.random.default_rng(0)
    params = {name: _init_rnn_header(jax.random.PRNGKey(i), in_dim, D)
              for i, (name, _, in_dim) in enumerate(MODALITIES)}
    # batch-major, as the production step receives its inputs (feed dtype =
    # compute dtype per the r5 pipeline)
    xs = {name: jnp.asarray(rng.standard_normal((B, t, in_dim)), dt)
          for name, t, in_dim in MODALITIES}
    cast = lambda tree: jax.tree.map(lambda v: v.astype(dt), tree)
    params = cast(params)

    def headers(p, xs_, need_dx1, layout):
        # layout: "b" = batch-major input, transpose in-step (production);
        #         "t" = input already T-major (transpose-elision ceiling)
        outs = []
        for name, _, _ in MODALITIES:
            x = xs_[name].astype(dt)  # production boundary cast (no-op here)
            arg = jnp.swapaxes(x, 0, 1) if layout == "b" else x
            hs1 = bigru_level_tmajor(p[name]["gru1"], arg,
                                     need_dx=need_dx1)
            d = hs1.shape[-1]
            hs1 = masked_layer_norm(hs1, jnp.ones((d,), hs1.dtype),
                                    jnp.zeros((d,), hs1.dtype))
            hs2 = bigru_level_tmajor(p[name]["gru2"], hs1)
            outs.append(bigru_finals_tmajor(hs2))
        return jnp.concatenate(outs, -1)

    def make_loop(need_dx1, fwd_only, n, layout="b"):
        def seg(p, xs_, c):
            xs_ = {k: v + c.astype(dt) for k, v in xs_.items()}
            if fwd_only:
                return jnp.sum(headers(p, xs_, need_dx1, layout)
                               .astype(jnp.float32))
            loss, grads = jax.value_and_grad(
                lambda pp: jnp.sum(headers(pp, xs_, need_dx1, layout)
                                   .astype(jnp.float32)))(p)
            return loss + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                              for g in jax.tree.leaves(grads))

        @jax.jit
        def loop(p, xs_):
            def body(c, _):
                return c + seg(p, xs_, c * 1e-6) * 1e-12, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n)
            return c
        return loop

    cells = {
        "fwd": (make_loop(True, True, a.iters),
                header_flops(B, True, fwd_only=True)),
        "dx": (make_loop(True, False, a.iters), header_flops(B, True)),
        "no_dx": (make_loop(False, False, a.iters), header_flops(B, False)),
        "tm": (make_loop(False, False, a.iters, layout="t"),
               header_flops(B, False)),
    }
    def feed(name, xs_):  # the tm cell's transpose happens OUTSIDE the timer
        if name != "tm":
            return xs_
        return {k: jnp.swapaxes(v, 0, 1) for k, v in xs_.items()}

    res = {name: [] for name in cells}
    for name, (loop, _) in cells.items():
        t0 = time.perf_counter()
        float(loop(params, feed(name, xs)))  # compile + first exec
        print(f"[compile {name}: {time.perf_counter() - t0:.1f}s]",
              flush=True)
    for _ in range(a.rounds):
        for name, (loop, _) in cells.items():
            # fresh inputs per round so the client memoizer cannot elide
            xs = {k: v + np.float32(1e-4) for k, v in xs.items()}
            arg = feed(name, xs)
            for v in arg.values():  # HOST READBACK: the only sync that
                #  provably waits through the axon tunnel (BENCH_NOTES
                #  "Timing protocol"; block_until_ready does NOT) — the tm
                #  cell's out-of-timer transpose must be DONE before t0
                float(v[0, 0, 0])
            t0 = time.perf_counter()
            float(loop(params, arg))
            res[name].append((time.perf_counter() - t0) / a.iters * 1e3)
    print(f"B={B} dtype={a.dtype} (median of {a.rounds} rounds x "
          f"{a.iters} iters)")
    for name, (_, gf) in cells.items():
        ms = float(np.median(res[name]))
        print(f"  {name:6s} {ms:7.3f} ms  {gf:8.1f} GF  "
              f"{gf / ms:6.1f} TF/s", flush=True)
    dx, no_dx = float(np.median(res["dx"])), float(np.median(res["no_dx"]))
    tm = float(np.median(res["tm"]))
    print(f"  no_dx saves {dx - no_dx:.3f} ms ({(1 - no_dx / dx) * 100:.1f}%)")
    print(f"  in-step transpose costs {no_dx - tm:.3f} ms "
          f"(no_dx - tm; ceiling for any transpose-elision scheme)")


if __name__ == "__main__":
    main()
