"""In-process A/B of the 18-stack T==1 trunk segment (fwd + bwd).

Times JUST the trunk encoder stacks at the MOSEI headline shapes (B=1024,
d=200: 3 self stacks x3 layers, 2 vmapped cross levels of 6 stacks x4
layers, 3 top stacks at E_in=1400 x2 layers) under each staged knob
combination — full-step A/B (benchmarks/stack_knobs_ab.py) costs a ~500 s
tunnel compile per cell, this segment compiles in tens of seconds and
isolates the stack effect from BERT/GRU noise.

Same protocol as bert_variants_bench.py: one process, carry-threaded
timing loop, interleaved rounds, median.

Run: python benchmarks/trunk_segment_bench.py [--batch 1024] [--iters 30]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from multimodal_transformer_robustness_tpu import utils
from multimodal_transformer_robustness_tpu.ops import (
    EncoderMasks, encoder_forward, init_encoder)
from multimodal_transformer_robustness_tpu.ops import encoder as enc
from multimodal_transformer_robustness_tpu.ops.encoder import EncoderHParams


def _ones(n):
    return jnp.ones((n,), jnp.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    utils.enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    B, E, H, Dh = args.batch, 200, 8, 25
    E_top = 7 * E
    groups = [  # (name, n_stacks, layers, e_in, cross, attn_rate)
        ("mems0", 3, 3, E, False, 0.1),
        ("cross2", 6, 4, E, True, 0.1),
        ("cross3", 6, 4, E, True, 0.1),
        ("top", 3, 2, E_top, False, 0.0),
    ]
    key = jax.random.PRNGKey(0)
    gparams, gmasks, ghp, gx, gkv, grates = [], [], [], [], [], []
    for name, g, L, e_in, cross, rate in groups:
        hp = EncoderHParams(embed_dim_in=e_in, num_heads=H, head_dim=Dh,
                            layers=L, attn_mask=True, relu_dropout=0.1,
                            res_dropout=0.3, embed_dropout=0.3,
                            flash_zero_rates=(rate == 0.0))
        key, k1, k2, k3 = jax.random.split(key, 4)
        pg = jax.vmap(lambda k: init_encoder(k, hp))(jax.random.split(k1, g))
        pg = jax.tree.map(lambda a: a.astype(dt)
                          if a.dtype == jnp.float32 else a, pg)
        gparams.append(pg)
        gmasks.append(EncoderMasks(_ones(L), _ones(H), _ones(Dh),
                                   _ones(4 * H * Dh),
                                   _ones(e_in) if name == "top" else None))
        ghp.append(hp)
        gx.append(jax.random.normal(k2, (g, B, 1, e_in), dt))
        gkv.append(jax.random.normal(k3, (g, B, 1, e_in), dt) if cross
                   else None)
        grates.append(jnp.full((g,), rate, jnp.float32))

    def segment(carry, xs, params):
        key = jax.random.PRNGKey(7)
        total = jnp.float32(0)
        for i, (name, g, L, e_in, cross, _) in enumerate(groups):
            keys = jax.random.split(jax.random.fold_in(key, i), g)
            hp, m = ghp[i], gmasks[i]

            if cross:
                def f(p, xx, kv, rr, kk, hp=hp, m=m):
                    return encoder_forward(p, xx + carry, kv, hp=hp, masks=m,
                                           attn_rate=rr, train=True, rng=kk)
                out = jax.vmap(f)(params[i], xs[i], gkv[i], grates[i], keys)
            else:
                def f(p, xx, rr, kk, hp=hp, m=m):
                    return encoder_forward(p, xx + carry, hp=hp, masks=m,
                                           attn_rate=rr, train=True, rng=kk)
                out = jax.vmap(f)(params[i], xs[i], grates[i], keys)
            total = total + jnp.sum(out.astype(jnp.float32))
        return total

    def step(carry, xs, params):
        val, grads = jax.value_and_grad(
            lambda p: segment(carry, xs, p))(params)
        # runtime-zero, non-foldable carry that depends on EVERY grad leaf
        # (depending on one leaf only would let XLA dead-code-eliminate the
        # rest of the backward pass)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return ((val + gsum) * jnp.float32(1e-30)).astype(dt)

    cells = [  # (name, REMAT_MIN_TIME, SCAN_UNROLL) — TRUNK_IMPL axis
        # retired with the fused-trunk dispatch (measured loss, 2026-08-18)
        ("xla", 1, False),
        ("xla+no_t1_remat", 2, False),
        ("xla+unroll", 1, True),
        ("xla_again", 1, False),
    ]
    fns = {}
    for name, mt, un in cells:
        enc.REMAT_MIN_TIME, enc.SCAN_UNROLL = mt, un
        fns[name] = jax.jit(step)
        try:
            fns[name](jnp.asarray(0, dt), gx, gparams).block_until_ready()
        except Exception as e:  # a failing cell must not kill the batch
            print(f"{name}: COMPILE FAILED: {e}", flush=True)
            fns[name] = None

    results = {name: [] for name, *_ in cells}
    for _ in range(args.rounds):
        for name, mt, un in cells:
            if fns[name] is None:
                continue
            enc.REMAT_MIN_TIME, enc.SCAN_UNROLL = mt, un
            c = jnp.asarray(0, dt)
            fns[name](c, gx, gparams).block_until_ready()  # warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = fns[name](c, gx, gparams)
            c.block_until_ready()
            results[name].append(
                (time.perf_counter() - t0) / args.iters * 1e3)

    for name, *_ in cells:
        if not results[name]:
            continue
        ms = sorted(results[name])[len(results[name]) // 2]
        print(f"{name:>20}: median {ms:7.2f} ms  (rounds: "
              + ", ".join(f"{m:.2f}" for m in results[name]) + ")")


if __name__ == "__main__":
    main()
