"""Analytic matmul-FLOP model of the training step.

Why this exists: XLA's ``compiled.cost_analysis()`` undercounts this model
badly, in two independent ways —

  1. ``lax.scan`` bodies are costed ONCE, not ``× trip_count`` (the BERT
     layer stack, every trunk encoder stack, and the GRU recurrence are all
     scans), and
  2. Pallas kernels are opaque custom-calls with zero visible FLOPs (the
     fused attention-block / FFN / BiGRU kernels carry most of the step's
     matmuls on TPU).

Round 2's headline printed 1079.8 GFLOP/step (pure-XLA impls: scan bodies
counted once) and round 3's printed 204.1 GFLOP/step for the *same model*
(the scan bodies moved into Pallas kernels too) — both undercounts of the
true ≈2.7 TFLOP/step at B=1024.  See BENCH_NOTES.md "FLOP accounting".

Conventions (standard MFU accounting):
  * matmul/einsum FLOPs only, 2·m·n·k per [m,k]×[k,n] dot; elementwise,
    layernorm, softmax and embedding-gather work is excluded (sub-1% here).
  * backward of a trainable matmul = 2× its forward (dX and dW each cost
    one forward-shaped dot) ⇒ train total = 3× forward.
  * the frozen BERT is forward-only: its output feeds the trainable text
    header through ``stop_gradient`` (models/headers.py:193), so no
    backward dots exist for it (XLA DCEs them).
  * rematerialisation replay is NOT counted in ``total`` — MFU's numerator
    is model FLOPs; the replayed forward is reported separately as
    ``remat_replay`` so the hardware-issued figure is also available.
  * elasticity masks do not change FLOPs: masked ops execute the FULL
    parameter shapes every step (the supernet contract, masks.py).

Validated against XLA cost_analysis on unscanned single-layer closures in
tests/test_flops.py (agreement within a few % — the residue is XLA's
elementwise ops).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

from .config import ModelSpec
from .models.bert import BertConfig

# bf16 matmul peak of the chips this framework targets, for the MFU line.
# Keyed by a prefix of jax's device_kind.  v5e: 197 TFLOP/s bf16
# (394 int8); v4: 275; v5p: 459.  f32 matmuls run through the same MXU via
# multi-pass passes, so MFU-vs-bf16-peak is the honest denominator either way.
# int8 cells (--bert_int8): the int8 FFN dots run at ~2x the bf16 peak, so
# MFU-vs-bf16-peak OVERSTATES utilization for the int8-dot fraction of the
# step (~30% of online FLOPs at the flagship config).  We keep the bf16
# denominator for cross-cell comparability and flag it here rather than
# blending per-dot peaks; treat int8-cell MFU as a throughput ratio, not a
# hardware-utilization claim.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def device_peak_flops(device) -> Optional[float]:
    kind = getattr(device, "device_kind", "") or ""
    for prefix, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    if kind.startswith("TPU"):
        import sys

        print(f"flops.device_peak_flops: unrecognized device_kind "
              f"{kind!r} — no entry in PEAK_BF16_FLOPS, MFU omitted",
              file=sys.stderr)
    return None


def _lin(rows: int, n_in: int, n_out: int) -> float:
    return 2.0 * rows * n_in * n_out


def bigru_level_fwd(B: int, T: int, n_in: int, h: int) -> float:
    """One bidirectional GRU level: per direction, the packed input
    projection [B·T, n_in]×[n_in, 3h] plus the recurrence's T hidden dots
    [B, h]×[h, 3h] (ops/bigru_pallas.py runs exactly these dots)."""
    per_dir = _lin(B * T, n_in, 3 * h) + T * _lin(B, h, 3 * h)
    return 2.0 * per_dir


def rnn_header_fwd(B: int, T: int, n_in: int, d: int) -> float:
    """RNN_Header: two bidirectional GRU levels (in→d/2, d→d/2) with a
    non-affine LN between (models/headers.py:37-61)."""
    return bigru_level_fwd(B, T, n_in, d // 2) + bigru_level_fwd(B, T, d, d // 2)


def bert_layer_fwd(B: int, L: int, cfg: BertConfig) -> float:
    h, inter = cfg.hidden_size, cfg.intermediate_size
    rows = B * L
    attn = 3 * _lin(rows, h, h) + _lin(rows, h, h)       # qkv + o
    scores = 2.0 * rows * L * h                          # QK^T, per-head dh sums to h
    av = 2.0 * rows * L * h                              # attn·V
    ffn = _lin(rows, h, inter) + _lin(rows, inter, h)
    return attn + scores + av + ffn


def bert_fwd(B: int, L: int, cfg: BertConfig) -> float:
    return cfg.num_layers * bert_layer_fwd(B, L, cfg)


def encoder_layer_fwd(B: int, Tq: int, Tkv: int, e_in: int, H: int,
                      Dh: int) -> float:
    """One (dynamic) transformer encoder layer (ops/encoder.py): q/k/v
    project e_in→H·Dh, o projects back, FFN hidden = 4·H·Dh.

    At Tq == Tkv == 1 (every trunk stack after the headers) the T==1 fast
    path (ops/attention.py:97-123) leaves only the v and o projections —
    softmax over one key is identically 1, so q/k/logits vanish from the
    executed program (and XLA DCEs them on the slow path too)."""
    e_attn, ffn = H * Dh, 4 * H * Dh
    if Tq == 1 and Tkv == 1:
        f = _lin(B, e_in, e_attn) + _lin(B, e_attn, e_in)   # v, o
    else:
        f = _lin(B * Tq, e_in, e_attn)                 # q
        f += 2 * _lin(B * Tkv, e_in, e_attn)           # k, v
        f += 2.0 * B * H * Tq * Tkv * Dh * 2           # QK^T + attn·V
        f += _lin(B * Tq, e_attn, e_in)                # o
    f += _lin(B * Tq, e_in, ffn) + _lin(B * Tq, ffn, e_in)
    return f


@dataclass
class StepFlops:
    """All fields in FLOPs/step.  ``total`` = fwd + bwd + optimizer
    (model FLOPs, the MFU numerator); ``remat_replay`` on top of ``total``
    approximates what the hardware actually issues under the layer-remat
    gate (ops/encoder.py, rows ≥ 512)."""
    bert_fwd: float = 0.0
    headers_fwd: float = 0.0
    trunk_fwd: float = 0.0
    head_mlp_fwd: float = 0.0
    bwd: float = 0.0
    optimizer: float = 0.0
    remat_replay: float = 0.0
    parts: Dict[str, float] = field(default_factory=dict)

    @property
    def fwd(self) -> float:
        return (self.bert_fwd + self.headers_fwd + self.trunk_fwd
                + self.head_mlp_fwd)

    @property
    def total(self) -> float:
        return self.fwd + self.bwd + self.optimizer


def train_step_flops(
    spec: ModelSpec,
    bert_cfg: Optional[BertConfig],
    batch: int,
    seq_lens: Sequence[int],
    *,
    cached_text: bool = False,
    n_params: int = 0,
    train: bool = True,
) -> StepFlops:
    """Analytic FLOPs of one training step of the supernet.

    ``seq_lens``: per-modality input sequence length — the wordpiece count L
    for a bert_rnn modality (its RNN header runs over the L BERT states),
    T for plain-rnn modalities, ``n_patches**2`` (=16) for cnn_rnn.
    ``n_params`` (trainable leaf count) prices the optimizer update.
    ``cached_text``: the frozen-BERT forward is precomputed per dataset
    (train/features.py) so it leaves the step entirely.
    """
    B, d, M = batch, spec.dimension, spec.modality_num
    H, Dh = spec.num_heads, spec.head_dim
    out = StepFlops()

    # ---- headers (trainable) + frozen BERT --------------------------------
    for i, ch in enumerate(spec.modality_set):
        kind = spec.header_kind(ch)
        T = int(seq_lens[i])
        if kind == "bert_rnn":
            assert bert_cfg is not None
            if not cached_text:
                out.bert_fwd += bert_fwd(B, T, bert_cfg)
            f = rnn_header_fwd(B, T, bert_cfg.hidden_size, d)
        elif kind == "cnn_rnn":
            # conv 3x3, 1→1 channel over [H, W] = orig_dim² pixels (part of
            # headers_fwd so fwd/bwd stay consistent across M cnn headers),
            # then RNN header over 16 patches of (orig/4)² features
            o = spec.orig_dimensions[i]
            f = 2.0 * B * o * o * 9
            f += rnn_header_fwd(B, 16, (o // 4) * (o // 4), d)
        else:
            f = rnn_header_fwd(B, T, spec.orig_dimensions[i], d)
        out.headers_fwd += f

    # ---- trunk: every stack runs every step, T == 1 after the headers -----
    n_cross = len(spec.cross_strings)
    trunk = M * spec.layers_single_attn * encoder_layer_fwd(B, 1, 1, d, H, Dh)
    trunk += n_cross * spec.layers_cross_attn * encoder_layer_fwd(B, 1, 1, d, H, Dh)
    trunk += M * spec.layers_self_attn * encoder_layer_fwd(
        B, 1, 1, spec.top_dim, H, Dh)
    out.trunk_fwd = trunk

    # ---- head MLP ----------------------------------------------------------
    c = spec.combined_dim
    out.head_mlp_fwd = (_lin(B, c, c) * 2 + _lin(B, c, spec.output_dim))

    if train:
        # every trainable matmul pays dX + dW (= 2× fwd); frozen BERT pays
        # nothing (stop_gradient)
        out.bwd = 2.0 * (out.headers_fwd + out.trunk_fwd + out.head_mlp_fwd)
        # adam + global-norm clip ≈ 12 flops/param (m, v, update, clip)
        out.optimizer = 12.0 * n_params
        # layer-remat gate: consult ops.encoder's LIVE knobs (benchmark
        # cells flip them; a literal 512 here would misreport those cells)
        from .ops import encoder as _enc

        if (_enc.REMAT_LAYERS and 1 >= _enc.REMAT_MIN_TIME
                and B * 1 >= _enc.REMAT_MIN_ROWS):
            out.remat_replay = out.trunk_fwd

    out.parts.update({
        "bert_fwd": out.bert_fwd, "headers_fwd": out.headers_fwd,
        "trunk_fwd": out.trunk_fwd, "head_mlp_fwd": out.head_mlp_fwd,
        "bwd": out.bwd, "optimizer": out.optimizer,
    })
    return out


def count_params(tree) -> int:
    import jax

    return int(sum(x.size for x in jax.tree.leaves(tree)
                   if hasattr(x, "size")))
