"""Modality-combination algebra and elastic-configuration objects.

This module is the pure-Python "string algebra" that defines which fusion
modules exist and which are active.  It reproduces, behaviour-for-behaviour,
the semantics of the reference implementation's combination machinery
(reference: src/models2.py:9-82 ``Amn``/``AmnSum``/``ModalityStr``/
``gen_subnet`` and src/dynamic_models2.py:439-469 ``gen_active_cross``),
re-designed so that a configuration lowers to a pytree of on-device masks
(see :mod:`.masks`) instead of Python-side weight slicing.

Everything here runs on the host, outside of any jit trace.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Amn",
    "AmnSum",
    "ModalityStr",
    "gen_subnet",
    "ModelSpec",
    "ActiveConfig",
    "gen_active_cross",
    "full_active_config",
]


def Amn(m: int, n: int) -> int:
    """Number of n-permutations of m items: m!/(m-n)!.

    Parity oracle: reference src/models2.py:9-13.
    """
    result = 1
    for i in range(m, m - n, -1):
        result *= i
    return result


def AmnSum(m: int) -> int:
    """Sum over n=1..m of Amn(m, n); sizes the fused feature dimension
    ``combined_dim = AmnSum(M) * d`` (reference src/models2.py:15-19 and
    src/dynamic_models2.py:128)."""
    result = 0
    for n in range(1, m + 1):
        result += Amn(m, n)
    return result


class ModalityStr:
    """Algebra over modality-combination strings.

    A combination string like ``"tav"`` denotes a chain of crossmodal
    attention: stream ``tav``'s query comes from the stream named by its last
    char and its key/value from the stream named by the prefix
    (reference src/models2.py:152-153, src/dynamic_models2.py:239-240).

    Parity oracle: reference src/models2.py:21-74.  We keep the exact
    generation *order* (level by level; within a level, extensions follow
    ``modality_set`` order) because downstream slot indices depend on it.
    """

    def __init__(self, modality_set: Sequence[str]):
        self.modality_set = list(modality_set)

    def gen_modality_str(self, input_str: str) -> List[str]:
        """All one-char extensions of ``input_str`` by absent modalities."""
        return [input_str + ch for ch in self.modality_set if ch not in input_str]

    def gen_modality_str_all(self, modality_set: Optional[Sequence[str]] = None) -> List[str]:
        """All combination strings of length >= 2 reachable from the seed set,
        in level order (pairs before triples, ...)."""
        modality_str: List[str] = []
        if len(self.modality_set) == 1:
            return modality_str
        if modality_set is None:
            frontier = list(self.modality_set)
        else:
            assert not (len(modality_set) == len(self.modality_set) == 1)
            frontier = list(modality_set)
        while len(modality_str) == 0 or len(modality_str[-1]) < len(self.modality_set):
            nxt: List[str] = []
            for s in frontier:
                s1 = self.gen_modality_str(s)
                modality_str.extend(s1)
                nxt.extend(s1)
            if not nxt and not modality_str:
                # a seed of complete strings (every modality present, e.g.
                # ["ta"] at M=2) admits no extension: the reference's loop
                # (models2.py:67-74) never terminates on it.  No production
                # caller constructs such a seed; raise instead of hanging.
                raise ValueError(
                    f"gen_modality_str_all: seed {list(frontier) or modality_set} "
                    "admits no extensions (all strings complete)")
            frontier = nxt
        return modality_str

    def rand_gen_modality_str(
        self, modality_set: Sequence[str], p: float = 0.5, rng: Optional[np.random.Generator] = None
    ) -> List[str]:
        """Random chain growth: per level, keep each extension w.p. ``p``.

        Distribution-faithful port of reference src/models2.py:37-52 (uses a
        numpy Generator instead of torch RNG; bit-exact stream parity with
        torch is explicitly out of scope — see SURVEY.md §7 hard-part 3).
        """
        rng = rng if rng is not None else np.random.default_rng()
        modality_str: List[str] = []
        assert not (len(modality_set) == len(self.modality_set) == 1)
        frontier = list(modality_set)
        step = 1
        while step <= len(self.modality_set):
            nxt: List[str] = []
            for s in frontier:
                s_temp = self.gen_modality_str(s)
                probs = rng.random(len(s_temp))
                kept = [s_temp[i] for i in range(len(s_temp)) if probs[i] < p]
                modality_str.extend(kept)
                nxt.extend(kept)
            frontier = nxt
            step += 1
        return modality_str


def gen_subnet(parent_set: Sequence, p: float, rng: Optional[np.random.Generator] = None) -> List:
    """Bernoulli(p) subset of a list, order preserving.

    Parity oracle: reference src/models2.py:76-82 (duplicated at EA.py:13-19).
    """
    rng = rng if rng is not None else np.random.default_rng()
    probs = rng.random(len(parent_set))
    return [parent_set[i] for i in range(len(parent_set)) if probs[i] < p]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture of the supernet.  Frozen: defines parameter shapes
    and the static superset execution plan; never changes between steps.

    Mirrors the constructor surface of the reference supernet
    (src/dynamic_models2.py:95-199) minus runtime-active state.
    """

    modality_set: Tuple[str, ...]
    orig_dimensions: Tuple[int, ...]
    dimension: int                      # d: per-stream feature width
    num_heads: int                      # H
    head_dim: int                       # Dh
    layers_single_attn: int             # depth of per-modality mems0 stacks
    layers_cross_attn: int              # depth of cross stacks
    layers_self_attn: int               # depth of per-branch top stacks
    attn_dropout: Tuple[float, ...]     # len == M + 1 (per modality + top)
    relu_dropout: float
    res_dropout: float
    out_dropout: float
    embed_dropout: float
    attn_mask: bool
    output_dim: int
    all_steps: bool = False
    # attention implementation for eval-mode stacks: "xla" or "flash"
    # (Pallas fused kernel, ops/attention_pallas.py)
    attn_impl: str = "xla"
    # compute policy: "float32" (parity-exact) or "bfloat16" (params stay
    # f32 master copies; activations and matmul operands cast to bf16 at the
    # supernet_apply boundary — the TPU MXU's native training dtype).
    # Numerically-sensitive reductions (softmax, LayerNorm moments, loss)
    # stay f32 inside the ops.  Tolerance story: tests/test_bf16_policy.py.
    compute_dtype: str = "float32"
    # modality char -> projection-header kind (reference
    # src/dynamic_models2.py:141-146: 'i'/'A' -> CNN+RNN, 't' -> BERT+RNN,
    # else RNN).
    header_overrides: Optional[Dict[str, str]] = None

    def __post_init__(self):
        assert len(self.attn_dropout) == len(self.orig_dimensions) + 1, (
            "attn_dropout must have one entry per modality plus one for the top"
            " stacks (reference src/dynamic_models2.py:106)"
        )
        assert len(self.modality_set) == len(self.orig_dimensions)
        assert len(set(self.modality_set)) == len(self.modality_set)

    # ---- derived static structure ------------------------------------

    @property
    def modality_num(self) -> int:
        return len(self.modality_set)

    @property
    def embed_dim(self) -> int:
        """Inner attention width H*Dh (reference dynamic_multihead_attention.py:26)."""
        return self.num_heads * self.head_dim

    @property
    def ffn_dim(self) -> int:
        """FFN hidden width 4*H*Dh (reference dynamic_transformer.py:139)."""
        return 4 * self.embed_dim

    @property
    def combined_dim(self) -> int:
        return AmnSum(self.modality_num) * self.dimension

    @property
    def top_dim(self) -> int:
        """Per-branch top-stack width combined_dim / M (reference
        src/dynamic_models2.py:209)."""
        return self.combined_dim // self.modality_num

    @property
    def algebra(self) -> ModalityStr:
        return ModalityStr(self.modality_set)

    @property
    def cross_strings(self) -> Tuple[str, ...]:
        """All crossmodal combination strings, in construction order — one
        cross stack per string (reference src/dynamic_models2.py:156-157)."""
        return tuple(self.algebra.gen_modality_str_all())

    @property
    def slot_lists(self) -> Tuple[Tuple[str, ...], ...]:
        """Per-branch ordered stream slots ``[m_i] + chains(m_i)`` — the
        channel layout of the fused feature (reference
        src/dynamic_models2.py:166-171 ``modality_index_list``)."""
        out = []
        for ch in self.modality_set:
            out.append(tuple([ch] + self.algebra.gen_modality_str_all(modality_set=[ch])))
        return tuple(out)

    @property
    def n_slots(self) -> int:
        n = len(self.slot_lists[0])
        assert all(len(s) == n for s in self.slot_lists)
        assert n * self.dimension == self.top_dim or self.modality_num == 1
        return n

    def header_kind(self, ch: str) -> str:
        if self.header_overrides and ch in self.header_overrides:
            return self.header_overrides[ch]
        if ch in ("i", "A"):
            return "cnn_rnn"
        if ch == "t":
            return "bert_rnn"
        return "rnn"

    def cross_level_ranges(self) -> Tuple[Tuple[int, int], ...]:
        """Contiguous index ranges of ``cross_strings`` grouped by string
        length (the strings are generated level by level, so each level is a
        contiguous slab).  Each level depends only on base streams (queries)
        and the previous level (key/values), so a whole level executes as one
        vmapped batch of cross stacks — replacing the reference's serial
        per-branch module loop (src/dynamic_models2.py:237-240)."""
        ranges = []
        start = 0
        cs = self.cross_strings
        for i in range(1, len(cs) + 1):
            if i == len(cs) or len(cs[i]) != len(cs[start]):
                ranges.append((start, i))
                start = i
        return tuple(ranges)

    def stream_order(self) -> Tuple[str, ...]:
        """Topological evaluation order of all streams: base modalities first,
        then cross strings by generation order (prefixes always precede their
        extensions, matching the reference's per-branch execution order —
        src/dynamic_models2.py:239-240)."""
        return tuple(self.modality_set) + self.cross_strings

    def attn_dropout_for_cross(self, idx: int) -> float:
        """Reference quirk, replicated: the cross stack built at index 0 gets
        ``attn_dropout[0]``; all later cross stacks get 0.1
        (src/dynamic_models2.py:201-207 — ``get_network(i, i, mem=False)``
        hits the ``mod2 == 0`` branch only for i == 0)."""
        return self.attn_dropout[0] if idx == 0 else 0.1


@dataclasses.dataclass
class ActiveConfig:
    """One runtime configuration of the elastic supernet — the host-side,
    human-readable form.  Lowered to arrays by :func:`.masks.build_masks`.

    Field-for-field mirror of the reference's ``set_active`` surface
    (src/dynamic_models2.py:391-418).
    """

    active_modality: List[int]
    active_cross: List[List[str]]
    active_cross_output: List[List[str]]
    active_single_attn_layer_num: List[int]
    active_self_attn_layer_num: int
    active_hybrid_attn_layer_num: int
    active_dimension: int               # active FFN hidden width
    active_head_num: int
    active_head_dim: int

    def validate(self, spec: ModelSpec) -> None:
        M = spec.modality_num
        assert len(self.active_cross) == M and len(self.active_cross_output) == M
        assert len(self.active_single_attn_layer_num) == M
        assert 0 < self.active_head_num <= spec.num_heads
        assert 0 < self.active_head_dim <= spec.head_dim
        assert 0 < self.active_dimension <= spec.ffn_dim
        assert 0 <= self.active_self_attn_layer_num <= spec.layers_self_attn
        assert 0 <= self.active_hybrid_attn_layer_num <= spec.layers_cross_attn
        for n in self.active_single_attn_layer_num:
            assert 0 <= n <= spec.layers_single_attn
        cross_set = set(spec.cross_strings)
        enabled = set()
        for i in self.active_modality:
            for s in self.active_cross[i]:
                assert s in cross_set, f"unknown cross stream {s!r}"
                enabled.add(s)
        # every consumed stream must be produced: either a base modality, or
        # an enabled cross module whose own prefix chain is enabled (the
        # reference would raise KeyError otherwise: dynamic_models2.py:240).
        producible = set(spec.modality_set) | enabled
        for s in enabled:
            prefix = s[:-1]
            assert prefix in producible, (
                f"cross stream {s!r} consumes {prefix!r} which is not produced"
            )
        for i in self.active_modality:
            slots = set(spec.slot_lists[i])
            for s in self.active_cross_output[i]:
                assert s in slots, f"output stream {s!r} not a slot of branch {i}"
                assert s in producible, f"output stream {s!r} is not produced"


def gen_active_cross(
    spec: ModelSpec,
    active_modality: Sequence[int],
    p_cross: float = 0.6,
    p_cross_output: float = 0.8,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[List[str]], List[List[str]]]:
    """Random fusion-topology sampler.

    Distribution-faithful port of reference src/dynamic_models2.py:439-469,
    including the single-modality short-circuit and the repair pass that
    guarantees every active modality's information reaches some output.
    """
    rng = rng if rng is not None else np.random.default_rng()
    M = spec.modality_num
    active_cross: List[List[str]] = [[] for _ in range(M)]
    active_cross_output: List[List[str]] = [[] for _ in range(M)]
    active_modality = list(active_modality)

    if len(active_modality) == 1:
        i = active_modality[0]
        active_cross[i] = []
        active_cross_output[i] = [spec.modality_set[i]]
        return active_cross, active_cross_output

    m = ModalityStr([spec.modality_set[i] for i in active_modality])
    for i in active_modality:
        active_cross[i] = m.rand_gen_modality_str(
            modality_set=[spec.modality_set[i]], p=p_cross, rng=rng
        )
        r = [spec.modality_set[i]] + list(active_cross[i])
        active_cross_output[i] = gen_subnet(r, p=p_cross_output, rng=rng)

    # repair: if branch i emits nothing and no other branch's outputs contain
    # modality i's char, force one output for branch i
    # (reference src/dynamic_models2.py:455-467).
    for i in active_modality:
        if not active_cross_output[i]:
            covered = False
            for j in active_modality:
                if any(spec.modality_set[i] in a for a in active_cross_output[j]):
                    covered = True
                    break
            if not covered:
                active_cross_output[i] = [
                    active_cross[i][0] if active_cross[i] else spec.modality_set[i]
                ]
    return active_cross, active_cross_output


def full_active_config(spec: ModelSpec, ffn_active_dim: Optional[int] = None) -> ActiveConfig:
    """The canonical full-MulT topology used for validation/test passes
    (reference src/train.py:463-474): every modality active, cross chains =
    all one-char extensions, outputs = self stream plus those chains.

    ``ffn_active_dim`` defaults to ``spec.dimension``, replicating the
    reference quirk that ``set_active(active_dimension=hyp_params.dimension)``
    keeps only ``d`` of the ``4*H*Dh`` FFN units active (train.py:103,129).
    """
    m = spec.algebra
    M = spec.modality_num
    if M > 1:
        cross = [m.gen_modality_str(c) for c in spec.modality_set]
        cross_out = [[c] + m.gen_modality_str(c) for c in spec.modality_set]
    else:
        cross = [[]]
        cross_out = [[spec.modality_set[0]]]
    return ActiveConfig(
        active_modality=list(range(M)),
        active_cross=cross,
        active_cross_output=cross_out,
        active_single_attn_layer_num=[spec.layers_single_attn] * M,
        active_self_attn_layer_num=spec.layers_self_attn,
        active_hybrid_attn_layer_num=spec.layers_cross_attn,
        active_dimension=ffn_active_dim if ffn_active_dim is not None else spec.dimension,
        active_head_num=spec.num_heads,
        active_head_dim=spec.head_dim,
    )
