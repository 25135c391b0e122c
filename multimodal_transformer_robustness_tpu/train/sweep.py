"""Missing-modality robustness sweep — the reference's headline evaluation
(``test_missing_modality``, src/train.py:250-405) re-designed as a batched,
device-parallel grid.

The reference runs, for every modality subset, a nested serial grid of FULL
validation passes: (depth-combinations × candidate fusion topologies) many
epochs of inference on one GPU.  Here every (depth, topology) candidate is a
mask pytree; candidates stack along a leading config axis and evaluate as ONE
vmapped forward per data batch (optionally sharded across devices on the
'cfg' mesh axis), so a subset's whole grid costs about one validation pass.

The candidate enumeration replicates train.py:270-358 exactly, including the
hand-enumerated 13 two-modality topology variants (with their duplicates) and
the per-experiment depth rules.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ActiveConfig, ModalityStr, ModelSpec
from ..masks import build_masks, stack_masks
from ..metrics import eval_mosei_senti


def two_modality_candidates(m0: str, m1: str) -> List[Dict[str, List[str]]]:
    """The 13 hand-enumerated active_cross_output variants for a 2-modality
    subset under random_sample (train.py:283-344), in order, as
    modality-char -> output-stream lists."""
    a, b = m0, m1
    combos = [
        {a: [a], b: [b]},                     # 1
        {a: [a, a + b]},                      # 2
        {b: [b, b + a]},                      # 3
        {a: [a + b], b: [b]},                 # 4
        {a: [a], b: [b + a]},                 # 5
        {a: [a + b]},                         # 6
        {b: [b + a]},                         # 7
        {a: [a + b], b: [b + a]},             # 8
        {a: [a, a + b], b: [b + a]},          # 9
        {a: [a + b], b: [b, b + a]},          # 10
        {a: [a, a + b], b: [b, b + a]},       # 11
        {b: [b + a]},                         # 12 (dup of 7, kept verbatim)
        {a: [a + b]},                         # 13 (dup of 6, kept verbatim)
    ]
    return combos


def enumerate_subset_candidates(
    spec: ModelSpec,
    experiment_type: str,
    active_modality: Tuple[int, ...],
    specific=None,
) -> Tuple[List[List[str]], List[List[List[str]]]]:
    """Returns (canonical active_cross, list of candidate
    active_cross_output) for one subset — train.py:270-350."""
    M = spec.modality_num
    chars = [spec.modality_set[j] for j in active_modality]
    m = ModalityStr(chars)
    active_cross: List[List[str]] = [[] for _ in range(M)]
    canonical: List[List[str]] = [[] for _ in range(M)]
    for k, j in enumerate(active_modality):
        r = m.gen_modality_str(chars[k])
        active_cross[j] = list(r)
        canonical[j] = list(r) if r else [chars[k]]

    candidates: List[List[List[str]]] = []
    if len(active_modality) == 2 and experiment_type == "random_sample":
        char_map = {chars[0]: active_modality[0], chars[1]: active_modality[1]}
        for combo in two_modality_candidates(chars[0], chars[1]):
            a = [[] for _ in range(M)]
            for ch, streams in combo.items():
                a[char_map[ch]] = streams
            candidates.append(a)
    elif len(active_modality) > 1 and experiment_type == "test_single":
        if specific is not None:
            candidates.append(specific[1])
    else:
        candidates.append(canonical)
    return active_cross, candidates


def depth_combos(spec: ModelSpec, experiment_type: str) -> List[List[int]]:
    """train.py:279,352-358."""
    M = spec.modality_num
    if experiment_type in ("baseline_ic", "test_single"):
        return [[spec.layers_single_attn] * M]
    if experiment_type in ("baseline_ia", "baseline_ib"):
        return [[0] * M]
    return [list(c) for c in itertools.combinations_with_replacement(
        range(spec.layers_single_attn + 1), M)]


def subset_choices(spec: ModelSpec, experiment_type: str) -> List[Tuple[int, ...]]:
    """train.py:253-262: all subsets sizes >=1 (>=2 for baseline_ib)."""
    M = spec.modality_num
    lo = 2 if experiment_type == "baseline_ib" else 1
    out: List[Tuple[int, ...]] = []
    for i in range(lo, M + 1):
        out.extend(itertools.combinations(range(M), i))
    return out


def upload_eval_batches(loader, mesh=None):
    """Pre-upload a loader's batches to device for reuse across sweep calls
    (returns the structure the sweep functions consume).  With a mesh the
    inputs replicate across it so the step wrappers' device_put is a no-op."""
    if mesh is not None:
        from ..parallel.mesh import replicate

        up = lambda x: replicate(jnp.asarray(x), mesh)
    else:
        up = jnp.asarray
    return [([up(x) for x in b.inputs], b.valid > 0,
             np.asarray(b.labels)[b.valid > 0]) for b in loader]


def missing_modality_sweep(
    trainer,
    valid_loader,
    test_loader,
    *,
    specific=None,
    max_cfg_chunk: int = 64,
    quiet: bool = False,
    device_batches=None,
    device_test=None,
) -> Dict[Tuple[int, ...], Dict]:
    """Run the full sweep.  ``trainer`` is a :class:`..train.loop.Trainer`.

    For each modality subset: build the (depth × topology) candidate masks,
    stack them, evaluate ALL of them per data batch with the trainer's
    vmapped ``eval_step_batched``, pick the best on valid, re-evaluate it on
    test, and print the reference's per-subset metric block
    (train.py:376-404).  When the trainer carries a mesh, the config axis
    shards across its devices inside ``eval_step_sweep``."""
    spec = trainer.spec
    hp = trainer.hp
    M = spec.modality_num
    results: Dict[Tuple[int, ...], Dict] = {}

    # upload the validation AND test sets to device ONCE: every (subset,
    # chunk) pair re-reads the same batches, and re-transferring them
    # dominates wall-clock on a remote-tunnel TPU.  Callers running repeated
    # sweeps pass pre-uploaded batches via upload_eval_batches().
    if device_batches is None:
        device_batches = upload_eval_batches(valid_loader, trainer.mesh)
    if device_test is None:
        device_test = upload_eval_batches(test_loader, trainer.mesh)
    full_flags = jnp.ones((M,), jnp.float32)

    def eval_single(masks_np, batches):
        dev_masks = jax.tree.map(jnp.asarray, masks_np)
        preds, keeps, labels = [], [], []
        for inputs, keep, lab in batches:
            # on-device accumulation, one readback (see the grid loop below)
            preds.append(trainer.eval_step(trainer.params, dev_masks, inputs,
                                           full_flags))
            keeps.append(keep)
            labels.append(lab)
        return (np.asarray(jnp.concatenate(preds))[np.concatenate(keeps)],
                np.concatenate(labels))

    for subset in subset_choices(spec, hp.experiment_type):
        if not quiet:
            print([spec.modality_set[j] for j in subset], ": { ")
        active_cross, candidates = enumerate_subset_candidates(
            spec, hp.experiment_type, subset, specific)
        if not quiet:
            print("Possible Active Cross: ", candidates)
        lays = depth_combos(spec, hp.experiment_type)

        cfgs: List[ActiveConfig] = []
        for l in lays:
            for a in candidates:
                cfgs.append(ActiveConfig(
                    active_modality=list(subset),
                    active_cross=[list(x) for x in active_cross],
                    active_cross_output=[list(x) for x in a],
                    active_single_attn_layer_num=list(l),
                    active_self_attn_layer_num=spec.layers_self_attn,
                    active_hybrid_attn_layer_num=spec.layers_cross_attn,
                    active_dimension=spec.dimension,
                    active_head_num=spec.num_heads,
                    active_head_dim=spec.head_dim))
        mask_list = [build_masks(spec, c) for c in cfgs]
        # pad the config list to a chunk multiple (repeating the last config)
        # so the device-side lax.map chunking has ONE static shape
        n_real = len(mask_list)
        trainer.cfg_chunk = max_cfg_chunk  # static jit arg of
        #                                     eval_step_sweep's lax.map
        chunk = max_cfg_chunk
        if n_real % chunk and n_real > chunk:
            mask_list = mask_list + [mask_list[-1]] * (chunk - n_real % chunk)

        # evaluate ALL candidates on valid with full-modality zero-fill flags
        # (the reference zero-fills nothing here: activate_modality covers
        # all — structural masking does the work, train.py:370); the whole
        # subset grid stacks into ONE device pytree and evaluates in ONE
        # dispatch per data batch (lax.map chunks it device-side; under a
        # trainer mesh eval_step_sweep instead shards the config axis over
        # the devices — prep places the grid ONCE for all data batches)
        stacked = trainer.prep_sweep_masks(stack_masks(mask_list))
        accs = np.zeros((n_real,), np.float64)
        # keep predictions ON DEVICE through the data loop (async
        # dispatches) and read back ONCE — a per-batch np.asarray is a
        # blocking ~35 ms tunnel round-trip (the evaluate() fix,
        # train/loop.py, applied to the sweep grid)
        per_batch_preds: List[jnp.ndarray] = []
        keeps: List[np.ndarray] = []
        truths: List[np.ndarray] = []
        for inputs, keep, labels in device_batches:
            preds = trainer.eval_step_sweep(
                trainer.params, stacked, inputs, full_flags)  # [n_cfg, B, ...]
            per_batch_preds.append(preds)
            keeps.append(keep)
            truths.append(labels)
        truth = np.concatenate(truths)
        all_preds = np.asarray(jnp.concatenate(per_batch_preds, axis=1)
                               )[:, np.concatenate(keeps)]  # [n_cfg, N, ...]
        for k in range(n_real):
            accs[k] = trainer._metric(all_preds[k], truth)

        best = int(np.argmax(accs))
        best_cfg = cfgs[best]
        if not quiet:
            print("best self atten layer number: ",
                  best_cfg.active_single_attn_layer_num,
                  best_cfg.active_cross_output,
                  "best validation accuracy: ", accs[best])

        test_preds, test_truths = eval_single(mask_list[best], device_test)
        test_acc = trainer._metric(test_preds, test_truths)
        entry = {"best_cfg": best_cfg, "valid_acc": float(accs[best]),
                 "test_acc": float(test_acc)}
        if hp.dataset == "mosei_senti":
            entry["metrics"] = eval_mosei_senti(test_preds, test_truths, True,
                                                quiet=quiet)
        elif hp.dataset == "mojupush":
            if not quiet:
                print("MSE: ", -test_acc)
        else:
            if not quiet:
                print("acc: ", test_acc)
        if not quiet:
            print("},")
        results[subset] = entry
    if not quiet:
        print("}")
    return results


def masking_inputs_sweep(trainer, test_loader, quiet: bool = False) -> Dict:
    """The baseline_ia alternative: keep the full network, zero-fill inputs
    per subset including the empty set (train.py:407-434)."""
    from ..config import full_active_config

    spec = trainer.spec
    M = spec.modality_num
    full_masks = build_masks(spec, full_active_config(spec))
    choices: List[Tuple[int, ...]] = [()]
    for i in range(1, M + 1):
        choices.extend(itertools.combinations(range(M), i))
    results = {}
    for subset in choices:
        if not quiet:
            print([spec.modality_set[j] for j in subset], ": { ")
        acc, preds, truths = trainer.evaluate(test_loader, full_masks, list(subset))
        if trainer.hp.dataset == "mosei_senti":
            results[subset] = eval_mosei_senti(preds, truths, True, quiet=quiet)
        else:
            results[subset] = {"acc": acc}
            if not quiet:
                print("acc: ", acc)
        if not quiet:
            print("},")
    if not quiet:
        print("}")
    return results
