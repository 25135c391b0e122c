"""Checkpointing + reference-format interop.

Native path: orbax pytree checkpoints of the full param tree (the reference
pickles the whole model on best validation, train.py:508-511, and resumes by
unpickling — src/train.py:31-33).

Interop path: the reference's ``state_dict`` naming is the exchange format
(SURVEY.md §5 checkpoint/resume).  ``export_torch_state_dict`` maps our mask-
era param pytree onto the reference's exact parameter names/shapes, and
``import_torch_state_dict`` goes the other way — so a parent trained on
either stack can be evaluated/extended on the other.  ``load_reference_pickle``
additionally unpickles a reference whole-model checkpoint (with import stubs
for its missing deps) and extracts the state_dict.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSpec
from .models.mult import SupernetParams


# --------------------------------------------------------------------- orbax

# process-wide async writer (cli --async_ckpt): orbax copies device arrays
# to host SYNCHRONOUSLY inside save() (so training may immediately rebind /
# donate the buffers) and serializes + writes in background threads —
# measured 3.5-6 s of host work per MOSEI-size training-state save vs the
# 0.66 s flagship epoch, i.e. per-epoch checkpointing would otherwise be
# ~85% of wall-clock
_async_ckptr = None


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.
    Called automatically before restores and new async saves; call it
    before process exit if the last save used ``block=False``."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()

def save_checkpoint(path: str, params, extra: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"params": params}
    if extra:
        tree["extra"] = extra
    ckptr.save(path, tree, force=True)


def load_checkpoint(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    params = tree["params"]
    if isinstance(params, dict) and set(params.keys()) == set(SupernetParams._fields):
        params = SupernetParams(**{k: params[k] for k in SupernetParams._fields})
    return params, tree.get("extra")


# ------------------------------------------------------------ exact resume

def save_training_state(path: str, trainer, block: bool = True) -> None:
    """Full-fidelity training checkpoint: params + optimizer moments +
    device key (orbax) and scheduler/host-RNG/curve state (sidecar json).
    ``restore_training_state`` continues the run EXACTLY (bit-equal on the
    same hardware — tests/test_resume.py).  The reference keeps only the
    pickled model and restarts optimization on resume (train.py:31-33).

    ``block=False`` (cli ``--async_ckpt``): serialization and disk I/O run
    in background threads; only the device->host copy happens here, so the
    epoch loop is free to continue (and to donate the old buffers).  A new
    save or a restore first waits for the previous one; call
    :func:`wait_for_saves` before process exit.  Crash caveat: orbax
    commits the array directory atomically, but the sidecar json is
    written immediately — a crash mid-write can leave a fresh json beside
    no/old arrays, which restore reports as an error rather than silently
    mixing states."""
    import json

    import orbax.checkpoint as ocp

    arrays, meta = trainer.training_state()
    path = os.path.abspath(path)
    tree = {"params": trainer.params, **arrays}
    if block:
        ocp.PyTreeCheckpointer().save(path, tree, force=True)
    else:
        ck = _async_checkpointer()
        ck.wait_until_finished()  # serialize with any in-flight save
        ck.save(path, tree, force=True)
    # the restore side builds its template from this list — never from a
    # try/except probe that could mask a real restore error
    meta = dict(meta, saved_keys=sorted(arrays))
    with open(path + ".train.json", "w") as f:
        json.dump(meta, f)


def restore_training_state(path: str, trainer) -> int:
    """Restore a :func:`save_training_state` checkpoint into ``trainer``.
    Returns the epoch to continue from (1-based).  Restores ONTO the
    trainer's live pytrees so namedtuple/optax structures round-trip
    orbax's dict-ification intact."""
    import json

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from .config import full_active_config
    from .masks import build_masks

    path = os.path.abspath(path)
    wait_for_saves()  # an async save of this very path may be in flight
    with open(path + ".train.json") as f:
        meta = json.load(f)
    template = jax.tree.map(np.asarray,
                            {"params": trainer.params,
                             "opt_state": trainer.opt_state,
                             "key": trainer._key,
                             "carry_masks": build_masks(
                                 trainer.spec,
                                 full_active_config(trainer.spec))})
    # which non-param keys the checkpoint holds: the meta manifest
    # (current format), else orbax's own tree metadata for checkpoints
    # saved before the manifest existed — NOT a bare try/except, which
    # would both mask real restore errors (I/O, opt_state shape mismatch
    # after an --optim change) and silently drop carry_masks
    if "saved_keys" in meta:
        on_disk = set(meta["saved_keys"])
    else:
        on_disk = set(
            ocp.PyTreeCheckpointer().metadata(path).item_metadata.keys())
    for k in set(template) - on_disk - {"params"}:
        template.pop(k)
    tree = ocp.PyTreeCheckpointer().restore(path, item=template)
    trainer.params = tree["params"]
    trainer.load_training_state(
        {k: tree[k] for k in ("opt_state", "key", "carry_masks")
         if k in tree}, meta)
    return len(trainer.training_curve) + 1


# ------------------------------------------------- torch state-dict mapping

def _rnn_names(prefix: str, rnn: dict, out: Dict[str, np.ndarray]) -> None:
    for torch_g, ours in (("lstm1", "gru1"), ("lstm2", "gru2")):
        for torch_s, dirn in (("", "fwd"), ("_reverse", "bwd")):
            p = rnn[ours][dirn]
            out[f"{prefix}.{torch_g}.weight_ih_l0{torch_s}"] = p["w_ih"]
            out[f"{prefix}.{torch_g}.weight_hh_l0{torch_s}"] = p["w_hh"]
            out[f"{prefix}.{torch_g}.bias_ih_l0{torch_s}"] = p["b_ih"]
            out[f"{prefix}.{torch_g}.bias_hh_l0{torch_s}"] = p["b_hh"]


def _encoder_names(prefix: str, enc: dict, spec: ModelSpec,
                   out: Dict[str, np.ndarray]) -> None:
    L = enc["layers"]["ln0"]["g"].shape[0]
    e = spec.embed_dim
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], enc["layers"])
        p = f"{prefix}.layers.{l}"
        e_in = lp["attn"]["in_proj_w"].shape[-1]
        out[f"{p}.self_attn.in_proj_weight"] = np.asarray(
            lp["attn"]["in_proj_w"]).reshape(3 * e, e_in)
        out[f"{p}.self_attn.in_proj_bias"] = np.asarray(
            lp["attn"]["in_proj_b"]).reshape(3 * e)
        out[f"{p}.self_attn.out_proj.weight"] = np.asarray(
            lp["attn"]["out_w"]).reshape(-1, e)
        out[f"{p}.self_attn.out_proj.bias"] = np.asarray(lp["attn"]["out_b"])
        out[f"{p}.fc1.l.weight"] = np.asarray(lp["fc1"]["w"])
        out[f"{p}.fc1.l.bias"] = np.asarray(lp["fc1"]["b"])
        out[f"{p}.fc2.l.weight"] = np.asarray(lp["fc2"]["w"])
        out[f"{p}.fc2.l.bias"] = np.asarray(lp["fc2"]["b"])
        out[f"{p}.layer_norms.0.ln.weight"] = np.asarray(lp["ln0"]["g"])
        out[f"{p}.layer_norms.0.ln.bias"] = np.asarray(lp["ln0"]["b"])
        out[f"{p}.layer_norms.1.ln.weight"] = np.asarray(lp["ln1"]["g"])
        out[f"{p}.layer_norms.1.ln.bias"] = np.asarray(lp["ln1"]["b"])
    out[f"{prefix}.layer_norm.ln.weight"] = np.asarray(enc["ln"]["g"])
    out[f"{prefix}.layer_norm.ln.bias"] = np.asarray(enc["ln"]["b"])


def export_torch_state_dict(spec: ModelSpec, params: SupernetParams
                            ) -> Dict[str, np.ndarray]:
    """Our pytree -> reference parameter names (reference module tree:
    src/dynamic_models2.py:138-180).  The frozen BERT instances and the dead
    model-level ``embedding`` BERT are not exported (the reference freezes
    them; they are reconstruction-time assets, not learned state)."""
    out: Dict[str, np.ndarray] = {}
    M = spec.modality_num
    for i, ch in enumerate(spec.modality_set):
        kind = spec.header_kind(ch)
        hp = params.proj[i]
        # Sequential member indices per header kind
        # (dynamic_models2.py:141-146)
        if kind == "cnn_rnn":
            out[f"proj.{i}.0.cnn1.weight"] = np.asarray(hp["cnn"]["w"])
            _rnn_names(f"proj.{i}.1", hp["rnn"], out)
        elif kind == "bert_rnn":
            _rnn_names(f"proj.{i}.1", hp["rnn"], out)
        else:
            _rnn_names(f"proj.{i}.0", hp["rnn"], out)
    for i, ch in enumerate(spec.modality_set):
        _encoder_names(f"trans_mems0.mems0{ch}",
                       jax.tree.map(lambda a: a[i], params.mems0), spec, out)
    for j, s in enumerate(spec.cross_strings):
        _encoder_names(f"trans.cross{s}",
                       jax.tree.map(lambda a: a[j], params.cross), spec, out)
        out[f"translation.translation{s}.weight"] = np.asarray(
            params.translation["w"][j])
        out[f"translation.translation{s}.bias"] = np.asarray(
            params.translation["b"][j])
    for i, ch in enumerate(spec.modality_set):
        _encoder_names(f"trans_mems.mems{ch}",
                       jax.tree.map(lambda a: a[i], params.mems), spec, out)
    for name, lin in (("proj1", params.proj1), ("proj2", params.proj2),
                      ("out_layer", params.out_layer)):
        out[f"{name}.l.weight"] = np.asarray(lin["w"])
        out[f"{name}.l.bias"] = np.asarray(lin["b"])
    return out


def _rnn_from_sd(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    rnn = {}
    for torch_g, ours in (("lstm1", "gru1"), ("lstm2", "gru2")):
        rnn[ours] = {}
        for torch_s, dirn in (("", "fwd"), ("_reverse", "bwd")):
            rnn[ours][dirn] = {
                "w_ih": jnp.asarray(sd[f"{prefix}.{torch_g}.weight_ih_l0{torch_s}"]),
                "w_hh": jnp.asarray(sd[f"{prefix}.{torch_g}.weight_hh_l0{torch_s}"]),
                "b_ih": jnp.asarray(sd[f"{prefix}.{torch_g}.bias_ih_l0{torch_s}"]),
                "b_hh": jnp.asarray(sd[f"{prefix}.{torch_g}.bias_hh_l0{torch_s}"]),
            }
    return rnn


def _encoder_from_sd(sd: Dict[str, np.ndarray], prefix: str, spec: ModelSpec,
                     layers: int) -> dict:
    H, Dh = spec.num_heads, spec.head_dim
    per_layer = []
    for l in range(layers):
        p = f"{prefix}.layers.{l}"
        w_in = np.asarray(sd[f"{p}.self_attn.in_proj_weight"])
        e_in = w_in.shape[1]
        per_layer.append({
            "attn": {
                "in_proj_w": jnp.asarray(w_in.reshape(3, H, Dh, e_in)),
                "in_proj_b": jnp.asarray(
                    np.asarray(sd[f"{p}.self_attn.in_proj_bias"]).reshape(3, H, Dh)),
                "out_w": jnp.asarray(
                    np.asarray(sd[f"{p}.self_attn.out_proj.weight"]).reshape(e_in, H, Dh)),
                "out_b": jnp.asarray(sd[f"{p}.self_attn.out_proj.bias"]),
            },
            "fc1": {"w": jnp.asarray(sd[f"{p}.fc1.l.weight"]),
                    "b": jnp.asarray(sd[f"{p}.fc1.l.bias"])},
            "fc2": {"w": jnp.asarray(sd[f"{p}.fc2.l.weight"]),
                    "b": jnp.asarray(sd[f"{p}.fc2.l.bias"])},
            "ln0": {"g": jnp.asarray(sd[f"{p}.layer_norms.0.ln.weight"]),
                    "b": jnp.asarray(sd[f"{p}.layer_norms.0.ln.bias"])},
            "ln1": {"g": jnp.asarray(sd[f"{p}.layer_norms.1.ln.weight"]),
                    "b": jnp.asarray(sd[f"{p}.layer_norms.1.ln.bias"])},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return {"layers": stacked,
            "ln": {"g": jnp.asarray(sd[f"{prefix}.layer_norm.ln.weight"]),
                   "b": jnp.asarray(sd[f"{prefix}.layer_norm.ln.bias"])}}


def import_torch_state_dict(spec: ModelSpec, sd: Dict[str, np.ndarray]
                            ) -> SupernetParams:
    """Reference parameter names -> our pytree.  Inverse of
    :func:`export_torch_state_dict` (round-trip tested)."""
    proj = []
    for i, ch in enumerate(spec.modality_set):
        kind = spec.header_kind(ch)
        if kind == "cnn_rnn":
            proj.append({"cnn": {"w": jnp.asarray(sd[f"proj.{i}.0.cnn1.weight"])},
                         "rnn": _rnn_from_sd(sd, f"proj.{i}.1")})
        elif kind == "bert_rnn":
            proj.append({"rnn": _rnn_from_sd(sd, f"proj.{i}.1")})
        else:
            proj.append({"rnn": _rnn_from_sd(sd, f"proj.{i}.0")})
    mems0 = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        _encoder_from_sd(sd, f"trans_mems0.mems0{ch}", spec,
                         spec.layers_single_attn)
        for ch in spec.modality_set])
    cross = None
    if spec.cross_strings:
        cross = jax.tree.map(lambda *xs: jnp.stack(xs), *[
            _encoder_from_sd(sd, f"trans.cross{s}", spec, spec.layers_cross_attn)
            for s in spec.cross_strings])
    mems = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        _encoder_from_sd(sd, f"trans_mems.mems{ch}", spec, spec.layers_self_attn)
        for ch in spec.modality_set])
    translation = {
        "w": jnp.stack([jnp.asarray(sd[f"translation.translation{s}.weight"])
                        for s in spec.cross_strings]),
        "b": jnp.stack([jnp.asarray(sd[f"translation.translation{s}.bias"])
                        for s in spec.cross_strings]),
    } if spec.cross_strings else {"w": jnp.zeros((1, spec.dimension, spec.dimension)),
                                  "b": jnp.zeros((1, spec.dimension))}
    return SupernetParams(
        proj=tuple(proj), mems0=mems0, cross=cross, mems=mems,
        translation=translation,
        proj1={"w": jnp.asarray(sd["proj1.l.weight"]),
               "b": jnp.asarray(sd["proj1.l.bias"])},
        proj2={"w": jnp.asarray(sd["proj2.l.weight"]),
               "b": jnp.asarray(sd["proj2.l.bias"])},
        out_layer={"w": jnp.asarray(sd["out_layer.l.weight"]),
                   "b": jnp.asarray(sd["out_layer.l.bias"])})


def load_reference_pickle(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a reference whole-model checkpoint (torch.save(model) at
    train.py:510) and return its state_dict as numpy.  Requires the reference
    tree on disk; stubs its unimportable deps."""
    import sys
    import types

    if "/root/reference" not in sys.path and os.path.isdir("/root/reference"):
        sys.path.insert(0, "/root/reference")
    for name in ("torchvision", "torchvision.transforms", "torchvision.models",
                 "fannypack"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            import importlib.machinery

            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
    import torch

    model = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
