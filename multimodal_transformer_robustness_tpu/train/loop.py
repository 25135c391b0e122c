"""Training / evaluation engine.

Mirrors the behaviour of reference src/train.py (``initiate`` /
``train_model`` with nested ``train`` / ``evaluate``), re-designed for TPU:

  * ONE jitted ``train_step`` (forward + loss + global-norm clip + adam)
    serves every elastic configuration — the per-batch sampled config enters
    as a mask pytree, never as new Python structure, so there is exactly one
    compilation per input shape.
  * the reference's off-by-one quirk is replicated: the configuration
    sampled at batch i is applied at batch i+1 (train.py:92-182 samples
    between forward and backward, after autograd already recorded the graph).
  * ``ReduceLROnPlateau`` + lr-floor early stop + best-validation
    checkpointing follow train.py:436-513 (including the random_sample
    validation metric being (M+1) identical full-topology evals — the
    per-modality configs built at train.py:447-448 are shadowed at :458).
  * missing-modality evaluation zero-fills inactive inputs (train.py:218)
    via a traced [M] flag vector — no retrace per subset.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelSpec, full_active_config
from ..masks import SupernetMasks, build_masks
from ..metrics import binary_acc, multiclass_acc
from ..models import supernet_apply
from ..models.bert import BertConfig
from .sampling import sample_train_config


@dataclasses.dataclass
class TrainHParams:
    """The reference's hyp_params surface (main.py:12-86) minus dataset
    plumbing."""

    batch_size: int = 16
    lr: float = 1e-3
    optim: str = "Adam"
    clip: float = 1.0
    num_epochs: int = 50
    when: int = 10                       # plateau patience
    experiment_type: str = "random_sample"
    modality_pool: Optional[Sequence[Sequence[int]]] = None
    all_module: bool = False
    specific: Optional[list] = None
    criterion: str = "L1Loss"
    log_interval: int = 360
    seed: int = 1111
    dataset: str = "mosei_senti"
    model_path: Optional[str] = None
    # gradient accumulation: split each batch into this many chunks, one
    # backward per chunk, ONE optimizer step on the validity-weighted summed
    # gradients (exactly equal to the unchunked gradients).  The reference
    # defines --batch_chunk but never reads it (main.py:69); here it is real
    # and makes large-batch runs memory-safe.
    batch_chunk: int = 1


def make_criterion(name: str) -> Callable:
    """Valid-row-weighted batch loss (tail batches are padded; weighting by
    the validity mask reproduces the reference's plain mean over real rows)."""
    if name == "L1Loss":
        def loss(preds, labels, valid):
            per = jnp.abs(preds - labels).mean(axis=tuple(range(1, preds.ndim)))
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss
    if name == "MSELoss":
        def loss(preds, labels, valid):
            per = jnp.square(preds - labels).mean(axis=tuple(range(1, preds.ndim)))
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss
    if name == "CrossEntropyLoss":
        def loss(preds, labels, valid):
            per = optax.softmax_cross_entropy_with_integer_labels(
                preds, labels.astype(jnp.int32))
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss
    raise NotImplementedError(name)


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau(mode='min',
    patience=when, factor=0.1) with torch defaults (threshold 1e-4 rel)."""

    def __init__(self, lr: float, patience: int, factor: float = 0.1,
                 threshold: float = 1e-4):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr


def _zero_fill(inputs: List[jnp.ndarray], flags: jnp.ndarray,
               fill_rows: Optional[dict] = None) -> List[jnp.ndarray]:
    """Zero-out modalities whose flag is 0 (train.py:218 replaces missing
    inputs by zero tensors).  Works for float features and int token ids
    (zeros == pad id).

    ``fill_rows`` (modality index -> [.., feat] row) substitutes a
    precomputed row instead of zeros: the cached-text pipeline
    (train/features.py) must reproduce what the online pipeline computes
    from a ZERO-TOKEN input — BERT(zeros), which is non-zero."""
    out = []
    for i, x in enumerate(inputs):
        y = x * flags[i].astype(x.dtype)
        if fill_rows and i in fill_rows:
            row = jnp.asarray(fill_rows[i]).astype(x.dtype)
            y = y + (1.0 - flags[i]).astype(x.dtype) * row[None]
        out.append(y.astype(x.dtype))
    return out


class _SweepMasks(NamedTuple):
    """A stacked config-mask pytree placed once by
    :meth:`Trainer.prep_sweep_masks` (``n`` = real config count before
    mesh padding; None on the unmeshed path)."""

    tree: object
    n: Optional[int]


class Trainer:
    """Builds the jitted step functions and runs the reference's experiment
    loop.  ``initiate``-equivalent: construct with spec/params, call
    :meth:`fit`."""

    #: torch.optim name -> optax factory (the reference resolves the --optim
    #: flag with getattr(torch.optim, name), train.py:51 — so every non-lr
    #: hyperparameter must be the TORCH default; see train/optim.py for the
    #: optax-vs-torch default mismatches this table corrects and
    #: tests/test_optim_parity.py for the per-optimizer torch parity oracle)
    from .optim import TORCH_DEFAULT_OPTIMIZERS as OPTIMIZERS

    def __init__(self, spec: ModelSpec, params, frozen: dict,
                 hp: TrainHParams, bert_cfg: Optional[BertConfig] = None,
                 zero_fill_rows: Optional[dict] = None, mesh=None):
        """``zero_fill_rows``: per-modality substitute rows for missing-
        modality eval when that modality's input is precomputed features
        (CachedTextDataset.zero_fill_rows()) — see _zero_fill.

        ``mesh``: optional ``jax.sharding.Mesh`` (CLI ``--mesh``): params and
        optimizer moments shard per ``parallel.mesh.supernet_param_spec``
        (tensor parallelism over the ``mp`` axis if present), batches shard
        over ``dp`` in the step wrappers, and the sweep/EA config axis shards
        over ALL mesh axes in :meth:`eval_step_sweep`.  The reference is
        single-GPU (SURVEY §2.7); this is the TPU build's scaling axis."""
        assert hp.optim in self.OPTIMIZERS, (
            f"unknown optimizer {hp.optim!r}; known: {sorted(self.OPTIMIZERS)}")
        self.spec = spec
        self.hp = hp
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate, shard_supernet_params

            params = shard_supernet_params(params, mesh)
            frozen = replicate(frozen, mesh)
            zero_fill_rows = ({i: jax.device_put(
                jnp.asarray(r, jnp.float32),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
                for i, r in zero_fill_rows.items()}
                if zero_fill_rows else zero_fill_rows)
        self.frozen = frozen
        self.bert_cfg = bert_cfg
        # device-resident closure constants (~L*H floats — small)
        self._fill_rows = {i: jnp.asarray(r, jnp.float32)
                           for i, r in (zero_fill_rows or {}).items()} or None
        self.criterion = make_criterion(hp.criterion)
        self.scheduler = ReduceLROnPlateau(hp.lr, patience=hp.when)
        self.tx = optax.inject_hyperparams(self._make_tx)(learning_rate=hp.lr)
        self.params = params
        self.opt_state = self.tx.init(params)
        if mesh is not None:
            # moment trees mirror the param tree's leaf paths, so the same
            # path-matching spec rule shards them consistently (eager
            # zeros_like already inherits shardings; this pins it explicitly)
            from ..parallel.mesh import shard_supernet_params

            self.opt_state = shard_supernet_params(self.opt_state, mesh)
        self.rng = np.random.default_rng(hp.seed)
        self._key = jax.random.PRNGKey(hp.seed)
        self.training_curve: List[List[float]] = []
        self.best_valid = -1e8  # tracked across fit() calls for exact resume
        # the mask config carried across epoch boundaries by fit() (e.g.
        # test_single trains under eval_masks from epoch 2 on); part of the
        # exact-resume state — without it a resumed test_single run's first
        # batch would train under full_masks (ADVICE r2 #1)
        self._carry_masks: Optional[SupernetMasks] = None
        # observability (cli --profile): when set, fit() wraps ONE epoch's
        # training phase in an XPlane trace (profiling.trace) written under
        # profile_dir.  Default epoch 2: the first post-compile epoch —
        # epoch 1's device timeline is dominated by compilation
        self.profile_dir: Optional[str] = None
        self.profile_epoch: int = 2

        spec_apply = functools.partial(supernet_apply, spec)

        # NOTE: ``frozen`` is an explicit jit ARGUMENT everywhere.  Arrays
        # captured by closure are embedded in the HLO as literal constants
        # (measured: a 12 MB closure array becomes 25 MB of HLO text) — with
        # frozen BERT weights that blows past the remote compile service's
        # request-size limit (HTTP 413) and slows every compile.
        nchunk = max(1, hp.batch_chunk)

        def _chunk(x):
            # batch-dim split; text [3, B, L] stacks chunk on a NEW leading
            # axis so scan slices one chunk per step
            if x.ndim >= 2 and x.shape[0] == 3 and jnp.issubdtype(
                    x.dtype, jnp.integer):
                return x.reshape(3, nchunk, -1, *x.shape[2:]).swapaxes(0, 1)
            return x.reshape(nchunk, -1, *x.shape[1:])

        def train_step(params, opt_state, frozen, masks, inputs, labels,
                       valid, key):
            if nchunk == 1:
                def loss_fn(p):
                    preds = spec_apply(p, masks, inputs, frozen=frozen,
                                       bert_cfg=self.bert_cfg, train=True,
                                       rng=key)
                    return self.criterion(preds, labels, valid)

                loss, grads = jax.value_and_grad(loss_fn)(params)
            else:
                # gradient accumulation: per-chunk SUM losses (weighted-mean
                # criterion * chunk valid count) accumulate, then divide by
                # the total valid count — bitwise-equivalent semantics to
                # the unchunked weighted mean
                def loss_sum_fn(p, inp, lab, val, k):
                    preds = spec_apply(p, masks, list(inp), frozen=frozen,
                                       bert_cfg=self.bert_cfg, train=True,
                                       rng=k)
                    return self.criterion(preds, lab, val) * jnp.sum(val)

                xs = (tuple(_chunk(x) for x in inputs), _chunk(labels),
                      _chunk(valid), jax.random.split(key, nchunk))

                def body(carry, x):
                    g_acc, l_acc = carry
                    inp, lab, val, k = x
                    l, g = jax.value_and_grad(loss_sum_fn)(params, inp, lab,
                                                           val, k)
                    return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

                init = (jax.tree.map(jnp.zeros_like, params),
                        jnp.zeros((), jnp.float32))
                (g_sum, l_sum), _ = jax.lax.scan(body, init, xs)
                tot = jnp.maximum(jnp.sum(valid), 1.0)
                grads = jax.tree.map(lambda g: g / tot, g_sum)
                loss = l_sum / tot
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # fill_rows is an explicit jit argument (a {modality: row} dict or
        # None): each split's cached-text dataset carries its own row (the
        # BERT(zeros) features depend on the split's sentence cap L), so the
        # rows resolve per LOADER at evaluate() time, not per Trainer
        def eval_step(params, frozen, masks, inputs, zero_flags, fill_rows):
            return spec_apply(params, masks,
                              _zero_fill(list(inputs), zero_flags, fill_rows),
                              frozen=frozen, bert_cfg=self.bert_cfg,
                              train=False)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)
        # config-batched eval: vmap over a stacked mask pytree — the
        # robustness sweep / EA fitness axis (replaces the reference's serial
        # full-validation passes, train.py:352-370)
        self._eval_step_batched = jax.jit(
            jax.vmap(eval_step, in_axes=(None, None, 0, None, None, None)))
        # whole-grid eval: ALL stacked configs in ONE dispatch, chunked
        # device-side by lax.map(batch_size=cfg_chunk) — on a remote-tunnel
        # backend, per-chunk dispatch/transfer dominates otherwise
        self.cfg_chunk = 32

        # Sweep/EA steps HOIST the config-invariant prefix out of the config
        # axis: header outputs (incl. the frozen BERT) depend on inputs and
        # zero_flags/fill_rows — all SHARED across the stacked configs — but
        # on no mask (models/mult.py::supernet_headers), so one header pass
        # serves the whole grid and only the mask-dependent trunk maps over
        # configs.  At the MOSEI flagship (860 configs, 4-layer BERT) the
        # unhoisted form recomputed the frozen BERT 860× per data batch
        # (VERDICT r4 #1).  Exactness guarded by
        # tests/test_parallel.py::test_sweep_hoist_matches_per_config.
        from ..models import supernet_headers, supernet_trunk

        def sweep_base(params, frozen, inputs, zero_flags, fill_rows):
            filled = _zero_fill(list(inputs), zero_flags, fill_rows)
            return supernet_headers(spec, params, filled, frozen=frozen,
                                    bert_cfg=self.bert_cfg)

        # cfg_chunk is a STATIC jit argument (not a closure read): a closure
        # over self.cfg_chunk would freeze the value of whichever caller
        # traced first, silently ignoring later knob changes (sweep and EA
        # both set it before calling)
        def eval_step_sweep(params, frozen, stacked_masks, inputs, zero_flags,
                            fill_rows, cfg_chunk):
            base = sweep_base(params, frozen, inputs, zero_flags, fill_rows)
            return jax.lax.map(
                lambda m: supernet_trunk(spec, params, m, base),
                stacked_masks, batch_size=cfg_chunk)

        self._eval_step_sweep = jax.jit(eval_step_sweep,
                                        static_argnums=(6,))

        # mesh path: masks pre-chunked by the caller to [n_chunks, c, ...]
        # with the c axis sharded over EVERY mesh axis (dp x mp devices all
        # serve the config axis during eval — the sweep/EA parallelism of
        # SURVEY §5); lax.scan walks the chunks device-side in one dispatch
        def eval_step_sweep_chunked(params, frozen, masks_chunked, inputs,
                                    zero_flags, fill_rows):
            base = sweep_base(params, frozen, inputs, zero_flags, fill_rows)
            return jax.lax.map(
                lambda m: jax.vmap(
                    lambda mm: supernet_trunk(spec, params, mm, base))(m),
                masks_chunked)

        self._eval_step_sweep_chunked = jax.jit(eval_step_sweep_chunked)

    # public step wrappers keep the (params, masks, inputs, flags) call
    # surface; frozen is threaded explicitly underneath.  With a mesh, the
    # wrappers also place every argument (batch dims shard over 'dp', masks
    # and small operands replicate) so EVERY caller — train_epoch, evaluate,
    # the sweep, EA — is mesh-correct without its own sharding code.
    # jax.device_put with an argument's existing sharding is a no-op, so
    # pre-placed inputs pass through free.
    def _rep(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def _shard_batch(self, tree):
        """Batch-dim placement onto the mesh's dp axis.  Single-process:
        plain device_put sharding.  Multi-process (pods): each process holds
        its LOCAL slice of the global batch (loaders built with
        ``process_shard``) and the slices assemble into one global array."""
        from ..parallel.mesh import global_batch_from_local, shard_batch

        if jax.process_count() > 1:
            return global_batch_from_local(self.mesh, tree)
        return shard_batch(tree, self.mesh)

    def train_step(self, params, opt_state, masks, inputs, labels, valid, key):
        if self.mesh is not None:
            masks, key = self._rep((masks, key))
            inputs = self._shard_batch(list(inputs))
            labels, valid = self._shard_batch((labels, valid))
        return self._train_step(params, opt_state, self.frozen, masks, inputs,
                                labels, valid, key)

    def eval_step(self, params, masks, inputs, zero_flags, fill_rows=None):
        fill_rows = fill_rows if fill_rows is not None else self._fill_rows
        if self.mesh is not None:
            masks, zero_flags, fill_rows = self._rep(
                (masks, zero_flags, fill_rows))
            inputs = self._shard_batch(list(inputs))
        return self._eval_step(params, self.frozen, masks, inputs, zero_flags,
                               fill_rows)

    def eval_step_batched(self, params, stacked_masks, inputs, zero_flags,
                          fill_rows=None):
        fill_rows = fill_rows if fill_rows is not None else self._fill_rows
        if self.mesh is not None:
            stacked_masks, inputs, zero_flags, fill_rows = self._rep(
                (stacked_masks, list(inputs), zero_flags, fill_rows))
        return self._eval_step_batched(params, self.frozen, stacked_masks,
                                       inputs, zero_flags, fill_rows)

    def prep_sweep_masks(self, stacked_masks) -> "_SweepMasks":
        """Place a stacked mask pytree for :meth:`eval_step_sweep` ONCE
        (callers evaluate the same config grid against many data batches).
        Without a mesh: plain device upload.  With one: pad the config axis
        to a device-divisible chunk size, chunk host-side, and shard the
        chunk axis over all mesh devices."""
        if self.mesh is None:
            return _SweepMasks(jax.tree.map(jnp.asarray, stacked_masks), None)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = self.mesh.devices.size
        n = jax.tree.leaves(stacked_masks)[0].shape[0]
        c = max(self.cfg_chunk, ndev)
        c -= c % ndev
        pad = (-n) % c
        cfg_spec = P(None, tuple(self.mesh.axis_names))

        def prep(x):
            x = jnp.asarray(x)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])
            x = x.reshape(-1, c, *x.shape[1:])
            return jax.device_put(x, NamedSharding(self.mesh, cfg_spec))

        return _SweepMasks(jax.tree.map(prep, stacked_masks), n)

    def eval_step_sweep(self, params, stacked_masks, inputs, zero_flags,
                        fill_rows=None):
        fill_rows = fill_rows if fill_rows is not None else self._fill_rows
        if not isinstance(stacked_masks, _SweepMasks):
            stacked_masks = self.prep_sweep_masks(stacked_masks)
        if self.mesh is None:
            return self._eval_step_sweep(params, self.frozen,
                                         stacked_masks.tree, inputs,
                                         zero_flags, fill_rows,
                                         self.cfg_chunk)
        inputs, zero_flags, fill_rows = self._rep(
            (list(inputs), zero_flags, fill_rows))
        out = self._eval_step_sweep_chunked(params, self.frozen,
                                            stacked_masks.tree, inputs,
                                            zero_flags, fill_rows)
        return out.reshape(-1, *out.shape[2:])[:stacked_masks.n]

    @staticmethod
    def loader_fill_rows(loader) -> Optional[dict]:
        """Zero-fill substitute rows carried by a loader's dataset
        (CachedTextDataset), as device arrays; None otherwise."""
        getter = getattr(getattr(loader, "dataset", None),
                         "zero_fill_rows", None)
        if getter is None:
            return None
        return {i: jnp.asarray(r, jnp.float32)
                for i, r in getter().items()}

    def _make_tx(self, learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(self.hp.clip),
            self.OPTIMIZERS[self.hp.optim](learning_rate),
        )

    def _set_lr(self, lr: float) -> None:
        val = jnp.asarray(lr, jnp.float32)
        if self.mesh is not None:
            val = self._rep(val)  # committed scalars must share the mesh
        self.opt_state.hyperparams["learning_rate"] = val

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # --------------------------------------------------- exact-resume state
    def training_state(self) -> tuple:
        """(array_tree, meta_dict): everything beyond ``params`` that
        :meth:`fit` needs to CONTINUE a run exactly — optimizer moments,
        plateau-scheduler state, host and device RNG streams, curve, best
        validation.  The reference saves only the pickled model and restarts
        optimization on ``--pretrain`` (train.py:31-33, 508-511); exact
        resume is a deliberate beyond-reference capability.  Serialize the
        array tree with checkpoint.save/restore_training_state."""
        carry = self._carry_masks
        if carry is None:  # fit()'s epoch-1 default
            carry = jax.tree.map(jnp.asarray, build_masks(
                self.spec, full_active_config(self.spec)))
        arrays = {"opt_state": self.opt_state, "key": self._key,
                  "carry_masks": carry}
        meta = {
            "scheduler": {"lr": self.scheduler.lr,
                          "best": self.scheduler.best,
                          "num_bad": self.scheduler.num_bad},
            "np_rng_state": self.rng.bit_generator.state,  # json-able dict
            "training_curve": self.training_curve,
            "best_valid": self.best_valid,
        }
        return arrays, meta

    def load_training_state(self, arrays: dict, meta: dict) -> None:
        # restore INTO the freshly-initialized opt_state's treedef: orbax
        # round-trips namedtuple pytrees as plain dicts
        treedef = jax.tree.structure(self.opt_state)
        restored = jax.tree.leaves(arrays["opt_state"])
        self.opt_state = jax.tree.unflatten(treedef, restored)
        self._key = jnp.asarray(arrays["key"])
        if "carry_masks" in arrays:
            self._carry_masks = jax.tree.map(jnp.asarray,
                                             arrays["carry_masks"])
        s = meta["scheduler"]
        self.scheduler.lr = float(s["lr"])
        self.scheduler.best = float(s["best"])
        self.scheduler.num_bad = int(s["num_bad"])
        self.rng.bit_generator.state = meta["np_rng_state"]
        self.training_curve = [list(x) for x in meta["training_curve"]]
        self.best_valid = float(meta["best_valid"])

    # ------------------------------------------------------------------
    def train_epoch(self, train_iter, current_masks: SupernetMasks,
                    epoch: int = 0) -> tuple:
        """One epoch; returns (epoch_loss, masks_left_active).

        Replicates the sample-lags-one-batch quirk: the step runs with the
        masks sampled during the PREVIOUS batch."""
        hp, spec = self.hp, self.spec
        # NO per-step device sync: reading the loss scalar every step
        # (float(loss)) serializes host and device — each step then pays a
        # full device round-trip (tens of ms through the remote tunnel)
        # instead of pipelining upload/compute/sampling.  Losses stay on
        # device; ONE stacked readback at epoch end (or at each log line).
        losses: List = []
        sizes: List[int] = []
        proc_from = 0
        start = time.time()
        # with a mesh the step wrapper owns placement (numpy shards straight
        # to its dp layout — a host jnp.asarray here would force an extra
        # device-0 hop); without one, upload once here as before
        as_dev = (lambda x: x) if self.mesh is not None else jnp.asarray
        put_masks = (self._rep if self.mesh is not None
                     else functools.partial(jax.tree.map, jnp.asarray))
        for i_batch, batch in enumerate(train_iter):
            inputs = [as_dev(x) for x in batch.inputs]
            labels = as_dev(batch.labels)
            valid = as_dev(batch.valid)
            self.params, self.opt_state, loss = self.train_step(
                self.params, self.opt_state, current_masks, inputs, labels,
                valid, self._next_key())
            # sample the NEXT batch's configuration (train.py:95-178);
            # transfer the mask pytree to device once here (repeatedly
            # passing host numpy leaves to jit measured pathological on the
            # remote-tunnel backend)
            cfg = sample_train_config(
                spec, hp.experiment_type, hp.modality_pool, self.rng,
                all_module=hp.all_module, specific=hp.specific)
            current_masks = put_masks(build_masks(spec, cfg))

            losses.append(loss)
            sizes.append(int(np.sum(batch.valid)))
            if (i_batch + 1) % hp.log_interval == 0:
                chunk = np.asarray(jnp.stack(losses[proc_from:]))
                w = np.asarray(sizes[proc_from:], np.float64)
                elapsed = time.time() - start
                print("Epoch {:2d} | Batch {:3d} | Time/Batch(ms) {:5.2f} | "
                      "Train Loss {:5.4f}".format(
                          epoch, i_batch + 1,
                          elapsed * 1000 / hp.log_interval,
                          float(chunk @ w) / max(w.sum(), 1.0)))
                proc_from = len(losses)
                start = time.time()
        if not losses:
            return 0.0, current_masks
        loss_vec = np.asarray(jnp.stack(losses), np.float64)  # one sync
        w = np.asarray(sizes, np.float64)
        return float(loss_vec @ w) / max(float(w.sum()), 1.0), current_masks

    def evaluate(self, loader, masks: SupernetMasks,
                 activate_modality: Sequence[int]) -> tuple:
        """Returns (metric, preds, truths) — the reference's evaluate
        (train.py:203-248) with its per-dataset metric switch."""
        spec = self.spec
        flags = np.zeros((spec.modality_num,), np.float32)
        for i in activate_modality:
            flags[i] = 1.0
        flags = jnp.asarray(flags)
        masks = (self._rep(masks) if self.mesh is not None
                 else jax.tree.map(jnp.asarray, masks))
        fill_rows = self.loader_fill_rows(loader) or self._fill_rows
        as_dev = (lambda x: x) if self.mesh is not None else jnp.asarray
        multiproc = self.mesh is not None and jax.process_count() > 1
        preds_all, truth_all, valid_all = [], [], []
        for batch in loader:
            inputs = [as_dev(x) for x in batch.inputs]
            preds = self.eval_step(self.params, masks, inputs, flags,
                                   fill_rows)
            if multiproc:
                # loader slices are process-local; gather the metric inputs
                # back to every host (preds replicate via an XLA all-gather)
                from jax.experimental import multihost_utils
                from jax.sharding import NamedSharding, PartitionSpec as P

                valid, labels = batch.valid, np.asarray(batch.labels)
                preds = jax.device_put(preds, NamedSharding(self.mesh, P()))
                valid = multihost_utils.process_allgather(valid, tiled=True)
                labels = multihost_utils.process_allgather(labels, tiled=True)
                keep = valid > 0
                preds_all.append(np.asarray(preds)[keep])
                truth_all.append(labels[keep])
                continue
            # single-process: keep preds (and device-resident labels) ON
            # DEVICE through the loop — dispatches stay async — and read
            # back ONCE after it.  A per-batch np.asarray(preds) is a
            # blocking ~35 ms tunnel round-trip; at 5 evals/epoch the
            # per-batch readbacks were the LARGEST steady-state epoch cost
            # (cProfile 2026-08-17: 42 readbacks = 1.46 s of a 1.79 s
            # two-epoch same-trainer fit)
            preds_all.append(preds)
            truth_all.append(batch.labels)
            valid_all.append(batch.valid)
        if multiproc:
            preds = np.concatenate(preds_all)
            truths = np.concatenate(truth_all)
            return self._metric(preds, truths), preds, truths
        preds = np.asarray(jnp.concatenate(preds_all))       # ONE readback
        if isinstance(truth_all[0], jax.Array):
            truths = np.asarray(jnp.concatenate(truth_all))  # device labels
        else:
            truths = np.concatenate([np.asarray(t) for t in truth_all])
        keep = np.concatenate(valid_all) > 0
        preds, truths = preds[keep], truths[keep]
        return self._metric(preds, truths), preds, truths

    def _metric(self, preds: np.ndarray, truths: np.ndarray) -> float:
        ds = self.hp.dataset
        if ds in ("avmnist", "enrico", "eeg2a", "urfunny", "sarcasm", "humor"):
            return multiclass_acc(preds.argmax(axis=-1), truths)
        if ds in ("mosei_senti", "mosi", "mosei_aligned"):
            return binary_acc(preds, truths, True)
        if ds == "mojupush":
            return -float(np.mean(np.square(preds - truths)))
        raise NotImplementedError(ds + " does not exist")

    # ------------------------------------------------------------------
    def fit(self, train_loader, valid_loader, test_loader,
            save_fn: Optional[Callable] = None,
            epoch_fn: Optional[Callable] = None,
            start_epoch: int = 1) -> List[List[float]]:
        """The reference epoch loop (train.py:436-517): train, validation
        metric (random_sample: (M+1) identical full-topology evals),
        plateau scheduling on 1-val_acc, best-val checkpoint, lr-floor stop.

        ``epoch_fn(trainer, epoch)`` runs at the end of EVERY epoch (resume
        checkpointing); ``start_epoch`` continues a restored run — pair with
        :meth:`load_training_state` + ``train_loader.set_epoch``."""
        hp, spec = self.hp, self.spec
        M = spec.modality_num
        put_masks = (self._rep if self.mesh is not None
                     else functools.partial(jax.tree.map, jnp.asarray))
        full_masks = put_masks(build_masks(spec, full_active_config(spec)))
        # ctor default is the full MulT topology; a RESUMED run
        # (start_epoch > 1, state restored via load_training_state)
        # continues under the mask config the interrupted run carried into
        # this epoch.  A fresh fit() on a previously-fitted Trainer must
        # NOT inherit the last run's carry (fit leaves _carry_masks set for
        # end-of-run checkpointing), hence the start_epoch gate.
        current_masks = (put_masks(self._carry_masks)
                         if self._carry_masks is not None and start_epoch > 1
                         else full_masks)
        t0 = time.time()
        # the profiled epoch clamps into the run's actual range (a 1-epoch
        # run still produces a trace, compile noise and all)
        prof_epoch = min(max(self.profile_epoch, start_epoch), hp.num_epochs)
        for epoch in range(start_epoch, hp.num_epochs + 1):
            ep_start = time.time()
            if self.profile_dir and epoch == prof_epoch:
                from ..profiling import trace

                with trace(self.profile_dir):
                    _, current_masks = self.train_epoch(
                        train_loader, current_masks, epoch)
                    jax.block_until_ready(self.params.proj1["w"])
            else:
                _, current_masks = self.train_epoch(
                    train_loader, current_masks, epoch)

            eval_masks = full_masks
            if hp.experiment_type == "test_single" and hp.modality_pool and \
                    len(hp.modality_pool) > 1:
                aco = [[] for _ in range(M)]
                j = hp.modality_pool[1][0]
                aco[j] = [spec.modality_set[j]]
                cfg = full_active_config(spec)
                cfg.active_cross_output = aco
                eval_masks = build_masks(spec, cfg)
            if hp.experiment_type in ("baseline_ic", "random_sample"):
                current_masks = full_masks
            elif hp.experiment_type == "test_single" and hp.modality_pool and \
                    len(hp.modality_pool) > 1:
                current_masks = eval_masks

            val1 = self.evaluate(valid_loader, eval_masks, list(range(M)))[0]
            if hp.experiment_type == "random_sample":
                # the reference's (M+1) duplicate full-config validation
                # evals (shadowing quirk, train.py:444-460): for
                # random_sample, eval_masks IS the full config and
                # evaluate() is deterministic (eval mode, no rng), so the M
                # extra passes would each return exactly ``val1``.  Sum the
                # SAME host-float sequence ((..(v+v)+v)+v) the per-pass loop
                # produced — bit-identical printed metrics, M fewer full
                # validation passes per epoch.  Boundary condition: this
                # equivalence needs a RESTARTABLE, order-stable valid
                # loader — true of BatchIterator(shuffle=False), which is
                # what every entry point passes, and of the reference's own
                # DataLoader(valid, shuffle=False); a shuffled or one-shot
                # iterable would make the M reference passes differ and is
                # out of contract for both frameworks.
                val_acc = 0.0
                for _ in range(M):
                    val_acc += val1
                val_acc = val_acc + val1
            else:
                val_acc = val1
            test_acc = self.evaluate(test_loader, eval_masks, list(range(M)))[0]
            self.training_curve.append([val_acc, test_acc])

            new_lr = self.scheduler.step(1.0 - val_acc)
            self._set_lr(new_lr)
            dur = time.time() - ep_start
            print("-" * 50)
            print("Epoch {:2d} | Time {:5.4f} sec | Valid Acc {:5.4f} | "
                  "Test Acc {:5.4f}".format(epoch, dur, abs(val_acc), abs(test_acc)))
            print("-" * 50)
            if val_acc > self.best_valid:
                self.best_valid = val_acc
                if save_fn is not None:
                    save_fn(self.params, epoch, val_acc)
            # checkpointed BEFORE epoch_fn so save_training_state captures
            # the config the next epoch trains under
            self._carry_masks = current_masks
            if epoch_fn is not None:
                epoch_fn(self, epoch)
            if new_lr <= 1e-16:
                break
        print(time.time() - t0)
        print(self.training_curve)
        return self.training_curve
