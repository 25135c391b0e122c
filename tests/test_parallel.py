"""parallel/mesh.py coverage on the conftest 8-device CPU mesh: sharded ==
unsharded numerics for the train step (dp x mp) and the cfg-axis batched
eval, shard_batch layout rules, and the multi-host scaffolding's device
math / single-process fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_transformer_robustness_tpu import (
    ActiveConfig,
    ModelSpec,
    build_masks,
    full_active_config,
    gen_active_cross,
)
from multimodal_transformer_robustness_tpu.masks import stack_masks
from multimodal_transformer_robustness_tpu.models import init_supernet, supernet_apply
from multimodal_transformer_robustness_tpu.parallel.mesh import (
    global_batch_from_local,
    local_batch_bounds,
    make_mesh,
    make_multihost_mesh,
    multihost_axes,
    parse_mesh_axes,
    replicate,
    shard_batch,
    shard_cfg_axis,
    shard_supernet_params,
    supernet_param_spec,
)


def _spec():
    return ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(16, 12, 10),
        dimension=8, num_heads=4, head_dim=4, layers_single_attn=2,
        layers_cross_attn=2, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0, res_dropout=0.0,
        out_dropout=0.0, embed_dropout=0.0, attn_mask=True, output_dim=1,
        header_overrides={"t": "rnn"})


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must force the 8-device CPU mesh"
    spec = _spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    B, T = 8, 6
    inputs = [jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
              for d in spec.orig_dimensions]
    labels = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    return spec, params, frozen, inputs, labels


def _train_step_fn(spec, tx):
    def step(params, opt_state, masks, inputs, labels):
        def loss_fn(p):
            preds = supernet_apply(spec, p, masks, inputs, train=False)
            return jnp.mean(jnp.abs(preds - labels))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def test_dp_mp_sharded_train_step_equals_unsharded(setup):
    spec, params, frozen, inputs, labels = setup
    masks = jax.tree.map(jnp.asarray, build_masks(spec, full_active_config(spec)))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    step = _train_step_fn(spec, tx)

    p1, o1, l1 = step(params, tx.init(params), masks, inputs, labels)

    mesh = make_mesh((("dp", 4), ("mp", 2)))
    params_sh = shard_supernet_params(params, mesh)
    inputs_sh = shard_batch(list(inputs), mesh)
    labels_sh = shard_batch(labels, mesh)
    masks_sh = replicate(masks, mesh)
    p2, o2, l2 = step(params_sh, tx.init(params_sh), masks_sh, inputs_sh,
                      labels_sh)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    # atol covers sharded-vs-unsharded reduction-order noise (~1e-7 on the
    # gradients), which adam's rsqrt normalization amplifies into the
    # parameter update for near-zero second moments
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_cfg_axis_sharded_eval_equals_unsharded(setup):
    spec, params, frozen, inputs, labels = setup
    r = np.random.default_rng(3)
    cfgs = []
    for _ in range(8):
        am = [[0, 1], [0, 2], [1, 2], [0, 1, 2]][r.integers(0, 4)]
        ac, aco = gen_active_cross(spec, am, rng=r)
        cfgs.append(build_masks(spec, ActiveConfig(
            active_modality=am, active_cross=ac, active_cross_output=aco,
            active_single_attn_layer_num=list(r.integers(0, 3, 3)),
            active_self_attn_layer_num=1, active_hybrid_attn_layer_num=2,
            active_dimension=spec.dimension, active_head_num=2,
            active_head_dim=3)))
    stacked = jax.tree.map(jnp.asarray, stack_masks(cfgs))

    @jax.jit
    def eval_batched(params, stacked_masks, inputs):
        return jax.vmap(
            lambda m: supernet_apply(spec, params, m, inputs, train=False)
        )(stacked_masks)

    plain = eval_batched(params, stacked, list(inputs))

    mesh = make_mesh((("cfg", 8),))
    out_sh = eval_batched(replicate(params, mesh),
                          shard_cfg_axis(stacked, mesh),
                          replicate(list(inputs), mesh))
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(plain),
                               rtol=1e-6, atol=1e-7)


def test_shard_batch_layout_rules():
    mesh = make_mesh((("dp", 8),))
    text = np.stack([np.ones((8, 5), np.int64)] * 3)      # [3, B, L]
    feats = np.ones((8, 4, 6), np.float32)                # [B, T, F]
    tree = shard_batch({"text": text, "feats": feats}, mesh)
    assert tree["text"].sharding.spec == P(None, "dp")
    assert tree["feats"].sharding.spec == P("dp")
    # every device holds B/8 rows
    assert tree["feats"].addressable_shards[0].data.shape[0] == 1
    assert tree["text"].addressable_shards[0].data.shape == (3, 1, 5)


def test_multihost_axis_math():
    ici, dcn = multihost_axes((("dp", -1), ("mp", 2)), dcn_over="dp",
                              n_processes=4, n_local_devices=8)
    assert ici == (("dp", 4), ("mp", 2))
    assert dcn == (("dp", 4), ("mp", 1))
    # global dp = 4 processes x 4 local = 16
    assert dict(ici)["dp"] * dict(dcn)["dp"] == 16

    with pytest.raises(AssertionError):
        multihost_axes((("dp", 3),), n_processes=2, n_local_devices=8)


def test_local_batch_bounds():
    assert local_batch_bounds(32, n_processes=4, process_id=0) == slice(0, 8)
    assert local_batch_bounds(32, n_processes=4, process_id=3) == slice(24, 32)
    with pytest.raises(AssertionError):
        local_batch_bounds(30, n_processes=4, process_id=0)


def test_multihost_single_process_fallbacks(setup):
    # make_multihost_mesh: single process -> plain ICI mesh, same axis names
    mesh = make_multihost_mesh((("dp", 4), ("mp", 2)))
    assert mesh.axis_names == ("dp", "mp")
    assert mesh.devices.shape == (4, 2)

    # global_batch_from_local: single process supplies the whole batch
    dp_mesh = make_mesh((("dp", 8),))
    local = {"feats": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "text": np.ones((3, 8, 5), np.int64)}
    global_tree = global_batch_from_local(dp_mesh, local)
    assert global_tree["feats"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(global_tree["feats"]),
                                  local["feats"])
    assert global_tree["text"].sharding.spec == P(None, "dp")


def test_initialize_multihost_single_process_noop(monkeypatch):
    from multimodal_transformer_robustness_tpu.parallel.mesh import (
        initialize_multihost)

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert initialize_multihost() is False


def test_batch_iterator_process_shard():
    """Every process's shards concatenate back to the unsharded batch
    stream (same seed => same global order)."""
    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator

    class DS:
        inputs = [np.arange(20 * 3, dtype=np.float32).reshape(20, 3)]
        labels = np.arange(20, dtype=np.float32).reshape(20, 1)

        def __len__(self):
            return 20

    full = list(BatchIterator(DS(), 8, shuffle=True, seed=3))
    shards = [list(BatchIterator(DS(), 8, shuffle=True, seed=3,
                                 process_shard=(p, 4))) for p in range(4)]
    assert len(full) == len(shards[0]) == 3
    for b, parts in zip(full, zip(*shards)):
        np.testing.assert_array_equal(
            np.concatenate([p.inputs[0] for p in parts]), b.inputs[0])
        np.testing.assert_array_equal(
            np.concatenate([p.valid for p in parts]), b.valid)


# ------------------------------------------------- production Trainer + mesh

def test_parse_mesh_axes():
    assert parse_mesh_axes("dp=8") == (("dp", 8),)
    assert parse_mesh_axes("dp=4,mp=2") == (("dp", 4), ("mp", 2))
    assert parse_mesh_axes("dp=-1") == (("dp", -1),)
    assert parse_mesh_axes("cfg=") == (("cfg", -1),)


def test_supernet_param_spec_mp_fallback(setup):
    spec, params, frozen, inputs, labels = setup
    mesh_dp = make_mesh((("dp", 8),))
    sh = shard_supernet_params(params, mesh_dp)  # no mp axis -> replicated
    for leaf in jax.tree.leaves(sh):
        assert leaf.sharding.spec == P()


def _make_trainer(spec, params, frozen, mesh=None, **hp_kw):
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)

    hp = TrainHParams(batch_size=8, lr=1e-3, optim="Adam", num_epochs=1,
                      experiment_type="random_sample", criterion="L1Loss",
                      dataset="mosei_senti", seed=7, **hp_kw)
    # fresh param buffers per trainer: the jitted step donates params/opt
    return Trainer(spec, jax.tree.map(jnp.array, params), frozen, hp,
                   mesh=mesh)


def _loaders(spec, n=16, t=6, bs=8):
    from multimodal_transformer_robustness_tpu.data.loaders import (
        ArrayDataset, BatchIterator)

    def ds(seed):
        r = np.random.default_rng(seed)
        return ArrayDataset(
            [r.standard_normal((n, t, d)).astype(np.float32)
             for d in spec.orig_dimensions],
            r.standard_normal((n, 1)).astype(np.float32),
            dims=spec.orig_dimensions, seq_len=t)

    return (BatchIterator(ds(0), bs, shuffle=True, seed=5),
            BatchIterator(ds(1), bs), BatchIterator(ds(2), bs))


def test_trainer_mesh_fit_matches_unsharded(setup):
    """A cli.main --mesh dp=4,mp=2 style run through the PRODUCTION Trainer
    (fit: train epoch + evals + plateau scheduling) matches the unsharded
    trainer's numerics."""
    spec, params, frozen, inputs, labels = setup
    t_plain = _make_trainer(spec, params, frozen)
    t_mesh = _make_trainer(spec, params, frozen,
                           mesh=make_mesh((("dp", 4), ("mp", 2))))

    curve_plain = t_plain.fit(*_loaders(spec))
    curve_mesh = t_mesh.fit(*_loaders(spec))
    np.testing.assert_allclose(np.asarray(curve_mesh),
                               np.asarray(curve_plain), rtol=1e-5, atol=1e-6)
    # sharded reduction order perturbs tiny gradients; Adam's
    # rsqrt-normalization amplifies those to ~1e-5 absolute after a step
    for a, b in zip(jax.tree.leaves(t_plain.params),
                    jax.tree.leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_trainer_mesh_sweep_and_ea_match_unsharded(setup):
    """missing_modality_sweep and EA fitness: config axis sharded over the
    mesh == unsharded (the production eval_step_sweep path)."""
    from multimodal_transformer_robustness_tpu.train.ea import (
        EAHParams, EvolutionSearch)
    from multimodal_transformer_robustness_tpu.train.sweep import (
        missing_modality_sweep)

    spec, params, frozen, inputs, labels = setup
    _, valid_loader, test_loader = _loaders(spec)
    t_plain = _make_trainer(spec, params, frozen)
    t_mesh = _make_trainer(spec, params, frozen,
                           mesh=make_mesh((("dp", 4), ("mp", 2))))

    r_plain = missing_modality_sweep(t_plain, valid_loader, test_loader,
                                     max_cfg_chunk=16, quiet=True)
    r_mesh = missing_modality_sweep(t_mesh, valid_loader, test_loader,
                                    max_cfg_chunk=16, quiet=True)
    assert set(r_plain) == set(r_mesh)
    for k in r_plain:
        np.testing.assert_allclose(r_mesh[k]["valid_acc"],
                                   r_plain[k]["valid_acc"], rtol=1e-6)
        assert r_mesh[k]["best_cfg"] == r_plain[k]["best_cfg"]

    ea_kw = dict(hp=EAHParams(population_size=6, max_time_budget=1, seed=3),
                 active_modality=[0, 1, 2], valid_loader=valid_loader,
                 test_loader=test_loader, max_cfg_chunk=8)
    ea_plain = EvolutionSearch(t_plain, **ea_kw)
    ea_mesh = EvolutionSearch(t_mesh, **ea_kw)
    genomes = [ea_plain.random_genome() for _ in range(6)]
    np.testing.assert_allclose(ea_mesh.eval_population(genomes),
                               ea_plain.eval_population(genomes), rtol=1e-6)


def test_trainer_mesh_cached_text_matches_unsharded():
    """--mesh x --cache_text combo (both reachable together from cli.main):
    dp-sharded training on precomputed [B, L, 768-ish] text FEATURES (not
    [3, B, L] token stacks) matches the unsharded cached trainer."""
    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
    from multimodal_transformer_robustness_tpu.models.bert import tiny_bert_config
    from multimodal_transformer_robustness_tpu.train import TrainHParams, Trainer
    from multimodal_transformer_robustness_tpu.train.features import CachedTextDataset

    spec = ModelSpec(
        modality_set=("t", "a"), orig_dimensions=(6, 4), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0), relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1)
    bert_cfg = tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)

    class _TextDS:
        def __init__(self, n=16, L=7, T=5, vocab=64, seed=0):
            r = np.random.default_rng(seed)
            self.text = np.stack([r.integers(1, vocab, (n, L)),
                                  np.zeros((n, L), np.int64),
                                  np.ones((n, L), np.int64)])
            self.audio = r.standard_normal((n, T, 4)).astype(np.float32)
            self.labels = r.standard_normal((n, 1)).astype(np.float32)

        def __len__(self):
            return self.text.shape[1]

        def gather(self, idx):
            return [self.text[:, idx], self.audio[idx]], self.labels[idx]

    cached = CachedTextDataset(_TextDS(), frozen, bert_cfg, batch_size=8)
    hp = TrainHParams(batch_size=8, optim="SGD", criterion="L1Loss", seed=0,
                      dataset="mosei_senti")
    masks = build_masks(spec, full_active_config(spec))

    def one_epoch(mesh):
        tr = Trainer(spec, jax.tree.map(jnp.copy, params), frozen, hp,
                     bert_cfg=bert_cfg, mesh=mesh)
        loss, _ = tr.train_epoch(BatchIterator(cached, 8, shuffle=True,
                                               seed=3), masks, 0)
        return float(loss), tr.params

    l_plain, p_plain = one_epoch(None)
    l_mesh, p_mesh = one_epoch(make_mesh((("dp", 4), ("mp", 2))))
    np.testing.assert_allclose(l_mesh, l_plain, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_sweep_hoist_matches_per_config():
    """eval_step_sweep hoists the config-invariant header prefix (incl. the
    frozen BERT) out of the config axis (train/loop.py, VERDICT r4 #1);
    this oracle proves hoisted == per-config eval_step on a model with a
    REAL bert_rnn text header, both unmeshed (lax.map path) and meshed
    (chunked vmap path), including non-trivial zero_flags + fill_rows."""
    from multimodal_transformer_robustness_tpu.models.bert import (
        tiny_bert_config)
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)

    spec = ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(6, 4, 5), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=2, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0,) * 4, relu_dropout=0.0,
        res_dropout=0.0, out_dropout=0.0, embed_dropout=0.0, attn_mask=True,
        output_dim=1)
    bert_cfg = tiny_bert_config()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_cfg=bert_cfg)

    r = np.random.default_rng(11)
    B, T, L = 8, 5, 7
    text = jnp.asarray(np.stack([r.integers(1, 64, (B, L)),
                                 np.zeros((B, L), np.int64),
                                 np.ones((B, L), np.int64)]))
    inputs = [text,
              jnp.asarray(r.standard_normal((B, T, 4)), jnp.float32),
              jnp.asarray(r.standard_normal((B, T, 5)), jnp.float32)]

    cfgs = []
    for _ in range(10):
        am = [[0, 1], [0, 2], [1, 2], [0, 1, 2]][r.integers(0, 4)]
        ac, aco = gen_active_cross(spec, am, rng=r)
        cfgs.append(build_masks(spec, ActiveConfig(
            active_modality=am, active_cross=ac, active_cross_output=aco,
            active_single_attn_layer_num=list(r.integers(0, 3, 3)),
            active_self_attn_layer_num=1, active_hybrid_attn_layer_num=1,
            active_dimension=spec.dimension, active_head_num=2,
            active_head_dim=3)))
    stacked = stack_masks(cfgs)

    hp = TrainHParams(batch_size=B, dataset="mosei_senti",
                      experiment_type="random_sample")
    # flags zero out modality 2 + substitute a fill row for it — the sweep
    # itself always passes full flags, but the hoisted step must stay exact
    # for the whole public eval_step_sweep surface
    flags = jnp.asarray([1.0, 1.0, 0.0])
    fill = {2: np.full((T, 5), 0.25, np.float32)}

    for mesh in (None, make_mesh((("dp", 4), ("mp", 2)))):
        tr = Trainer(spec, jax.tree.map(jnp.array, params), frozen, hp,
                     bert_cfg=bert_cfg, mesh=mesh)
        tr.cfg_chunk = 4
        swept = np.asarray(tr.eval_step_sweep(
            tr.params, stacked, inputs, flags, fill_rows=fill))
        per_cfg = np.stack([
            np.asarray(tr.eval_step(tr.params, m, inputs, flags,
                                    fill_rows=fill)) for m in cfgs])
        np.testing.assert_allclose(swept, per_cfg, rtol=1e-6, atol=1e-6)
