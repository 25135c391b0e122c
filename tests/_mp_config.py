"""Shared model/run configuration for the 2-process multihost parity test.

tests/test_multiprocess.py (single-process oracle) and tests/_mp_worker.py
(each distributed process) MUST build the identical spec/hparams/datasets
for the curve comparison to mean anything — one builder, imported by both,
keeps an edit from silently turning the test into a comparison of two
different models.
"""


def make_spec():
    from multimodal_transformer_robustness_tpu import ModelSpec

    return ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(16, 12, 10),
        dimension=8, num_heads=4, head_dim=4, layers_single_attn=2,
        layers_cross_attn=2, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0, res_dropout=0.0,
        out_dropout=0.0, embed_dropout=0.0, attn_mask=True, output_dim=1,
        header_overrides={"t": "rnn"})


def make_hparams():
    from multimodal_transformer_robustness_tpu.train import TrainHParams

    return TrainHParams(batch_size=8, lr=1e-3, optim="Adam", num_epochs=1,
                        experiment_type="random_sample", criterion="L1Loss",
                        dataset="mosei_senti", seed=7, log_interval=1000)


def make_ds(spec, seed, n=16, t=6):
    import numpy as np

    from multimodal_transformer_robustness_tpu.data.loaders import ArrayDataset

    r = np.random.default_rng(seed)
    return ArrayDataset(
        [r.standard_normal((n, t, d)).astype(np.float32)
         for d in spec.orig_dimensions],
        r.standard_normal((n, 1)).astype(np.float32),
        dims=spec.orig_dimensions, seq_len=t)
