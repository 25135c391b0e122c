"""Worker for tests/test_multiprocess.py: one process of a 2-process CPU
jax.distributed run driving the PRODUCTION multi-host path —
initialize_multihost -> make_multihost_mesh (DCN x ICI) -> Trainer(mesh=...)
with process-sharded loaders (global batches assembled by
global_batch_from_local inside the step wrappers) -> one fit() epoch with
cross-process evaluate gathers.

Prints one json line: {"pid": ..., "curve": [[val, test]]}.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives (TPU pods use ICI natively)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from multimodal_transformer_robustness_tpu.parallel.mesh import (
        initialize_multihost, make_multihost_mesh)

    assert initialize_multihost(f"127.0.0.1:{port}", nproc, pid) is True
    assert jax.process_count() == nproc

    import numpy as np

    from multimodal_transformer_robustness_tpu import ModelSpec
    from multimodal_transformer_robustness_tpu.data.loaders import (
        ArrayDataset, BatchIterator)
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import (TrainHParams,
                                                             Trainer)

    spec = ModelSpec(
        modality_set=("t", "a", "v"), orig_dimensions=(16, 12, 10),
        dimension=8, num_heads=4, head_dim=4, layers_single_attn=2,
        layers_cross_attn=2, layers_self_attn=1,
        attn_dropout=(0.0, 0.0, 0.0, 0.0), relu_dropout=0.0, res_dropout=0.0,
        out_dropout=0.0, embed_dropout=0.0, attn_mask=True, output_dim=1,
        header_overrides={"t": "rnn"})
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)

    mesh = make_multihost_mesh((("dp", -1),))  # 2 local x 2 DCN = global dp 4
    assert mesh.devices.size == nproc * 2

    hp = TrainHParams(batch_size=8, lr=1e-3, optim="Adam", num_epochs=1,
                      experiment_type="random_sample", criterion="L1Loss",
                      dataset="mosei_senti", seed=7, log_interval=1000)
    trainer = Trainer(spec, params, frozen, hp, mesh=mesh)

    def ds(seed, n=16, t=6):
        r = np.random.default_rng(seed)
        return ArrayDataset(
            [r.standard_normal((n, t, d)).astype(np.float32)
             for d in spec.orig_dimensions],
            r.standard_normal((n, 1)).astype(np.float32),
            dims=spec.orig_dimensions, seq_len=t)

    shard = (pid, nproc)
    curve = trainer.fit(
        BatchIterator(ds(0), 8, shuffle=True, seed=5, process_shard=shard),
        BatchIterator(ds(1), 8, process_shard=shard),
        BatchIterator(ds(2), 8, process_shard=shard))
    print("RESULT " + json.dumps({"pid": pid, "curve": curve}), flush=True)


if __name__ == "__main__":
    main()
