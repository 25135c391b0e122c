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

    from _mp_config import make_ds, make_hparams, make_spec
    from multimodal_transformer_robustness_tpu.data.loaders import BatchIterator
    from multimodal_transformer_robustness_tpu.models import init_supernet
    from multimodal_transformer_robustness_tpu.train import Trainer

    # spec/hparams/datasets shared with the single-process oracle
    # (tests/_mp_config.py) — the parity comparison requires them identical
    spec = make_spec()
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec)

    mesh = make_multihost_mesh((("dp", -1),))  # 2 local x 2 DCN = global dp 4
    assert mesh.devices.size == nproc * 2

    trainer = Trainer(spec, params, frozen, make_hparams(), mesh=mesh)

    def ds(seed):
        return make_ds(spec, seed)

    shard = (pid, nproc)
    curve = trainer.fit(
        BatchIterator(ds(0), 8, shuffle=True, seed=5, process_shard=shard),
        BatchIterator(ds(1), 8, process_shard=shard),
        BatchIterator(ds(2), 8, process_shard=shard))
    print("RESULT " + json.dumps({"pid": pid, "curve": curve}), flush=True)


if __name__ == "__main__":
    main()
