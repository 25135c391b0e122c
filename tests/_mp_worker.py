"""Worker for tests/test_multiprocess.py: one process of a 2-process CPU
jax.distributed run driving the PRODUCTION multi-host path —
initialize_multihost -> make_multihost_mesh (DCN x ICI) -> Trainer(mesh=...)
with process-sharded loaders (global batches assembled by
global_batch_from_local inside the step wrappers) -> one fit() epoch with
cross-process evaluate gathers.

Prints one json line: {"pid": ..., "curve": [[val, test]]}.

Modes (argv[4], default "dp"):
  * ``dp``   — 2 local devices, pure data parallelism (DCN dp x ICI dp):
               global mesh dp=4.  Cross-process collectives: gradient psum
               + evaluate allgathers over dp.
  * ``dpmp`` — 4 local devices, HYBRID dp x mp (VERDICT r4 next #4: past the
               2-process smoke): ICI dp=2 x mp=2 per process, dp stretched
               over DCN -> global mesh dp=4 x mp=2.  Tensor-parallel param
               shards stay process-local (mp rides "ICI"); only the dp
               gradient psum crosses processes — the production TPU-pod
               layout (SURVEY.md §5), exercised end to end on CPU+gloo.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
    n_local = {"dp": 2, "dpmp": 4}[mode]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
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

    if mode == "dpmp":
        # ICI dp=2 x mp=2 within each process, dp additionally x nproc over
        # DCN: global dp=4 x mp=2 across 8 devices
        mesh = make_multihost_mesh((("dp", -1), ("mp", 2)))
        assert mesh.axis_names == ("dp", "mp")
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "dp": 2 * nproc, "mp": 2}
    else:
        mesh = make_multihost_mesh((("dp", -1),))  # 2 local x 2 DCN = dp 4
    assert mesh.devices.size == nproc * n_local

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
