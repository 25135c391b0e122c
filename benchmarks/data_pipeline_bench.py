"""Input-pipeline wall-clock: host BatchIterator (fancy-index gather +
per-batch upload) vs DeviceBatchIterator (whole-dataset HBM residency +
on-device gather), at MOSEI B=1024 shapes with cached text features.

Run on the TPU (ambient axon); prints per-batch milliseconds for both paths.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(n=4096, B=1024, T=50, L=32, batches=8):
    import jax
    import jax.numpy as jnp

    from multimodal_transformer_robustness_tpu.data import (ArrayDataset,
                                                            BatchIterator,
                                                            DeviceBatchIterator)

    rng = np.random.default_rng(0)
    inputs = [rng.standard_normal((n, L, 768)).astype(np.float32),  # text feats
              rng.standard_normal((n, T, 768)).astype(np.float32),  # audio
              rng.standard_normal((n, T, 512)).astype(np.float32)]  # vision
    labels = rng.standard_normal((n, 1)).astype(np.float32)
    ds = ArrayDataset(inputs, labels, dims=[768, 768, 512], seq_len=T)

    # host path: gather on host, upload per batch, block until on device
    host = BatchIterator(ds, B, shuffle=True, seed=1)
    t0 = time.time()
    k = 0
    for b in host:
        dev = [jnp.asarray(x) for x in b.inputs]
        jax.block_until_ready(dev)
        k += 1
        if k >= batches:
            break
    host_ms = (time.time() - t0) / k * 1000

    t0 = time.time()
    dev_it = DeviceBatchIterator(ds, B, shuffle=True, seed=1)
    upload_s = time.time() - t0
    # first epoch warms the gather jit
    for b in dev_it:
        jax.block_until_ready(b.inputs)
        break
    t0 = time.time()
    k = 0
    for b in dev_it:
        jax.block_until_ready(b.inputs)
        k += 1
        if k >= batches:
            break
    dev_ms = (time.time() - t0) / k * 1000

    print(f"n={n} B={B}: host gather+upload {host_ms:.1f} ms/batch; "
          f"device gather {dev_ms:.2f} ms/batch "
          f"({host_ms / dev_ms:.0f}x; one-time upload {upload_s:.2f} s)")


if __name__ == "__main__":
    main()
