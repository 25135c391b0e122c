"""Device-mesh scaling — a first-class NEW capability of the TPU build.

The reference is strictly single-process / single-GPU (SURVEY.md §2.7: no
DDP, no collectives, no communication backend).  Here scaling is GSPMD under
one ``jax.jit`` program:

  * ``dp`` axis: batch data-parallelism — batches shard over ICI, gradients
    all-reduce via XLA-inserted psum (no hand-written collectives);
  * ``cfg`` axis: *configuration* parallelism — the robustness sweep and the
    EA fitness population stack elastic configurations along a leading axis
    and shard it across devices, turning the reference's serial grids of
    full validation passes (train.py:352-370, EA.py:93-137) into one pass;
  * ``tp`` axis: tensor parallelism over attention heads / FFN hidden units
    for large configurations (shardings annotated on the stacked layer
    parameters; XLA inserts the all-reduces).

Multi-host: `jax.distributed.initialize()` + the same meshes over all
processes (DCN between hosts, ICI within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[tuple] = (("dp", -1),),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from (name, size) pairs; one size may be -1 (inferred).

    ``make_mesh((("dp", -1),))`` -> all devices data-parallel;
    ``make_mesh((("dp", 2), ("tp", 4)))`` -> 2-way data x 4-way tensor.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf's batch dimension over ``axis``.  Text inputs
    [3, B, L] shard on dim 1; everything else on dim 0."""
    def put(x):
        if x.ndim >= 2 and x.shape[0] == 3 and x.dtype in (np.int32, np.int64):
            spec = P(None, axis)
        else:
            spec = P(axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_cfg_axis(masks_stacked, mesh: Mesh, axis: str = "cfg"):
    """Shard a stacked SupernetMasks pytree's leading config axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), masks_stacked)
