from .mesh import (make_mesh, parse_mesh_axes, replicate, shard_batch,
                   shard_cfg_axis, shard_supernet_params, supernet_param_spec)

__all__ = ["make_mesh", "parse_mesh_axes", "replicate", "shard_batch",
           "shard_cfg_axis", "shard_supernet_params", "supernet_param_spec"]
