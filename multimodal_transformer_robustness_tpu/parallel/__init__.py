from .mesh import make_mesh, shard_batch, shard_cfg_axis, replicate

__all__ = ["make_mesh", "shard_batch", "shard_cfg_axis", "replicate"]
