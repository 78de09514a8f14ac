from fdgan_tpu.dist.mesh import make_mesh, batch_sharding, replicate_sharding, shard_batch
from fdgan_tpu.dist.tiling import tiled_apply

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "tiled_apply",
]
