from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .distributed import init_distributed

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "init_distributed"]
