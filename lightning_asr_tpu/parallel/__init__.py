from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .distributed import init_distributed
from .tp import shard_state, tp_spec, tp_state_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "init_distributed", "shard_state", "tp_spec", "tp_state_sharding"]
