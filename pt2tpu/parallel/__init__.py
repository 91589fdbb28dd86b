from .mesh import auto_mesh, initialize_distributed, make_mesh
from .sharding import batch_sharding, param_shardings, shard_params

__all__ = [
    "auto_mesh",
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_params",
]
