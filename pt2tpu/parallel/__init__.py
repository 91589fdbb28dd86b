from .mesh import auto_mesh, initialize_distributed, make_mesh
from .pp import make_pp_forward_fn, pp_forward
from .sharding import (batch_sharding, param_shardings, seq_sharding,
                       shard_params, sp_forward)

__all__ = [
    "auto_mesh",
    "initialize_distributed",
    "make_mesh",
    "make_pp_forward_fn",
    "pp_forward",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "seq_sharding",
    "sp_forward",
]
