from .cp import cp_forward, make_cp_forward_fn, ring_attention
from .ep import (ep_forward, ep_moe_mlp, ep_param_specs,
                 shard_moe_layer, shard_moe_params)
from .mesh import auto_mesh, initialize_distributed, make_mesh
from .pp import make_pp_forward_fn, make_pp_generate_fn, pp_forward, pp_generate
from .sharding import (batch_sharding, param_shardings, seq_sharding,
                       shard_params, sp_forward)

__all__ = [
    "auto_mesh",
    "initialize_distributed",
    "make_mesh",
    "make_pp_forward_fn",
    "make_pp_generate_fn",
    "pp_forward",
    "pp_generate",
    "cp_forward",
    "make_cp_forward_fn",
    "ring_attention",
    "ep_forward",
    "ep_moe_mlp",
    "shard_moe_params",
    "ep_param_specs",
    "shard_moe_layer",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "seq_sharding",
    "sp_forward",
]
