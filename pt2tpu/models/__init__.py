from .common import DenseLinear, apply_linear
from .decoder import (
    LINEAR_NAMES,
    TAP_OF_LINEAR,
    ModelConfig,
    forward,
    init_params,
    layer_forward,
    layer_slice,
    stack_layers,
)
from .registry import CONFIGS, get_config, get_model_type, register_config

__all__ = [
    "DenseLinear",
    "apply_linear",
    "ModelConfig",
    "forward",
    "init_params",
    "layer_forward",
    "layer_slice",
    "stack_layers",
    "LINEAR_NAMES",
    "TAP_OF_LINEAR",
    "CONFIGS",
    "get_config",
    "get_model_type",
    "register_config",
]
