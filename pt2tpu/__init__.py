"""pt2tpu — TPU-native ternary post-training quantization & inference.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PT²-LLM
reference (`shuhan-wang1/SNLP---Tenary-Post-train-Quantization`): GPTQ-style
post-training ternarization of LLM weights to {-1, 0, +1} (~1.58 bits/weight)
— plus the packed-2-bit inference engine, Pallas kernels, sharded multi-chip
serving, tests and benchmarks the reference lacks. See SURVEY.md at the repo
root for the full component map.

Public surface mirrors the reference package façade (`__init__.py:47-57`
re-exports 9 names) with TPU-native equivalents.
"""

from .core.ternary import (
    ATQResult,
    aga_exact,
    atq_quantize,
    dequantize,
    output_error,
    quantization_error,
)
from .core.ssr import (
    apply_permutation,
    apply_permutation_to_input,
    block_variance,
    cosine_similarity_matrix,
    select_block,
    similarity_to_mean,
    static_reorder_indices,
)
from .core.packing import pack_ternary, unpack_ternary
from .utils.metrics import (
    compression_ratio,
    model_bits_per_weight,
    model_size_gb,
    set_seed,
)
from .quant.hessian import HessianAccumulator, accumulate_hessian, damped_inverse
from .quant.gptq import (
    TernaryLayerQuant,
    dequantize_layer,
    quantize_layer_weights,
    ternary_gptq,
)
from .quant.fold import fold_layer_perms

__version__ = "0.1.0"

__all__ = [
    "ATQResult",
    "aga_exact",
    "atq_quantize",
    "dequantize",
    "quantization_error",
    "output_error",
    "apply_permutation",
    "apply_permutation_to_input",
    "cosine_similarity_matrix",
    "similarity_to_mean",
    "select_block",
    "static_reorder_indices",
    "block_variance",
    "pack_ternary",
    "unpack_ternary",
    "compression_ratio",
    "model_bits_per_weight",
    "model_size_gb",
    "set_seed",
    "HessianAccumulator",
    "accumulate_hessian",
    "damped_inverse",
    "TernaryLayerQuant",
    "ternary_gptq",
    "quantize_layer_weights",
    "dequantize_layer",
    "fold_layer_perms",
]
