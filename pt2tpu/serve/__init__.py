from .generate import forward_cached, generate, greedy_generate, prefill
from .sampling import SamplingConfig, sample
from .kvcache import KVCache, init_cache
from .speculative import SpecStats, speculative_generate

__all__ = [
    "forward_cached",
    "generate",
    "SamplingConfig",
    "sample",
    "greedy_generate",
    "prefill",
    "KVCache",
    "init_cache",
    "SpecStats",
    "speculative_generate",
]
