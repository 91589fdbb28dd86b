from .generate import forward_cached, greedy_generate, prefill
from .kvcache import KVCache, init_cache

__all__ = [
    "forward_cached",
    "greedy_generate",
    "prefill",
    "KVCache",
    "init_cache",
]
