from .generate import (
    chunked_prefill,
    forward_cached,
    generate,
    greedy_generate,
    prefill,
)
from .sampling import SamplingConfig, sample, sample_per_row
from .kvcache import KVCache, init_cache
from .ring import RingCaches, init_ring_caches, ring_generate
from .engine import load_engine_state, save_engine_state
from .speculative import SpecStats, speculative_generate

__all__ = [
    "chunked_prefill",
    "forward_cached",
    "generate",
    "SamplingConfig",
    "sample",
    "sample_per_row",
    "greedy_generate",
    "prefill",
    "KVCache",
    "init_cache",
    "RingCaches",
    "init_ring_caches",
    "ring_generate",
    "SpecStats",
    "speculative_generate",
    "save_engine_state",
    "load_engine_state",
]
