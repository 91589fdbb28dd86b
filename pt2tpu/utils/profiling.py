"""Profiling, timing, and roofline utilities.

Replaces the reference's wall-clock-only telemetry (time.time() around the
whole run, ref main.py:243,306-308) with:

  * ``trace`` — ``jax.profiler`` XPlane/Perfetto trace contexts;
  * ``time_fn`` — a timer that is correct on this platform (device results
    must be fetched to host; ``block_until_ready`` returns at dispatch
    through the axon tunnel);
  * ``ternary_decode_roofline`` — first-principles tokens/s ceiling for
    packed 2-bit weights at a given HBM bandwidth, the BASELINE.json
    north-star denominator.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np

__all__ = ["trace", "time_fn", "ternary_decode_roofline", "model_weight_bytes"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Profiler trace context; view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, reps: int = 3) -> float:
    """Best-of-``reps`` seconds for ``fn(*args)``, forcing completion by
    fetching the first output leaf to host."""

    def run():
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    run()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def model_weight_bytes(cfg, ternary: bool = True, scale_bytes: int = 2) -> Dict[str, int]:
    """Per-token HBM weight traffic for batch-1 decode of a decoder config."""
    D, I = cfg.dim, cfg.intermediate
    H, Hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    per_layer_params = (
        D * H * hd + 2 * D * Hkv * hd + H * hd * D
        + (3 if cfg.gated_mlp else 2) * D * I
    )
    layer_params = per_layer_params * cfg.n_layers
    if ternary:
        bs = 128
        layer_bytes = layer_params // 4 + 2 * scale_bytes * (layer_params // bs)
    else:
        layer_bytes = 2 * layer_params
    head_bytes = 2 * cfg.vocab_size * D  # lm_head/embed stay bf16
    return {
        "layer_bytes": int(layer_bytes),
        "head_bytes": int(head_bytes),
        "total_bytes": int(layer_bytes + head_bytes),
        "params": int(layer_params),
    }


def ternary_decode_roofline(cfg, hbm_gbps: float = 819.0) -> Dict[str, float]:
    """Tokens/s/chip ceiling for batch-1 decode: every weight byte is read
    once per token; v5e HBM default 819 GB/s. Returns ternary and bf16
    ceilings plus the ideal ratio."""
    t = model_weight_bytes(cfg, ternary=True)["total_bytes"]
    d = model_weight_bytes(cfg, ternary=False)["total_bytes"]
    return {
        "ternary_tok_s": hbm_gbps * 1e9 / t,
        "bf16_tok_s": hbm_gbps * 1e9 / d,
        "ideal_speedup": d / t,
    }
