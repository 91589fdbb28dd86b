"""Structured metrics/observability — replaces the reference's print()-only
telemetry (SURVEY.md §5: banner prints at main.py:239-254, leftover debug
print at main.py:142). JSONL sink + stdout mirror, cheap enough to leave on.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

__all__ = ["MetricsLogger", "model_bits_per_weight", "model_size_gb", "compression_ratio", "set_seed"]


class MetricsLogger:
    """Append-only JSONL metrics with wall-clock stamps.

    Usage: ``log = MetricsLogger(path); log.emit("layer_quantized", layer=3,
    name="q", err=0.12)``. ``path=None`` -> stdout mirror only when verbose.
    """

    def __init__(self, path: Optional[str] = None, verbose: bool = True):
        self.path = path
        self.verbose = verbose
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        self._t0 = time.time()

    def emit(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.verbose:
            kv = " ".join(f"{k}={v}" for k, v in fields.items())
            print(f"[{rec['t']:9.2f}s] {event}: {kv}", file=sys.stderr)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def model_bits_per_weight(params) -> float:
    """Average stored bits per quantized weight across a params pytree
    (reference metric at utils.py:251-285: 1.58 bits/code + 16 per scale —
    here the *actual storage*: 2-bit planes + real scale bytes)."""
    import jax

    from ..ops.ternary_matmul import PackedTernaryLinear

    total_weights = 0
    total_bits = 0
    for leaf in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, PackedTernaryLinear)
    ):
        if isinstance(leaf, PackedTernaryLinear):
            # Arrays may carry leading stack dims (stacked decoder layers).
            # Count *logical* storage: the artifact keeps only real scale
            # blocks (ceil(m / bs)); the x8 block padding in the in-memory
            # layout is a Mosaic tile requirement re-applied at load time.
            n = leaf.packed.shape[-1]
            lead = leaf.packed.size // (leaf.packed.shape[-2] * n)
            bs = leaf.block_size
            real_nb = -(-leaf.in_features // bs)
            total_weights += lead * leaf.in_features * n
            total_bits += lead * real_nb * (bs // 4) * n * 8  # packed planes
            total_bits += (
                2 * lead * real_nb * n
            ) * leaf.alpha.dtype.itemsize * 8
    if total_weights == 0:
        return 16.0  # ref utils.py:282-283 fallback
    return total_bits / total_weights


def model_size_gb(params) -> float:
    """Total parameter/buffer bytes in GB (reference metric, model.py:293-303)."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total / (1024**3)


def compression_ratio(original_gb: float, quantized_gb: float) -> float:
    """ref model.py:306-308 — here it is a real ratio because the artifact
    stores packed planes, not dequantized fp16 (SURVEY.md §2.4-6)."""
    return original_gb / max(quantized_gb, 1e-12)


def set_seed(seed: int = 42):
    """Seed host-side RNGs and return a jax PRNGKey (reference utils.py:15-21;
    jax randomness is explicit-key, so the key is the real handle)."""
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
