"""Token sampling: greedy / temperature / top-k / top-p, jit-friendly.

No reference counterpart (the reference never generates). All samplers are
pure functions (logits, key) -> token ids with static-shape internals
(top-p uses a sorted-cumulative mask rather than dynamic truncation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SamplingConfig", "sample"]


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1.0 => disabled

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def sample(
    logits: jax.Array,  # (B, V) float
    key: Optional[jax.Array] = None,
    cfg: SamplingConfig = SamplingConfig(),
) -> jax.Array:
    """Sample token ids (B,) int32."""
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("non-greedy sampling requires a PRNG key")
    logits = logits.astype(jnp.float32) / cfg.temperature

    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1)  # (B,)
        cutoff_val = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1
        )
        logits = jnp.where(logits >= cutoff_val, logits, -jnp.inf)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
