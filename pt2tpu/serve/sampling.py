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

__all__ = ["SamplingConfig", "sample", "sample_per_row"]


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


def sample_per_row(
    logits: jax.Array,  # (B, V)
    base_key: jax.Array,  # PRNG key
    uids: jax.Array,  # (B,) int32 request ids
    positions: jax.Array,  # (B,) int32 input-token positions
    temps: jax.Array,  # (B,) f32; <= 0 => greedy row
    top_ks: jax.Array,  # (B,) int32; 0 => disabled
    top_ps: jax.Array,  # (B,) f32; >= 1 => disabled
) -> jax.Array:
    """Per-row sampling with PER-ROW parameters — the continuous-batching
    engine's sampler, where every slot carries its own request's
    temperature/top-k/top-p (see serve.engine.ServeEngine).

    Same semantics per row as :func:`sample`; rows with ``temps <= 0`` take
    the exact argmax (bitwise-identical to the greedy engine). Each row's
    key is ``fold_in(fold_in(base_key, uid), position)`` — deterministic per
    (seed, request, token index), independent of batch composition and
    admission order.
    """
    B, V = logits.shape
    lf = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    lt = lf / jnp.maximum(temps, 1e-6)[:, None]
    desc = jnp.sort(lt, axis=-1)[:, ::-1]
    kidx = jnp.clip(top_ks - 1, 0, V - 1)
    kth = jnp.take_along_axis(desc, kidx[:, None], axis=-1)
    lt = jnp.where((top_ks[:, None] > 0) & (lt < kth), -jnp.inf, lt)

    desc2 = jnp.sort(lt, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(desc2, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.clip(
        jnp.sum(cum < top_ps[:, None], axis=-1), 0, V - 1
    )
    cutoff_val = jnp.take_along_axis(desc2, cutoff_idx[:, None], axis=-1)
    lt = jnp.where((top_ps[:, None] < 1.0) & (lt < cutoff_val), -jnp.inf, lt)

    def row_key(u, p):
        return jax.random.fold_in(jax.random.fold_in(base_key, u), p)

    keys = jax.vmap(row_key)(uids, positions)
    sampled = jax.vmap(jax.random.categorical)(keys, lt).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy_tok, sampled)
