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

__all__ = [
    "SamplingConfig", "sample", "sample_per_row", "filtered_logits",
]


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
    lt = filtered_logits(logits, temps, top_ks, top_ps)
    greedy_tok = jnp.argmax(
        logits.astype(jnp.float32), axis=-1
    ).astype(jnp.int32)

    def row_key(u, p):
        return jax.random.fold_in(jax.random.fold_in(base_key, u), p)

    keys = jax.vmap(row_key)(uids, positions)
    sampled = jax.vmap(jax.random.categorical)(keys, lt).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy_tok, sampled)


def filtered_logits(
    logits: jax.Array,  # (B, V)
    temps: jax.Array,  # (B,) f32
    top_ks: jax.Array,  # (B,) int32; 0 => disabled
    top_ps: jax.Array,  # (B,) f32; >= 1 => disabled
) -> jax.Array:
    """The per-row transformed logits :func:`sample_per_row` samples from:
    temperature scaling, then top-k and top-p masks (-inf outside the
    nucleus). Exposed separately for speculative sampling, where the
    rejection test needs the draft AND target DISTRIBUTIONS under the
    same transforms, not just samples."""
    B, V = logits.shape
    lt = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]
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
    return jnp.where(
        (top_ps[:, None] < 1.0) & (lt < cutoff_val), -jnp.inf, lt
    )


def _spec_keys(base_key, uids, positions, k, salt):
    """(B, k) PRNG keys: fold_in(base, uid) -> (+ position+i) -> (+ salt).
    Deterministic per (seed, request, global token index, purpose)."""

    def kf(u, p):
        ku = jax.random.fold_in(base_key, u)
        return jax.vmap(
            lambda i: jax.random.fold_in(
                jax.random.fold_in(ku, p + i), salt
            )
        )(jnp.arange(k))

    return jax.vmap(kf)(uids, positions)


def spec_accept_per_row(
    base_key,
    uids: jax.Array,  # (B,)
    positions: jax.Array,  # (B,) draft-window start positions
    drafts: jax.Array,  # (B, k) tokens sampled from pd
    pd: jax.Array,  # (B, k, V) draft probs (filtered + renormalized)
    pt: jax.Array,  # (B, k+1, V) target probs (filtered + renormalized)
):
    """Speculative SAMPLING acceptance (Leviathan/Chen rejection scheme),
    vectorized per row: accept draft i with prob min(1, pt_i[d_i]/pd_i[d_i]);
    at the first rejection resample from normalize(max(pt_i - pd_i, 0));
    if all k accepted, sample the bonus token from pt_k. The emitted
    sequence is distributed EXACTLY as target-only sampling.

    Returns (tokens (B, k+1), n_acc (B,)): row b emits
    ``tokens[b, :n_acc[b]+1]`` — accepted drafts then the final token.
    """
    B, k = drafts.shape
    eps = 1e-20
    keys_u = _spec_keys(base_key, uids, positions, k, salt=2)
    u = jax.vmap(jax.vmap(jax.random.uniform))(keys_u)  # (B, k)
    pd_d = jnp.take_along_axis(pd, drafts[..., None], axis=-1)[..., 0]
    pt_d = jnp.take_along_axis(
        pt[:, :k], drafts[..., None], axis=-1
    )[..., 0]
    accept = u < pt_d / jnp.maximum(pd_d, eps)  # (B, k)
    n_acc = jnp.argmin(
        jnp.concatenate([accept, jnp.zeros((B, 1), bool)], axis=1), axis=1
    ).astype(jnp.int32)  # first reject; k if all accepted

    r = jnp.clip(n_acc, 0, k - 1)
    pt_r = jnp.take_along_axis(pt, r[:, None, None], axis=1)[:, 0]  # (B, V)
    pd_r = jnp.take_along_axis(pd, r[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(pt_r - pd_r, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    dist_rej = jnp.where(rs > eps, resid / jnp.maximum(rs, eps), pt_r)

    keys_f = _spec_keys(base_key, uids, positions + n_acc, 1, salt=3)[:, 0]
    final_rej = jax.vmap(jax.random.categorical)(
        keys_f, jnp.log(dist_rej + eps)
    ).astype(jnp.int32)
    final_bonus = jax.vmap(jax.random.categorical)(
        keys_f, jnp.log(pt[:, k] + eps)
    ).astype(jnp.int32)
    final = jnp.where(n_acc == k, final_bonus, final_rej)

    idx = jnp.arange(k + 1)[None, :]
    drafts_pad = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    tokens = jnp.where(idx < n_acc[:, None], drafts_pad, 0)
    tokens = jnp.where(idx == n_acc[:, None], final[:, None], tokens)
    return tokens, n_acc
