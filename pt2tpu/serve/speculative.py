"""Speculative decoding: a small draft model proposes, the ternary target
verifies in one batched forward.

The reference has no generation path at all (SURVEY.md §3.5); this is a
serving feature beyond its scope, shaped for the ternary TPU engine: the
target's decode step is HBM-bound on packed weight loads, so verifying k+1
tokens costs nearly the same as generating one — accepted drafts are close
to free throughput.

Greedy everywhere, which makes the method *exact*: the emitted sequence
equals target-only greedy decoding token for token (the correctness
contract the tests pin). The whole generate loop is one compiled program —
``lax.while_loop`` over draft/verify rounds with static-shape buffers;
cache rewinds are position-counter moves (stale slots are overwritten
before they can be attended: each round writes [c, c+k] before reading).

Single-sequence (B == 1) for now: per-row acceptance would diverge row
positions, which is the continuous-batching engine's job.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import decoder as dec
from .generate import forward_cached, prefill
from .kvcache import init_cache

__all__ = ["speculative_generate", "SpecStats"]


class SpecStats:
    """Host-side view of the acceptance counters a run returns."""

    def __init__(self, rounds: int, drafted: int, accepted: int):
        self.rounds = int(rounds)
        self.drafted = int(drafted)
        self.accepted = int(accepted)

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.drafted, 1)

    def __repr__(self):
        return (
            f"SpecStats(rounds={self.rounds}, drafted={self.drafted}, "
            f"accepted={self.accepted}, rate={self.acceptance_rate:.2f})"
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg_t", "cfg_d", "max_new", "k", "max_len", "impl", "kv_quant"
    ),
)
def _spec_generate(
    cfg_t, params_t, cfg_d, params_d, prompt, max_new, k, max_len, impl,
    kv_quant,
):
    B, Lp = prompt.shape
    M = max_len
    t_cache = init_cache(cfg_t, B, M, quantized=kv_quant)
    d_cache = init_cache(cfg_d, B, M)  # draft KV stays bf16 (it is tiny)

    t_logits, t_cache = prefill(cfg_t, params_t, prompt, t_cache, impl)
    _, d_cache = prefill(cfg_d, params_d, prompt, d_cache, impl)
    t_last = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)[0]  # scalar

    pad = max_new + k + 1  # one round may overshoot max_new by <= k
    out0 = jnp.zeros((pad,), jnp.int32)

    def cond(carry):
        _, _, _, n_out, *_ = carry
        return n_out < max_new

    def body(carry):
        t_cache, d_cache, out, n_out, t_last, c, rounds, drafted, accepted = (
            carry
        )

        # --- draft k tokens greedily. k+1 steps, not k: the extra step
        # feeds d_{k-1} at position c+k so a fully-accepted round leaves no
        # hole in the draft cache (an unwritten slot is a zero key/value
        # every later step would attend — measured 0.70 acceptance where a
        # perfect draft should reach 1.0). Its output is unused.
        def d_step(dc, i):
            d_cache, tok = dc
            lg, d_cache = forward_cached(
                cfg_d, params_d, tok[None, None], d_cache, c + i, impl
            )
            nxt = jnp.argmax(lg[0]).astype(jnp.int32)
            return (d_cache, nxt), nxt

        (d_cache, _), drafts = jax.lax.scan(
            d_step, (d_cache, t_last), jnp.arange(k + 1)
        )
        drafts = drafts[:k]  # (k,)

        # --- verify: target forward over [t_last, drafts) at [c, c+k].
        toks = jnp.concatenate([t_last[None], drafts])[None, :]  # (1, k+1)
        lg, t_cache = forward_cached(
            cfg_t, params_t, toks, t_cache, c, impl, all_logits=True
        )
        votes = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # (k+1,)

        # longest accepted prefix: d_i == votes_i for all i < n_acc
        ok = drafts == votes[:k]
        n_acc = jnp.argmin(
            jnp.concatenate([ok, jnp.zeros((1,), bool)])
        ).astype(jnp.int32)  # first False; k if all True
        emit = jnp.minimum(n_acc + 1, max_new - n_out)  # tokens to emit

        # --- emit votes[0 : n_acc+1] into out at n_out (masked window add)
        idx = jnp.arange(pad)
        take = (idx >= n_out) & (idx < n_out + emit)
        src = jnp.clip(idx - n_out, 0, k)
        out = jnp.where(take, votes[src], out)

        t_last = votes[n_acc]
        return (
            t_cache, d_cache, out, n_out + emit, t_last, c + n_acc + 1,
            rounds + 1, drafted + k, accepted + n_acc,
        )

    init = (
        t_cache, d_cache, out0, jnp.int32(1), t_last, jnp.int32(Lp),
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    # the prefill token is emission #1
    init = init[:2] + (out0.at[0].set(t_last),) + init[3:]
    (_, _, out, _, _, _, rounds, drafted, accepted) = jax.lax.while_loop(
        cond, body, init
    )
    return out[:max_new], rounds, drafted, accepted


def speculative_generate(
    cfg_t: dec.ModelConfig,
    params_t,
    cfg_d: dec.ModelConfig,
    params_d,
    prompt: jax.Array,  # (1, Lp) int32
    max_new: int,
    k: int = 4,
    max_len: Optional[int] = None,
    impl: str = "auto",
    kv_quant: bool = False,
) -> Tuple[jax.Array, SpecStats]:
    """Greedy speculative decode; returns ((1, max_new) tokens, SpecStats).

    Exactness contract: identical tokens to
    ``greedy_generate(cfg_t, params_t, ...)``. ``k`` is the draft length
    per round; both models must share the tokenizer/vocab.
    """
    B, Lp = prompt.shape
    if B != 1:
        raise ValueError("speculative decoding is single-sequence (B=1)")
    if cfg_t.vocab_size != cfg_d.vocab_size:
        raise ValueError("draft and target must share a vocabulary")
    M = max_len or min(
        min(cfg_t.max_seq_len, cfg_d.max_seq_len), Lp + max_new + k + 1
    )
    if Lp + max_new + k + 1 > M:
        raise ValueError(
            f"prompt {Lp} + max_new {max_new} + draft window {k + 1} "
            f"exceeds max_len {M}"
        )
    out, rounds, drafted, accepted = _spec_generate(
        cfg_t, params_t, cfg_d, params_d, prompt, max_new, k, M, impl,
        kv_quant,
    )
    return out[None, :], SpecStats(rounds, drafted, accepted)
