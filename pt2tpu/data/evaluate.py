"""Perplexity evaluation — reference protocol, batched and jitted.

Mirrors ref utils.py:128-186: non-overlapping ``seq_len`` windows over the
evaluation token stream, next-token cross-entropy with the first token of
each window unpredicted, ppl = exp(total_nll / total_predicted_tokens).

TPU-shaped: windows are batched and the loss is computed in one jitted
forward per batch (f32 logsumexp), instead of the reference's per-window
Python loop with HF ``labels=`` losses.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec

__all__ = ["evaluate_perplexity", "window_nll"]


def window_nll(cfg, params, tokens: jax.Array, impl: str = "auto"):
    """Sum NLL over next-token predictions of (B, L) windows.

    Returns (total_nll f32, token_count) — predictions are positions 1..L-1,
    matching the reference masking (target[:, :-trg_len] = -100 on full
    windows predicts L-1 tokens per window, utils.py:169-183).
    """
    logits = dec.forward(cfg, params, tokens, impl=impl)  # (B, L, V)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = logz - tgt_logit
    return jnp.sum(nll), nll.size


def evaluate_perplexity(
    cfg,
    params,
    tokens: np.ndarray,  # 1-D evaluation token stream
    seq_len: int = 2048,
    batch_size: int = 4,
    max_windows: Optional[int] = None,
    impl: str = "auto",
) -> Dict[str, float]:
    """Strided-window perplexity over a token stream.

    Returns {"ppl", "nll_per_token", "tokens"}.
    """
    seq_len = min(seq_len, len(tokens))
    n_win = len(tokens) // seq_len
    if max_windows is not None:
        n_win = min(n_win, max_windows)
    if n_win == 0:
        raise ValueError(f"stream of {len(tokens)} tokens < seq_len {seq_len}")
    windows = np.stack(
        [tokens[i * seq_len : (i + 1) * seq_len] for i in range(n_win)]
    ).astype(np.int32)

    # params must be a jit ARGUMENT: closing over them bakes the full model
    # into the lowered module as constants (measured 7.5 GB captured for the
    # fp16 7B checkpoint — glacial compile, doubled host RAM).
    fn = jax.jit(lambda p, t: window_nll(cfg, p, t, impl=impl))
    total_nll, total_tok = 0.0, 0
    for i in range(0, n_win, batch_size):
        batch = windows[i : i + batch_size]
        # A ragged final batch gets its own (single) compile — cheaper than
        # polluting the ppl with padded garbage windows.
        nll, cnt = fn(params, jnp.asarray(batch))
        total_nll += float(nll)
        total_tok += int(cnt)
    nll_per_tok = total_nll / max(total_tok, 1)
    return {
        "ppl": float(np.exp(nll_per_tok)),
        "nll_per_token": nll_per_tok,
        "tokens": total_tok,
    }
