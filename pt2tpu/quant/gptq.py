"""Unified GPTQ + SSR + ATQ ternarization engine — one jitted program.

This replaces *both* reference implementations (the driver-inlined loop at
main.py:102-230 and the standalone class at gptq.py:21-230 — SURVEY.md §1
notes they duplicate each other) with a single engine whose entire block loop
is a fixed-shape ``lax.fori_loop`` inside one ``jit``:

  reference (ragged, Python)                 here (static, XLA)
  ------------------------------------       --------------------------------
  shrinking ``remaining_indices`` tensor  →  (m,) boolean ``available`` mask
  ``select_next_block_ssr`` top-k over    →  masked ``lax.top_k`` over all m
    a ragged slice                            columns (core/ssr.py)
  per-block ragged ATQ                    →  mask-aware ATQ on fixed
                                             (n, block_size) lanes
  ``W[:, rem] -= err @ Hinv[blk,rem]/d``  →  full-width update masked by the
    (ref main.py:198-214)                    updated availability mask

Canonical layout (fixes SURVEY.md §2.4-1/2): codes ``T`` are stored in
**visit order** — column ``k`` of ``T`` corresponds to original column
``perm[k]`` — and ``alpha``/``mu`` are per-(row, visit-block). Lanes past the
true column count (when m % block_size != 0, or exhausted SSR lanes) carry
``perm[k] == m`` (a pad slot) and ``lane_valid[k] == False``; ``T`` is zero
there and dequantization scatters only valid lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import ssr as ssr_mod
from ..core import ternary as atq_mod
from .hessian import damped_inverse

__all__ = [
    "TernaryLayerQuant",
    "ternary_gptq",
    "quantize_layer_weights",
    "dequantize_layer",
]


class TernaryLayerQuant(NamedTuple):
    """Quantized parameters for one linear layer (canonical visit-order layout)."""

    T: jax.Array  # (n, K) int8 ternary codes in visit order, K = nb * block_size
    alpha: jax.Array  # (n, nb) float32 per-block scale
    mu: jax.Array  # (n, nb) float32 per-block offset
    perm: jax.Array  # (K,) int32: visit position -> original column; pad lanes -> m
    lane_valid: jax.Array  # (K,) bool

    @property
    def num_blocks(self) -> int:
        return self.alpha.shape[-1]

    @property
    def block_size(self) -> int:
        return self.T.shape[-1] // self.alpha.shape[-1]


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "use_ssr", "use_aga", "max_iter", "aga_mode"),
)
def ternary_gptq(
    W: jax.Array,
    H: jax.Array,
    H_inv: jax.Array,
    *,
    block_size: int = 128,
    use_ssr: bool = True,
    use_aga: bool = True,
    max_iter: int = 100,
    aga_mode: str = "exact",
) -> TernaryLayerQuant:
    """Block-wise ternarization with Hessian error compensation.

    Args:
      W:      (n, m) float weight matrix (out_features, in_features).
      H:      (m, m) normalized, *undamped* Hessian X^T X / N — consumed by
              AGA as the covariance statistic (equivalent to the reference
              driver's sliced activations, main.py:177-180; AGA is invariant
              to positive rescaling of S).
      H_inv:  (m, m) inverse of the *damped* Hessian (from
              ``hessian.damped_inverse``), used for error propagation
              (ref main.py:198-214).
    """
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    H_inv = H_inv.astype(jnp.float32)
    n, m = W.shape
    if H.shape != (m, m) or H_inv.shape != (m, m):
        raise ValueError(
            f"H/H_inv must be ({m}, {m}) to match W's in_features; "
            f"got H {H.shape}, H_inv {H_inv.shape}"
        )
    # A block can't be wider than the matrix (the reference clamps likewise,
    # gptq.py:129); with bs <= m the masked top_k below is always legal.
    bs = min(block_size, m)
    nb = -(-m // bs)

    def body(k, state):
        W_work, available, T_out, alpha_out, mu_out, perm_out, valid_out = state

        if use_ssr:
            idx, lane_valid, new_avail = ssr_mod.select_block(W_work, available, bs)
        else:
            pos = k * bs + jnp.arange(bs, dtype=jnp.int32)
            lane_valid = pos < m
            idx = jnp.minimum(pos, m - 1)
            new_avail = available.at[idx].set(False)

        lane_mask = lane_valid.astype(jnp.float32)
        W_blk = jnp.take(W_work, idx, axis=1)  # (n, bs)
        S_blk = H[jnp.ix_(idx, idx)] if use_aga else None

        res = atq_mod.atq_quantize(
            W_blk,
            S_blk,
            mask=lane_valid,
            use_aga=use_aga,
            max_iter=max_iter,
            aga_mode=aga_mode,
        )

        W_q = res.alpha * res.T + res.mu
        err = (W_blk - W_q) * lane_mask[None, :]  # (n, bs)

        # Error propagation to still-available columns (ref main.py:198-214):
        #   W[:, rem] -= err @ (H_inv[blk, rem] / H_inv[blk, blk])
        Hinv_rows = jnp.take(H_inv, idx, axis=0)  # (bs, m)
        diag = jnp.maximum(H_inv[idx, idx], 1e-8)  # (bs,)
        coeff = Hinv_rows / diag[:, None]
        update = err @ coeff  # (n, m)
        W_work = W_work - update * new_avail.astype(jnp.float32)[None, :]

        return (
            W_work,
            new_avail,
            T_out.at[k].set(res.T.astype(jnp.int8)),
            alpha_out.at[k].set(res.alpha[:, 0]),
            mu_out.at[k].set(res.mu[:, 0]),
            perm_out.at[k].set(jnp.where(lane_valid, idx, m)),
            valid_out.at[k].set(lane_valid),
        )

    state0 = (
        W,
        jnp.ones((m,), dtype=bool),
        jnp.zeros((nb, n, bs), dtype=jnp.int8),
        jnp.zeros((nb, n), dtype=jnp.float32),
        jnp.zeros((nb, n), dtype=jnp.float32),
        jnp.full((nb, bs), m, dtype=jnp.int32),
        jnp.zeros((nb, bs), dtype=bool),
    )
    _, _, T_out, alpha_out, mu_out, perm_out, valid_out = jax.lax.fori_loop(
        0, nb, body, state0
    )

    return TernaryLayerQuant(
        T=T_out.transpose(1, 0, 2).reshape(n, nb * bs),
        alpha=alpha_out.T,
        mu=mu_out.T,
        perm=perm_out.reshape(nb * bs),
        lane_valid=valid_out.reshape(nb * bs),
    )


def quantize_layer_weights(
    W: jax.Array,
    H_raw: jax.Array,
    nsamples: int,
    *,
    block_size: int = 128,
    percdamp: float = 0.01,
    use_ssr: bool = True,
    use_aga: bool = True,
    max_iter: int = 100,
    aga_mode: str = "exact",
) -> TernaryLayerQuant:
    """Convenience wrapper: normalize + damp + invert the Hessian, then run
    the jitted engine. ``H_raw`` is the un-normalized sum X^T X over
    ``nsamples`` calibration rows (ref gptq.py:75-76, 94-98)."""
    H = H_raw.astype(jnp.float32) / max(nsamples, 1)
    _, H_inv = damped_inverse(H, percdamp)
    return ternary_gptq(
        W,
        H,
        H_inv,
        block_size=block_size,
        use_ssr=use_ssr,
        use_aga=use_aga,
        max_iter=max_iter,
        aga_mode=aga_mode,
    )


@functools.partial(jax.jit, static_argnames=("m",))
def dequantize_layer(q: TernaryLayerQuant, m: int) -> jax.Array:
    """Reconstruct the (n, m) dequantized weights in original column order.

    One consistent layout (unlike ref main.py:313-335, which double-permutes —
    SURVEY.md §2.4-1): column k of the visit-order reconstruction
    ``alpha_b T[:, k] + mu_b`` scatters to original column ``perm[k]``;
    invalid lanes target the pad slot m and are dropped.
    """
    n, K = q.T.shape
    nb = q.alpha.shape[-1]
    bs = K // nb
    alpha_e = jnp.repeat(q.alpha, bs, axis=1)  # (n, K)
    mu_e = jnp.repeat(q.mu, bs, axis=1)
    W_visit = alpha_e * q.T.astype(jnp.float32) + mu_e
    W_visit = W_visit * q.lane_valid.astype(jnp.float32)[None, :]
    W_pad = jnp.zeros((n, m + 1), dtype=jnp.float32)
    W_pad = W_pad.at[:, q.perm].set(W_visit)
    return W_pad[:, :m]
