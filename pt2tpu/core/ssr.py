"""Structural Similarity-based Reordering (SSR) — jittable, masked.

TPU-native redesign of the reference SSR module (`/root/reference/reorder.py`):

  * ``cosine_similarity_matrix``   — ref reorder.py:15-33
  * ``similarity_to_mean``         — ref reorder.py:36-61, masked form
  * ``select_block``               — ref reorder.py:107-143, as a fixed-shape
                                     masked top-k instead of a shrinking
                                     ragged index set
  * ``static_reorder_indices``     — ref reorder.py:64-104 greedy clustering
  * ``block_variance``             — ref reorder.py:207-221 diagnostic

Key design change: the reference maintains a shrinking ``remaining_indices``
tensor (dynamic shape — hostile to XLA). Here selection state is a fixed
(m,) boolean ``available`` mask; unavailable columns score ``-inf`` and a
single ``lax.top_k`` over all m columns picks the next block. This keeps
every shape static so the whole GPTQ block loop jits (see quant/gptq.py).

Semantics note vs the reference: when fewer than ``block_size`` columns
remain, the reference short-circuits and keeps them in original order
(reorder.py:125-126) while this version still orders them by similarity.
Ordering *within* a block never changes the quantized weights (ATQ's closed
forms and GPTQ's error propagation are column-permutation-equivariant), only
the stored permutation — see tests/test_gptq.py for the equivalence check.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_similarity_matrix",
    "similarity_to_mean",
    "select_block",
    "static_reorder_indices",
    "apply_permutation",
    "apply_permutation_to_input",
    "block_variance",
]

_EPS = 1e-8
_NEG_INF = -jnp.inf


def cosine_similarity_matrix(W: jax.Array) -> jax.Array:
    """Pairwise column cosine similarity S = Ŵ^T Ŵ (ref reorder.py:15-33)."""
    norms = jnp.maximum(jnp.linalg.norm(W, axis=0, keepdims=True), _EPS)
    Wn = W / norms
    return Wn.T @ Wn


def similarity_to_mean(W: jax.Array, available: Optional[jax.Array] = None) -> jax.Array:
    """Cosine similarity of each available column to the mean of available
    columns (ref reorder.py:36-61). Unavailable columns score ``-inf``.

    Args:
      W: (n, m) weight matrix.
      available: (m,) bool mask of not-yet-quantized columns (None = all).

    Returns:
      (m,) similarity scores; ``-inf`` on unavailable columns.
    """
    n, m = W.shape
    if available is None:
        available = jnp.ones((m,), dtype=bool)
    msk = available.astype(W.dtype)
    count = jnp.maximum(jnp.sum(msk), 1.0)

    w_mean = jnp.sum(W * msk[None, :], axis=1, keepdims=True) / count  # (n, 1)
    w_mean_n = w_mean / jnp.maximum(jnp.linalg.norm(w_mean), _EPS)
    col_norms = jnp.maximum(jnp.linalg.norm(W, axis=0), _EPS)  # (m,)
    sims = (W.T @ w_mean_n)[:, 0] / col_norms  # (m,)
    return jnp.where(available, sims, _NEG_INF)


def select_block(
    W: jax.Array,
    available: jax.Array,
    block_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick the next SSR block: top-``block_size`` columns by similarity to
    the mean of the available columns (ref reorder.py:107-143).

    Fixed-shape variant: always returns exactly ``block_size`` indices. When
    fewer than ``block_size`` columns are available, the extra lanes point at
    exhausted columns and are flagged invalid in ``lane_valid``.

    Returns:
      block_indices: (block_size,) int32 original-column indices.
      lane_valid:    (block_size,) bool — lane held an available column.
      new_available: (m,) updated availability mask.
    """
    sims = similarity_to_mean(W, available)
    _, block_indices = jax.lax.top_k(sims, block_size)
    lane_valid = available[block_indices]
    new_available = available.at[block_indices].set(False)
    return block_indices.astype(jnp.int32), lane_valid, new_available


def static_reorder_indices(W: jax.Array, block_size: int = 128) -> jax.Array:
    """Greedy full-matrix reordering (ref reorder.py:64-104).

    Seeds at the column with max similarity row-sum, then repeatedly appends
    the unselected column with highest mean similarity to the selected set.
    O(m^2) with a ``fori_loop`` over fixed shapes (running mean of selected
    similarity columns instead of re-gathering the growing cluster).
    """
    del block_size  # reference signature keeps it; unused there too
    n, m = W.shape
    S = cosine_similarity_matrix(W)

    row_sums = jnp.sum(S, axis=1)
    start = jnp.argmax(row_sums).astype(jnp.int32)

    perm0 = jnp.zeros((m,), dtype=jnp.int32).at[0].set(start)
    selected0 = jnp.zeros((m,), dtype=bool).at[start].set(True)
    # Running sum of S[:, j] over selected j — mean similarity to cluster is
    # sum / k, and argmax is invariant to the positive 1/k factor.
    simsum0 = S[:, start]

    def body(k, state):
        perm, selected, simsum = state
        scores = jnp.where(selected, _NEG_INF, simsum)
        nxt = jnp.argmax(scores).astype(jnp.int32)
        return (
            perm.at[k].set(nxt),
            selected.at[nxt].set(True),
            simsum + S[:, nxt],
        )

    perm, _, _ = jax.lax.fori_loop(1, m, body, (perm0, selected0, simsum0))
    return perm


def apply_permutation(W: jax.Array, perm: jax.Array) -> jax.Array:
    """Column permutation W' = W P (ref reorder.py:192-194)."""
    return W[:, perm]


def apply_permutation_to_input(X: jax.Array, perm: jax.Array) -> jax.Array:
    """Feature permutation of activations (ref reorder.py:197-204);
    accepts any leading batch/sequence dims."""
    return jnp.take(X, perm, axis=-1)


def block_variance(W: jax.Array, block_size: int) -> jax.Array:
    """Per-block variance diagnostic (ref reorder.py:207-221).

    Returns (ceil(m / block_size),) variances; a trailing ragged block is
    computed over its true width. Lower variance ⇒ more homogeneous blocks.
    """
    n, m = W.shape
    nb = -(-m // block_size)
    pad = nb * block_size - m
    Wp = jnp.pad(W, ((0, 0), (0, pad)))
    msk = jnp.pad(jnp.ones((m,), W.dtype), (0, pad)).reshape(nb, block_size)
    Wb = Wp.reshape(n, nb, block_size).transpose(1, 0, 2)  # (nb, n, bs)
    cnt = jnp.maximum(msk.sum(axis=1) * n, 1.0)  # valid elements per block
    mean = (Wb * msk[:, None, :]).sum(axis=(1, 2)) / cnt
    sq = ((Wb - mean[:, None, None]) ** 2 * msk[:, None, :]).sum(axis=(1, 2))
    # torch.var defaults to the unbiased (n-1) estimator (reorder.py:219).
    return sq / jnp.maximum(cnt - 1.0, 1.0)
