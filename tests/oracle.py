"""NumPy oracle re-deriving the reference math (ragged, loopy, exact).

This is a straight re-derivation of the PT²-LLM reference semantics
(`/root/reference/quantizer.py`, `reorder.py`, `main.py:102-230`) in plain
NumPy — intentionally written the "reference way" (Python loops, shrinking
index arrays) so golden tests can pin the TPU engine's fixed-shape masked
implementation (pt2tpu.quant.gptq) against the intended math. See SURVEY.md
§4 (test strategy) and §2.4 for the reference quirks deliberately *not*
reproduced (inconsistent dequant layout; here the oracle accumulates the
dequantized matrix consistently at selection time, matching
gptq.py:get_quantized_weight rather than main.py:_dequantize_weight).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-8


# ---------------------------------------------------------------- ATQ ----
def ternary_init(W):
    mu = W.mean(axis=1, keepdims=True)
    Wc = W - mu
    delta = 0.75 * np.abs(Wc).mean(axis=1, keepdims=True)
    T = np.zeros_like(W)
    T[Wc > delta] = 1.0
    T[Wc < -delta] = -1.0
    numer = (T * Wc).sum(axis=1, keepdims=True)
    denom = np.maximum(np.abs(T).sum(axis=1, keepdims=True), EPS)
    return numer / denom, mu, T


def optimal_grid(W, T):
    m = W.shape[1]
    WT = (W * T).sum(axis=1, keepdims=True)
    Ts = T.sum(axis=1, keepdims=True)
    Ws = W.sum(axis=1, keepdims=True)
    T2 = (T * T).sum(axis=1, keepdims=True)
    denom = np.maximum(m * T2 - Ts**2, EPS)
    return (m * WT - Ts * Ws) / denom, (T2 * Ws - Ts * WT) / denom


def flexible_round(W, alpha, mu):
    Z = (W - mu) / np.maximum(alpha, EPS)
    T = np.zeros_like(W)
    T[Z > 0.5] = 1.0
    T[Z < -0.5] = -1.0
    return T


def itf(W, alpha, mu, T, max_iter=100):
    T_prev = np.zeros_like(T)
    for _ in range(max_iter):
        if np.array_equal(T, T_prev):
            break
        T_prev = T.copy()
        alpha, mu = optimal_grid(W, T)
        T = flexible_round(W, alpha, mu)
    return alpha, mu, T


def aga(W, T, S, fallback=None):
    """S = X^T X (m, m), consumed directly (driver path, main.py:177-180).

    ``fallback``: deliberate deviation from the raw reference (which clamps
    the denominator to 1e-8, quantizer.py:240, and explodes when the normal
    system is near-singular): rows with degenerate denominators keep the ITF
    grid. The TPU engine implements the same guard (core/ternary.py)."""
    s1 = S.sum(axis=1)  # S @ 1
    d = s1.sum()
    v = T @ s1[:, None]
    WS1 = W @ s1[:, None]
    WT_S1 = (W * T) @ s1[:, None]
    T2_S1 = (T * T) @ s1[:, None]
    denom_raw = d * T2_S1 - v * v
    denom = np.maximum(denom_raw, EPS)
    alpha = (d * WT_S1 - v * WS1) / denom
    mu = (T2_S1 * WS1 - v * WT_S1) / denom
    if fallback is not None:
        scale = np.abs(d * T2_S1) + v * v + EPS
        ok = denom_raw > 1e-6 * scale
        alpha = np.where(ok, alpha, fallback[0])
        mu = np.where(ok, mu, fallback[1])
    return alpha, mu


def atq_quantize(W, S=None, max_iter=100):
    alpha, mu, T = ternary_init(W)
    alpha, mu, T = itf(W, alpha, mu, T, max_iter=max_iter)
    if S is not None:
        alpha, mu = aga(W, T, S, fallback=(alpha, mu))
    return alpha, mu, T


# ---------------------------------------------------------------- SSR ----
def similarity_to_mean(W, indices):
    Wr = W[:, indices]
    w_mean = Wr.mean(axis=1, keepdims=True)
    w_mean_n = w_mean / max(np.linalg.norm(w_mean), EPS)
    Wn = Wr / np.maximum(np.linalg.norm(Wr, axis=0, keepdims=True), EPS)
    return (Wn.T @ w_mean_n)[:, 0]


def select_next_block(W, remaining, block_size):
    """ref reorder.py:107-143 incl. the <=block_size short-circuit."""
    if len(remaining) <= block_size:
        return remaining, np.array([], dtype=remaining.dtype)
    sims = similarity_to_mean(W, remaining)
    order = np.argsort(-sims, kind="stable")[:block_size]
    block = remaining[order]
    mask = np.ones(len(remaining), dtype=bool)
    mask[order] = False
    return block, remaining[mask]


def greedy_reorder(W):
    """ref reorder.py:64-104 static greedy clustering."""
    norms = np.maximum(np.linalg.norm(W, axis=0, keepdims=True), EPS)
    Wn = W / norms
    S = Wn.T @ Wn
    m = W.shape[1]
    selected = np.zeros(m, dtype=bool)
    perm = [int(np.argmax(S.sum(axis=1)))]
    selected[perm[0]] = True
    while len(perm) < m:
        cluster_sim = S[:, perm].mean(axis=1)
        cluster_sim[selected] = -np.inf
        nxt = int(np.argmax(cluster_sim))
        perm.append(nxt)
        selected[nxt] = True
    return np.array(perm)


# --------------------------------------------------------------- GPTQ ----
def damped_hessian(H_norm, percdamp=0.01):
    damp = percdamp * np.diag(H_norm).mean()
    return H_norm + damp * np.eye(H_norm.shape[0])


def quantize_layer(
    W,
    H_norm,
    block_size=128,
    percdamp=0.01,
    use_ssr=True,
    use_aga=True,
    max_iter=100,
):
    """Mirror of the reference driver loop (main.py:102-230) with the
    H-submatrix AGA statistic (scale-equivalent to sliced activations).

    Returns dict with visit-order blocks and the consistently-dequantized
    weight matrix in original column order.
    """
    W = W.astype(np.float64).copy()
    n, m = W.shape
    Hd = damped_hessian(H_norm.astype(np.float64), percdamp)
    H_inv = np.linalg.inv(Hd)

    W_hat = np.zeros_like(W)
    alphas, mus, Ts, perm = [], [], [], []
    remaining = np.arange(m)

    while len(remaining) > 0:
        if use_ssr:
            block, remaining = select_next_block(W, remaining, block_size)
        else:
            block = remaining[:block_size]
            remaining = remaining[block_size:]
        perm.extend(block.tolist())

        W_blk = W[:, block]
        S_blk = H_norm[np.ix_(block, block)] if use_aga else None
        alpha_b, mu_b, T_b = atq_quantize(W_blk, S_blk, max_iter=max_iter)

        Wq = alpha_b * T_b + mu_b
        W_hat[:, block] = Wq
        err = W_blk - Wq

        if len(remaining) > 0:
            coeff = H_inv[np.ix_(block, remaining)] / np.maximum(
                H_inv[block, block], EPS
            )[:, None]
            W[:, remaining] -= err @ coeff

        alphas.append(alpha_b)
        mus.append(mu_b)
        Ts.append(T_b)

    return {
        "alpha": np.concatenate(alphas, axis=1),
        "mu": np.concatenate(mus, axis=1),
        "T_blocks": Ts,  # ragged list, visit order
        "perm": np.array(perm),
        "W_hat": W_hat,
    }
