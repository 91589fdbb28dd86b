"""End-to-end golden tests: the jitted fixed-shape GPTQ engine must reproduce
the reference math (NumPy oracle) for every mode combination."""

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from pt2tpu.quant import gptq, hessian


def _layer_problem(rng, n=24, m=64, rows=256):
    W = rng.normal(0.02, 1.0, size=(n, m)).astype(np.float32)
    X = rng.normal(0.0, 1.0, size=(rows, m)).astype(np.float32)
    # mildly correlated activations (realistic Hessian structure)
    X += 0.3 * X.mean(axis=1, keepdims=True)
    H_norm = (X.T @ X / rows).astype(np.float32)
    return W, H_norm


def _run_engine(W, H_norm, **kw):
    Hd, Hinv = hessian.damped_inverse(jnp.asarray(H_norm), kw.pop("percdamp", 0.01))
    # Golden tests pin the reference AGA closed form (the oracle re-derives
    # the reference math); the engine's default is the exact solve.
    kw.setdefault("aga_mode", "reference")
    q = gptq.ternary_gptq(jnp.asarray(W), jnp.asarray(H_norm), Hinv, **kw)
    W_hat = gptq.dequantize_layer(q, W.shape[1])
    return q, np.asarray(W_hat)


def _assert_reconstruction_close(W_hat, W_ref, frac_tol=0.01):
    """fp32 engine vs fp64 oracle: ITF is a discrete fixed-point iteration, so
    elements sitting exactly on a rounding boundary can flip between dtypes.
    Require (a) the overwhelming majority of elements to match tightly and
    (b) the overall reconstruction energy to agree."""
    denom = np.maximum(np.abs(W_ref), 1e-3)
    mismatch = np.abs(W_hat - W_ref) / denom > 2e-3
    assert mismatch.mean() <= frac_tol, f"{mismatch.mean():.4%} elements diverged"
    rel_fro = np.linalg.norm(W_hat - W_ref) / np.linalg.norm(W_ref)
    assert rel_fro < 5e-3, f"relative Frobenius error {rel_fro:.2e}"


@pytest.mark.parametrize("use_ssr,use_aga", [(True, True), (True, False), (False, True), (False, False)])
def test_engine_matches_oracle(rng, use_ssr, use_aga):
    W, H_norm = _layer_problem(rng)
    ref = oracle.quantize_layer(
        W, H_norm, block_size=16, use_ssr=use_ssr, use_aga=use_aga
    )
    q, W_hat = _run_engine(
        W, H_norm, block_size=16, use_ssr=use_ssr, use_aga=use_aga
    )
    _assert_reconstruction_close(W_hat, ref["W_hat"])
    if not use_ssr:
        # Sequential order: per-block params must match exactly too.
        np.testing.assert_allclose(
            np.asarray(q.alpha), ref["alpha"], rtol=5e-2, atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(q.mu), ref["mu"], rtol=5e-2, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(q.perm), ref["perm"])


def test_engine_nondivisible_m(rng):
    """m not a multiple of block_size: pad lanes must be invalid, perm must
    cover each real column exactly once, dequant must match the oracle."""
    W, H_norm = _layer_problem(rng, n=10, m=53)
    ref = oracle.quantize_layer(W, H_norm, block_size=16, use_ssr=True, use_aga=True)
    q, W_hat = _run_engine(W, H_norm, block_size=16, use_ssr=True, use_aga=True)
    valid = np.asarray(q.lane_valid)
    perm = np.asarray(q.perm)
    assert valid.sum() == 53
    np.testing.assert_array_equal(np.sort(perm[valid]), np.arange(53))
    assert np.all(perm[~valid] == 53)
    _assert_reconstruction_close(W_hat, ref["W_hat"])


def test_engine_nondivisible_m_sequential(rng):
    W, H_norm = _layer_problem(rng, n=10, m=53)
    ref = oracle.quantize_layer(W, H_norm, block_size=16, use_ssr=False, use_aga=True)
    q, W_hat = _run_engine(W, H_norm, block_size=16, use_ssr=False, use_aga=True)
    _assert_reconstruction_close(W_hat, ref["W_hat"])
    valid = np.asarray(q.perm)[np.asarray(q.lane_valid)]
    np.testing.assert_array_equal(valid, np.arange(53))


def test_gptq_beats_naive_blockwise(rng):
    """Quality property: Hessian-weighted output error of the GPTQ result
    should beat independent per-block ATQ (the whole point of compensation)."""
    W, H_norm = _layer_problem(rng, n=32, m=64)
    _, W_hat = _run_engine(W, H_norm, block_size=16, use_ssr=True, use_aga=True)

    ref_naive = oracle.quantize_layer(
        W, np.eye(64, dtype=np.float32), block_size=16, use_ssr=False, use_aga=False
    )
    D = W - W_hat
    Dn = W - ref_naive["W_hat"]
    e_gptq = np.trace(D @ H_norm @ D.T)
    e_naive = np.trace(Dn @ H_norm @ Dn.T)
    assert e_gptq < e_naive


def test_hessian_accumulator(rng):
    X1 = rng.normal(size=(4, 8, 16)).astype(np.float32)
    X2 = rng.normal(size=(32, 16)).astype(np.float32)
    acc = hessian.HessianAccumulator(16)
    acc.update(jnp.asarray(X1))
    acc.update(jnp.asarray(X2))
    Xall = np.concatenate([X1.reshape(-1, 16), X2], axis=0)
    np.testing.assert_allclose(
        np.asarray(acc.normalized()), Xall.T @ Xall / 64, rtol=1e-4, atol=1e-5
    )
    assert acc.nsamples == 64


def test_damped_inverse_escalation():
    """A singular Hessian must still produce a finite inverse."""
    H = np.zeros((8, 8), dtype=np.float32)
    H[0, 0] = 1.0  # rank-1: plain Cholesky would fail
    Hd, Hinv = hessian.damped_inverse(jnp.asarray(H), percdamp=0.01)
    assert np.all(np.isfinite(np.asarray(Hinv)))


def test_dequantize_layer_scatter(rng):
    """dequantize_layer inverts the visit-order layout exactly."""
    W, H_norm = _layer_problem(rng, n=8, m=32)
    q, W_hat = _run_engine(W, H_norm, block_size=8, use_ssr=True, use_aga=False)
    # Manual reconstruction from visit-order pieces.
    K = q.T.shape[1]
    bs = q.block_size
    manual = np.zeros((8, 32))
    Tn = np.asarray(q.T, dtype=np.float64)
    alpha, mu = np.asarray(q.alpha), np.asarray(q.mu)
    perm, valid = np.asarray(q.perm), np.asarray(q.lane_valid)
    for k in range(K):
        if valid[k]:
            b = k // bs
            manual[:, perm[k]] = alpha[:, b] * Tn[:, k] + mu[:, b]
    np.testing.assert_allclose(W_hat, manual, rtol=1e-5, atol=1e-6)
