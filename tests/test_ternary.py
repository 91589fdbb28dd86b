"""Golden + property tests for the ATQ core (pt2tpu.core.ternary) against the
NumPy oracle re-deriving the reference math (tests/oracle.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracle
from pt2tpu.core import ternary as atq


def _rand_W(rng, n=16, m=64, loc=0.03):
    # Non-zero mean to exercise the asymmetric offset path.
    return (rng.normal(loc, 1.0, size=(n, m))).astype(np.float32)


def _rand_S(rng, m, rows=256):
    X = rng.normal(0.0, 1.0, size=(rows, m)).astype(np.float32)
    return (X.T @ X).astype(np.float32), X


@pytest.mark.parametrize("shape", [(8, 32), (16, 128), (5, 37)])
def test_ternary_init_matches_oracle(rng, shape):
    W = _rand_W(rng, *shape)
    a_o, mu_o, T_o = oracle.ternary_init(W.astype(np.float64))
    a, mu, T = atq.ternary_init(jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(T), T_o, atol=0)
    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), mu_o, rtol=1e-5)


def test_optimal_grid_matches_oracle(rng):
    W = _rand_W(rng)
    _, _, T = oracle.ternary_init(W.astype(np.float64))
    a_o, mu_o = oracle.optimal_grid(W.astype(np.float64), T)
    a, mu = atq.optimal_grid(jnp.asarray(W), jnp.asarray(T, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), mu_o, rtol=1e-4, atol=1e-6)


def test_optimal_grid_is_optimal(rng):
    """Property: closed form beats any perturbed grid (Eq. 9 optimality)."""
    W = _rand_W(rng, 4, 48)
    _, _, T = oracle.ternary_init(W)
    a, mu = atq.optimal_grid(jnp.asarray(W), jnp.asarray(T, dtype=jnp.float32))
    base = float(atq.quantization_error(jnp.asarray(W), a * jnp.asarray(T, jnp.float32) + mu))
    for da, dmu in [(1e-3, 0), (0, 1e-3), (-1e-3, 1e-3), (1e-2, -1e-2)]:
        pert = float(
            atq.quantization_error(
                jnp.asarray(W), (a + da) * jnp.asarray(T, jnp.float32) + (mu + dmu)
            )
        )
        assert pert >= base - 1e-9


def test_flexible_round_matches_oracle(rng):
    W = _rand_W(rng)
    a, mu, _ = oracle.ternary_init(W.astype(np.float64))
    T_o = oracle.flexible_round(W.astype(np.float64), a, mu)
    T = atq.flexible_round(
        jnp.asarray(W), jnp.asarray(a, jnp.float32), jnp.asarray(mu, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(T), T_o, atol=0)


@pytest.mark.parametrize("shape", [(8, 32), (16, 128), (7, 51)])
def test_itf_matches_oracle(rng, shape):
    W = _rand_W(rng, *shape)
    a0, mu0, T0 = oracle.ternary_init(W)  # float32 path so T trajectories match
    a_o, mu_o, T_o = oracle.itf(W, a0, mu0, T0)
    a, mu, T = atq.itf(
        jnp.asarray(W),
        jnp.asarray(a0, jnp.float32),
        jnp.asarray(mu0, jnp.float32),
        jnp.asarray(T0, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(T), T_o, atol=0)
    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), mu_o, rtol=1e-4, atol=1e-6)


def test_itf_reduces_error(rng):
    W = _rand_W(rng, 32, 128)
    a0, mu0, T0 = oracle.ternary_init(W)
    e0 = np.sum((W - (a0 * T0 + mu0)) ** 2)
    res = atq.atq_quantize(jnp.asarray(W), use_aga=False)
    e1 = float(atq.quantization_error(jnp.asarray(W), atq.dequantize(*res)))
    assert e1 <= e0 + 1e-6


def test_aga_matches_oracle(rng):
    W = _rand_W(rng, 8, 40)
    S, _ = _rand_S(rng, 40)
    _, _, T = oracle.itf(W, *oracle.ternary_init(W))
    a_o, mu_o = oracle.aga(W.astype(np.float64), T, S.astype(np.float64))
    a, mu = atq.aga(jnp.asarray(W), jnp.asarray(T, jnp.float32), jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mu), mu_o, rtol=1e-3, atol=1e-5)


def test_aga_scale_invariance(rng):
    """AGA(alpha, mu) is invariant to positive rescaling of S — this is what
    lets the engine feed the normalized Hessian instead of raw X^T X."""
    W = _rand_W(rng, 8, 40)
    S, _ = _rand_S(rng, 40)
    _, _, T = oracle.itf(W, *oracle.ternary_init(W))
    Tj = jnp.asarray(T, jnp.float32)
    a1, mu1 = atq.aga(jnp.asarray(W), Tj, jnp.asarray(S))
    a2, mu2 = atq.aga(jnp.asarray(W), Tj, jnp.asarray(S / 977.0))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-4, atol=1e-6)


def test_aga_output_error_near_or_below_itf(rng):
    """The reference's AGA closed form (quantizer.py:238-246) solves an
    *approximate* normal equation — it uses (T∘T)S1 where the exact minimizer
    of E_x needs the full quadratic form t_i S t_i^T — so it is only
    guaranteed optimal for diagonal S. Property: with generic S it must stay
    within a small factor of the ITF grid's output error, and with diagonal S
    it must not increase it."""
    W = _rand_W(rng, 16, 64)
    S, X = _rand_S(rng, 64)
    Wj, Sj = jnp.asarray(W), jnp.asarray(S)
    res_no = atq.atq_quantize(Wj, use_aga=False)
    res_aga = atq.atq_quantize(Wj, Sj, use_aga=True)
    Xj = jnp.asarray(X)
    e_no = float(atq.output_error(Wj, atq.dequantize(*res_no), Xj))
    e_aga = float(atq.output_error(Wj, atq.dequantize(*res_aga), Xj))
    assert e_aga <= e_no * 1.05

    # Diagonal S: reference formula coincides with the exact minimizer.
    sdiag = np.abs(rng.normal(1.0, 0.2, size=64)).astype(np.float32)
    Xd = (rng.normal(size=(512, 64)) * np.sqrt(sdiag)).astype(np.float32)
    Sd = jnp.asarray(np.diag((Xd**2).sum(axis=0)).astype(np.float32))
    res_no_d = atq.atq_quantize(Wj, use_aga=False)
    res_aga_d = atq.atq_quantize(Wj, Sd, use_aga=True)
    # E_x under the diagonal metric: sum_j s_jj * ||dW[:, j]||^2
    def metric(res):
        dW = np.asarray(Wj - atq.dequantize(*res))
        return float((np.asarray(Sd).diagonal() * (dW**2).sum(axis=0)).sum())

    assert metric(res_aga_d) <= metric(res_no_d) + 1e-3


def test_masked_padding_equivalence(rng):
    """ATQ on a zero-padded block with a validity mask must equal ATQ on the
    unpadded block — the contract the fixed-shape GPTQ loop relies on."""
    W = _rand_W(rng, 8, 51)
    S, _ = _rand_S(rng, 51)
    res_ref = atq.atq_quantize(jnp.asarray(W), jnp.asarray(S))

    pad = 64 - 51
    Wp = np.pad(W, ((0, 0), (0, pad)))
    Wp[:, 51:] = rng.normal(size=(8, pad))  # garbage in pad lanes
    Sp = np.pad(S, ((0, pad), (0, pad)))
    Sp[51:, :] = rng.normal(size=(pad, 64))
    mask = np.arange(64) < 51
    res_pad = atq.atq_quantize(
        jnp.asarray(Wp, jnp.float32), jnp.asarray(Sp, jnp.float32), mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(res_pad.T[:, :51]), np.asarray(res_ref.T), atol=0
    )
    np.testing.assert_allclose(np.asarray(res_pad.alpha), np.asarray(res_ref.alpha), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_pad.mu), np.asarray(res_ref.mu), rtol=1e-4, atol=1e-6
    )
    assert np.all(np.asarray(res_pad.T[:, 51:]) == 0)


def test_vmap_batching(rng):
    """vmap over stacked blocks must equal per-block calls (batched ITF)."""
    Ws = np.stack([_rand_W(rng, 8, 32) for _ in range(5)])
    batched = jax.vmap(lambda w: atq.atq_quantize(w, use_aga=False))(jnp.asarray(Ws))
    for i in range(5):
        single = atq.atq_quantize(jnp.asarray(Ws[i]), use_aga=False)
        np.testing.assert_allclose(np.asarray(batched.T[i]), np.asarray(single.T), atol=0)
        np.testing.assert_allclose(
            np.asarray(batched.alpha[i]), np.asarray(single.alpha), rtol=1e-5
        )


def test_aga_exact_is_monotone(rng):
    """Exact AGA solves the true normal equations, so for fixed T the output
    error under the S metric can never exceed the ITF grid's — for ANY S."""
    for trial in range(5):
        W = _rand_W(rng, 12, 48)
        X = rng.normal(size=(64, 48)).astype(np.float32)
        X += trial * 0.5 * X.mean(axis=1, keepdims=True)  # varying correlation
        S = (X.T @ X).astype(np.float32)
        a0, mu0, T = oracle.itf(W, *oracle.ternary_init(W))
        Tj = jnp.asarray(T, jnp.float32)
        a1, m1 = atq.aga_exact(
            jnp.asarray(W), Tj, jnp.asarray(S),
            fallback=(jnp.asarray(a0, jnp.float32), jnp.asarray(mu0, jnp.float32)),
        )

        def s_err(a, m):
            dW = np.asarray(W - (np.asarray(a) * T + np.asarray(m)))
            return float(np.einsum("ij,jk,ik->", dW, S, dW))

        assert s_err(a1, m1) <= s_err(a0, mu0) * (1 + 1e-5), trial


def test_aga_exact_beats_reference_on_correlated_S(rng):
    """On strongly-correlated S (the SSR regime) the exact solve must not
    blow up where the reference approximation does."""
    m = 32
    base = rng.normal(size=(16, 1))
    W = (base + 0.01 * rng.normal(size=(16, m))).astype(np.float32)
    u = np.abs(rng.normal(size=(m, 1))).astype(np.float32)
    S = u @ u.T + 0.01 * np.diag(np.abs(rng.normal(size=m)).astype(np.float32))
    a0, mu0, T = oracle.itf(W, *oracle.ternary_init(W))
    fb = (jnp.asarray(a0, jnp.float32), jnp.asarray(mu0, jnp.float32))
    Tj = jnp.asarray(T, jnp.float32)
    ae, me = atq.aga_exact(jnp.asarray(W), Tj, jnp.asarray(S, jnp.float32), fallback=fb)

    def s_err(a, m_):
        dW = np.asarray(W - (np.asarray(a) * T + np.asarray(m_)))
        return float(np.einsum("ij,jk,ik->", dW, S, dW))

    base_err = s_err(a0, mu0)
    assert s_err(ae, me) <= base_err * (1 + 1e-5)


def test_aga_degenerate_denominator_fallback(rng):
    """Near-rank-one S (SSR groups near-identical columns) degenerates the
    AGA normal system; the guarded form must keep the finite ITF grid rather
    than the reference's exploding 1e-8-clamped closed form."""
    m = 32
    base = rng.normal(size=(16, 1))
    W = (base + 1e-4 * rng.normal(size=(16, m))).astype(np.float32)
    u = rng.normal(size=(m, 1)).astype(np.float32)
    S = (u @ u.T + 1e-7 * np.eye(m, dtype=np.float32))  # ~rank-1 covariance
    res = atq.atq_quantize(jnp.asarray(W), jnp.asarray(S), use_aga=True)
    W_hat = np.asarray(atq.dequantize(*res))
    assert np.all(np.isfinite(W_hat))
    assert np.abs(W_hat).max() < 10 * np.abs(W).max() + 1.0


def test_zero_weight_block(rng):
    """All-zero block: T=0 everywhere, alpha/mu finite (clamp semantics)."""
    W = jnp.zeros((4, 32), jnp.float32)
    res = atq.atq_quantize(W, use_aga=False)
    assert np.all(np.asarray(res.T) == 0)
    assert np.all(np.isfinite(np.asarray(res.alpha)))
    assert np.all(np.isfinite(np.asarray(res.mu)))
