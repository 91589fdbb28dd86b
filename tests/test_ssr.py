"""Tests for SSR (pt2tpu.core.ssr) against the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

import oracle
from pt2tpu.core import ssr


def test_cosine_similarity_matrix(rng):
    W = rng.normal(size=(16, 24)).astype(np.float32)
    Wn = W / np.maximum(np.linalg.norm(W, axis=0, keepdims=True), 1e-8)
    S_o = Wn.T @ Wn
    S = ssr.cosine_similarity_matrix(jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(S), S_o, rtol=1e-5, atol=1e-6)


def test_similarity_to_mean_matches_oracle(rng):
    W = rng.normal(0.05, 1.0, size=(16, 40)).astype(np.float32)
    remaining = np.array([0, 3, 5, 7, 11, 13, 20, 21, 33, 39])
    sims_o = oracle.similarity_to_mean(W, remaining)
    available = np.zeros(40, dtype=bool)
    available[remaining] = True
    sims = np.asarray(ssr.similarity_to_mean(jnp.asarray(W), jnp.asarray(available)))
    np.testing.assert_allclose(sims[remaining], sims_o, rtol=1e-4, atol=1e-6)
    assert np.all(np.isneginf(sims[~available]))


def test_select_block_matches_oracle_set_and_order(rng):
    W = rng.normal(size=(16, 64)).astype(np.float32)
    remaining = np.arange(64)
    block_o, rem_o = oracle.select_next_block(W, remaining, 16)
    available = np.ones(64, dtype=bool)
    idx, valid, new_avail = ssr.select_block(jnp.asarray(W), jnp.asarray(available), 16)
    idx = np.asarray(idx)
    # Same columns in the same (similarity-descending) order for a full block.
    np.testing.assert_array_equal(idx, block_o)
    assert np.all(np.asarray(valid))
    np.testing.assert_array_equal(np.where(~np.asarray(new_avail))[0], np.sort(block_o))


def test_select_block_final_partial_block(rng):
    """When fewer columns remain than block_size, extra lanes are invalid and
    the valid lanes cover exactly the remaining set."""
    W = rng.normal(size=(8, 20)).astype(np.float32)
    available = np.zeros(20, dtype=bool)
    remaining = np.array([2, 5, 9, 17])
    available[remaining] = True
    idx, valid, new_avail = ssr.select_block(jnp.asarray(W), jnp.asarray(available), 8)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid.sum() == 4
    np.testing.assert_array_equal(np.sort(idx[valid]), remaining)
    assert not np.any(np.asarray(new_avail))


def test_static_reorder_matches_oracle(rng):
    W = rng.normal(size=(12, 30)).astype(np.float32)
    perm_o = oracle.greedy_reorder(W)
    perm = np.asarray(ssr.static_reorder_indices(jnp.asarray(W)))
    np.testing.assert_array_equal(perm, perm_o)


def test_block_variance(rng):
    W = rng.normal(size=(8, 37)).astype(np.float32)
    bv = np.asarray(ssr.block_variance(jnp.asarray(W), 16))
    expected = []
    for i in range(0, 37, 16):
        blk = W[:, i : min(i + 16, 37)]
        expected.append(blk.var(ddof=1))  # torch.var default: unbiased
    np.testing.assert_allclose(bv, expected, rtol=1e-5)
