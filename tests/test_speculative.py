"""Speculative decoding (serve/speculative.py): greedy spec-decode must be
token-for-token identical to target-only greedy decoding, for any draft."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate
from pt2tpu.serve.speculative import speculative_generate

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def _models():
    cfg_t = get_config("tiny-llama")
    params_t = dec.init_params(cfg_t, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg_d = cfg_t.with_(n_layers=1)
    params_d = dec.init_params(cfg_d, jax.random.PRNGKey(7), dtype=jnp.float32)
    return cfg_t, params_t, cfg_d, params_d


@pytest.mark.parametrize("k", [1, 3, 4])
def test_speculative_matches_greedy(rng, k):
    cfg_t, params_t, cfg_d, params_d = _models()
    prompt = jnp.asarray(rng.integers(0, cfg_t.vocab_size, (1, 5)), jnp.int32)
    want = np.asarray(
        greedy_generate(cfg_t, params_t, prompt, max_new=12, max_len=64)
    )
    got, stats = speculative_generate(
        cfg_t, params_t, cfg_d, params_d, prompt, max_new=12, k=k, max_len=64
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert stats.rounds >= 1 and stats.drafted == stats.rounds * k
    assert 0 <= stats.accepted <= stats.drafted


def test_speculative_perfect_draft(rng):
    """Draft == target: near-total acceptance in ~ceil((max_new-1)/(k+1))
    rounds. (Not exactly 1.0: the 1-token draft step and the (k+1)-token
    verify forward are different XLA programs, so float reduction order can
    flip an occasional argmax tie — output exactness is unaffected.)"""
    cfg_t, params_t, _, _ = _models()
    prompt = jnp.asarray(rng.integers(0, cfg_t.vocab_size, (1, 4)), jnp.int32)
    want = np.asarray(
        greedy_generate(cfg_t, params_t, prompt, max_new=9, max_len=64)
    )
    got, stats = speculative_generate(
        cfg_t, params_t, cfg_t, params_t, prompt, max_new=9, k=4, max_len=64
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # the k+1th draft step keeps the draft cache hole-free across fully
    # accepted rounds, so a perfect draft should accept ~everything (only
    # cross-program float-reduction argmax ties can break a match)
    assert stats.acceptance_rate >= 0.95
    assert stats.rounds <= 2  # vs 8 single-token steps without drafting


def test_speculative_sliding_family(rng):
    """gemma3 target (sliding windows + dual RoPE) through the verify path."""
    cfg_t = get_config("tiny-gemma3")
    params_t = dec.init_params(cfg_t, jax.random.PRNGKey(2), dtype=jnp.float32)
    cfg_d = cfg_t.with_(n_layers=2)
    params_d = dec.init_params(cfg_d, jax.random.PRNGKey(3), dtype=jnp.float32)
    prompt = jnp.asarray(rng.integers(0, cfg_t.vocab_size, (1, 6)), jnp.int32)
    want = np.asarray(
        greedy_generate(cfg_t, params_t, prompt, max_new=8, max_len=64)
    )
    got, _ = speculative_generate(
        cfg_t, params_t, cfg_d, params_d, prompt, max_new=8, k=3, max_len=64
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_speculative_validation(rng):
    cfg_t, params_t, cfg_d, params_d = _models()
    with pytest.raises(ValueError, match="single-sequence"):
        speculative_generate(
            cfg_t, params_t, cfg_d, params_d,
            jnp.zeros((2, 4), jnp.int32), max_new=4,
        )
