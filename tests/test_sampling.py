"""Sampling tests: greedy equivalence, top-k/top-p support restriction,
temperature determinism under fixed keys."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import SamplingConfig, generate, greedy_generate, sample

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def test_greedy_config_matches_argmax(rng):
    logits = jnp.asarray(rng.normal(size=(4, 50)).astype(np.float32))
    out = sample(logits, None, SamplingConfig())
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support(rng):
    logits = jnp.asarray(rng.normal(size=(64, 50)).astype(np.float32))
    cfg = SamplingConfig(temperature=1.0, top_k=5)
    out = np.asarray(sample(logits, jax.random.PRNGKey(0), cfg))
    top5 = np.argsort(-np.asarray(logits), axis=-1)[:, :5]
    for b in range(64):
        assert out[b] in top5[b]


def test_top_p_restricts_support(rng):
    # peaked distribution: one token has ~all the mass
    logits = np.full((8, 20), -5.0, np.float32)
    logits[np.arange(8), np.arange(8)] = 10.0
    cfg = SamplingConfig(temperature=1.0, top_p=0.9)
    out = np.asarray(sample(jnp.asarray(logits), jax.random.PRNGKey(1), cfg))
    np.testing.assert_array_equal(out, np.arange(8))


def test_sampled_generate_deterministic_under_key():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jnp.ones((1, 4), jnp.int32)
    scfg = SamplingConfig(temperature=0.8, top_k=20)
    a = generate(cfg, params, prompt, 6, max_len=16, sampling=scfg,
                 key=jax.random.PRNGKey(7))
    b = generate(cfg, params, prompt, 6, max_len=16, sampling=scfg,
                 key=jax.random.PRNGKey(7))
    c = generate(cfg, params, prompt, 6, max_len=16, sampling=scfg,
                 key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1, 6)
    # different key should (almost surely) differ somewhere on a random model
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_generate_default_is_greedy():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jnp.ones((1, 4), jnp.int32)
    a = generate(cfg, params, prompt, 5, max_len=16)
    b = greedy_generate(cfg, params, prompt, 5, max_len=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
