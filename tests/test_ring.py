"""Ring KV cache (serve/ring.py): window-sized caches on sliding layers
must reproduce flat-cache greedy decoding exactly, across the eviction
boundary."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate
from pt2tpu.serve.ring import init_ring_caches, ring_generate
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def _check(cfg, params, rng, Lp, max_new, max_len=96):
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, Lp)), jnp.int32)
    want = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=max_new, max_len=max_len,
                        impl="xla")
    )
    got = np.asarray(
        ring_generate(cfg, params, prompt, max_new=max_new, max_len=max_len,
                      impl="xla")
    )
    np.testing.assert_array_equal(got, want)


def test_ring_matches_flat_past_eviction(rng):
    """tiny-gemma3 (W=16): decode far past the window so ring slots wrap."""
    cfg = get_config("tiny-gemma3")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    _check(cfg, params, rng, Lp=9, max_new=24)


def test_ring_prefill_longer_than_window(rng):
    """Prompt longer than the window: prefill scatter must keep only the
    newest W positions, in the right ring slots."""
    cfg = get_config("tiny-gemma3")
    params = dec.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    _check(cfg, params, rng, Lp=23, max_new=10)


def test_ring_quantized_params(rng):
    cfg = get_config("tiny-gemma3")
    params = random_ternary_params(cfg, jax.random.PRNGKey(2), perm_mode="ssr")
    _check(cfg, params, rng, Lp=7, max_new=20)


def test_ring_plain_model_degenerates_to_flat(rng):
    """Non-sliding config: everything goes through the global stack."""
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    _check(cfg, params, rng, Lp=6, max_new=8)


def test_ring_cache_memory_shape():
    cfg = get_config("tiny-gemma3")  # 4 layers: 2 sliding, 2 global; W=16
    caches = init_ring_caches(cfg, batch=2, max_len=96)
    assert caches.ring.k.shape[:3] == (2, 2, 16)  # window-sized
    assert caches.glob.k.shape[:3] == (2, 2, 96)  # full-length


def test_ring_engine_matches_default(rng):
    """Continuous-batching engine with ring pools == default flat-pool
    engine, including a prompt longer than the window (ring gather wrap)."""
    from pt2tpu.serve.engine import ServeEngine
    from pt2tpu.serve.ring import make_ring_engine_fns

    cfg = get_config("tiny-gemma3")  # W=16
    params = dec.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
        for l in (3, 23, 9, 5)  # 23 > W: prefill wrap
    ]
    max_news = [6, 5, 7, 4]

    def run(engine):
        reqs = [engine.submit(p, m) for p, m in zip(prompts, max_news)]
        engine.run(max_steps=200)
        return [r.out for r in reqs]

    want = run(ServeEngine(cfg, params, max_batch=2, max_len=64, impl="xla"))
    pf, df, factory = make_ring_engine_fns(cfg, impl="xla")
    got = run(
        ServeEngine(
            cfg, params, max_batch=2, max_len=64, impl="xla",
            prefill_fn=pf, decode_fn=df, cache_factory=factory,
        )
    )
    assert got == want


def test_ring_engine_plain_model(rng):
    """Non-sliding config through the ring engine fns: all-global path."""
    from pt2tpu.serve.engine import ServeEngine
    from pt2tpu.serve.ring import make_ring_engine_fns

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    p = rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)

    def run(engine):
        r = engine.submit(p, 6)
        engine.run(max_steps=50)
        return r.out

    want = run(ServeEngine(cfg, params, max_batch=1, max_len=64, impl="xla"))
    pf, df, factory = make_ring_engine_fns(cfg, impl="xla")
    got = run(
        ServeEngine(
            cfg, params, max_batch=1, max_len=64, impl="xla",
            prefill_fn=pf, decode_fn=df, cache_factory=factory,
        )
    )
    assert got == want
