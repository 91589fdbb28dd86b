"""Debug utilities + engine stress: concurrent submissions from threads must
serialize safely through the host scheduler."""

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate
from pt2tpu.serve.engine import ServeEngine
from pt2tpu.utils.debug import assert_finite_tree, nan_debug

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def test_assert_finite_tree_catches_nan():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite_tree(good)
    bad = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match="b.*c"):
        assert_finite_tree(bad, "params")


def test_nan_debug_context():
    with nan_debug():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / x)(jnp.zeros(1)).block_until_ready()
    assert not jax.config.jax_debug_nans


def test_engine_threaded_submissions():
    """Many threads submitting while one thread drives step(): the host
    scheduler must stay consistent (all requests complete with correct
    outputs). The engine guards admission with a lock-free single-driver
    model: submit() only appends to a Python list (GIL-atomic)."""
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=3 + i % 5).astype(np.int32)
               for i in range(8)]
    reqs = []
    lock = threading.Lock()

    def submitter(p):
        r = eng.submit(p, 4)
        with lock:
            reqs.append((p, r))

    threads = [threading.Thread(target=submitter, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng.run(max_steps=500)

    assert eng.stats["completed"] == 8
    for p, r in reqs:
        want = np.asarray(
            greedy_generate(cfg, params, jnp.asarray(p[None]), max_new=4, max_len=64)
        )[0].tolist()
        assert r.out == want
