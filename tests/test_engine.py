"""Continuous-batching engine tests: interleaved requests must reproduce the
lockstep greedy_generate outputs exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate
from pt2tpu.serve.engine import ServeEngine

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(params=["tiny-llama", "tiny-opt", "tiny-gemma3"])
def model(request):
    cfg = get_config(request.param)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _reference(cfg, params, prompt, max_new):
    out = greedy_generate(
        cfg, params, jnp.asarray(prompt[None, :]), max_new=max_new, max_len=64
    )
    return np.asarray(out)[0].tolist()


def test_engine_matches_greedy(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
        for l in (3, 5, 9, 4, 7)
    ]
    max_news = [6, 4, 5, 7, 3]

    eng = ServeEngine(cfg, params, max_batch=2, max_len=64)
    reqs = [eng.submit(p, m) for p, m in zip(prompts, max_news)]
    eng.run(max_steps=200)

    assert all(r.done for r in reqs)
    assert eng.stats["completed"] == 5
    for r, p, m in zip(reqs, prompts, max_news):
        want = _reference(cfg, params, p, m)
        assert r.out == want, (r.uid, r.out, want)


def test_engine_slot_reuse_no_stale_state(model):
    """A slot reused after a long request must not leak stale KV."""
    cfg, params = model
    rng = np.random.default_rng(1)
    long_p = rng.integers(0, cfg.vocab_size, size=12).astype(np.int32)
    short_p = rng.integers(0, cfg.vocab_size, size=3).astype(np.int32)

    eng = ServeEngine(cfg, params, max_batch=1, max_len=64)
    r1 = eng.submit(long_p, 8)
    r2 = eng.submit(short_p, 8)
    eng.run(max_steps=100)
    assert r1.out == _reference(cfg, params, long_p, 8)
    assert r2.out == _reference(cfg, params, short_p, 8)


def test_engine_eos_stop(model):
    cfg, params = model
    rng = np.random.default_rng(2)
    p = rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)
    ref = _reference(cfg, params, p, 8)
    eos = ref[-1]
    stop_at = ref.index(eos)  # first occurrence is where the engine stops
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64)
    r = eng.submit(p, 8, eos_id=eos)
    eng.run(max_steps=100)
    assert r.out == ref[: stop_at + 1]


def test_engine_rejects_too_long(model):
    cfg, params = model
    eng = ServeEngine(cfg, params, max_batch=1, max_len=16)
    r = eng.submit(np.zeros(10, np.int32), 20)
    eng.run(max_steps=10)
    assert r.done and r.out == []


def test_engine_int8_kv(model):
    cfg, params = model
    rng = np.random.default_rng(3)
    p = rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64, kv_quant=True)
    r = eng.submit(p, 6)
    eng.run(max_steps=50)
    assert r.done and len(r.out) == 6
