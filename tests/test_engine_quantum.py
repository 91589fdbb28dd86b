"""Multi-step decode quantum (_decode_quantum): the engine with
decode_quantum > 1 must be token-identical to the single-step engine —
same outputs for greedy and sampled rows, EOS truncation mid-quantum,
staggered admissions, and the paged engine. (The quantum only changes
HOST dispatch granularity; SURVEY §5's serving scheduler has no reference
counterpart — the reference has no serving at all.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve.engine import ServeEngine
from pt2tpu.serve.sampling import SamplingConfig

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(scope="module")
def model():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _run(cfg, params, reqs, quantum, engine_cls=ServeEngine, **kw):
    eng = engine_cls(
        cfg, params, max_batch=2, max_len=64, decode_quantum=quantum, **kw
    )
    rs = [eng.submit(p, m, **extra) for p, m, extra in reqs]
    eng.run(max_steps=500)
    assert all(r.done for r in rs)
    return [r.out for r in rs]


def _mk_reqs(cfg, lens, news, seed=0, extras=None):
    rng = np.random.default_rng(seed)
    extras = extras or [{}] * len(lens)
    return [
        (rng.integers(0, cfg.vocab_size, size=l).astype(np.int32), m, e)
        for l, m, e in zip(lens, news, extras)
    ]


@pytest.mark.parametrize("quantum", [2, 4, 16])
def test_quantum_token_identical_greedy(model, quantum):
    cfg, params = model
    reqs = _mk_reqs(cfg, (3, 5, 9, 4, 7), (6, 4, 5, 7, 3))
    base = _run(cfg, params, reqs, 1)
    got = _run(cfg, params, reqs, quantum)
    assert got == base


def test_quantum_token_identical_sampled(model):
    """Per-(seed, uid, position) sampling keys survive the quantum: keys
    depend only on position, which advances inside the scan."""
    cfg, params = model
    sc = SamplingConfig(temperature=0.8, top_k=7)
    extras = [{"sampling": sc}, {}, {"sampling": sc}]
    reqs = _mk_reqs(cfg, (4, 6, 3), (8, 5, 6), extras=extras)
    base = _run(cfg, params, reqs, 1, seed=3)
    got = _run(cfg, params, reqs, 4, seed=3)
    assert got == base


def test_quantum_eos_truncates_mid_quantum(model):
    """A row whose EOS lands mid-quantum retires with the tail truncated,
    and the freed slot serves the next request without stale KV."""
    cfg, params = model
    rng = np.random.default_rng(7)
    p1 = rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)
    p2 = rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)

    # find the greedy continuation's 3rd token to use as the EOS id, so
    # the stop triggers mid-way through an 8-token quantum
    probe = _run(cfg, params, [(p1, 8, {})], 1)[0]
    eos = probe[2]

    reqs = [(p1, 8, {"eos_id": eos}), (p2, 6, {})]
    base = _run(cfg, params, reqs, 1)
    got = _run(cfg, params, reqs, 8)
    assert got == base
    # the stop genuinely fired mid-quantum (quantum 8 spans all 8 steps)
    assert got[0][-1] == eos and len(got[0]) < 8


def test_quantum_respects_max_new_capacity(model):
    """min-remaining bounds the quantum: a request sized so that
    prompt + max_new == max_len must not overflow the pool."""
    cfg, params = model
    rng = np.random.default_rng(11)
    p = rng.integers(0, cfg.vocab_size, size=31).astype(np.int32)
    base = _run(cfg, params, [(p, 32, {})], 1)
    got = _run(cfg, params, [(p, 32, {})], 16)
    assert got == base


def test_quantum_paged_engine(model):
    cfg, params = model
    from pt2tpu.serve.paged import PagedServeEngine

    reqs = _mk_reqs(cfg, (3, 6, 5), (6, 5, 7), seed=2)
    base = _run(cfg, params, reqs, 1)
    got = _run(
        cfg, params, reqs, 4, engine_cls=PagedServeEngine
    )
    assert got == base
