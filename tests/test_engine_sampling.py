"""Engine-integrated sampling + speculative decoding tests.

No reference counterpart (the reference never generates — SURVEY.md §3.5);
these cover the round-2 engine features: per-request sampling runs inside
the jitted decode step with per-row parameters, and the speculative path
(draft pool + one (B, k+1) per-row verify) is token-exact vs the plain
greedy engine.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve.engine import ServeEngine
from pt2tpu.serve.sampling import SamplingConfig, sample_per_row

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(scope="module")
def model():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def other_model():
    """A second tiny model sharing the vocab — an imperfect draft."""
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(99), dtype=jnp.float32)
    return cfg, params


def _run_engine(cfg, params, prompts, max_news, sampl=None, **kw):
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64, **kw)
    reqs = [
        eng.submit(p, m, sampling=(sampl[i] if sampl else None))
        for i, (p, m) in enumerate(zip(prompts, max_news))
    ]
    eng.run(max_steps=300)
    assert all(r.done for r in reqs)
    return eng, reqs


# ------------------------------------------------------- sample_per_row --
def test_sample_per_row_greedy_rows_exact():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 50))
    toks = sample_per_row(
        logits, key,
        uids=jnp.arange(4), positions=jnp.zeros(4, jnp.int32),
        temps=jnp.zeros(4, jnp.float32),
        top_ks=jnp.zeros(4, jnp.int32),
        top_ps=jnp.ones(4, jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(toks), np.asarray(jnp.argmax(logits, -1))
    )


def test_sample_per_row_respects_top_k():
    """With top_k=3 every sampled token must be among the 3 largest."""
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(2), (2, 40))
    top3 = np.argsort(-np.asarray(logits), axis=-1)[:, :3]
    for pos in range(50):
        toks = np.asarray(sample_per_row(
            logits, key,
            uids=jnp.arange(2),
            positions=jnp.full((2,), pos, jnp.int32),
            temps=jnp.full((2,), 1.5, jnp.float32),
            top_ks=jnp.full((2,), 3, jnp.int32),
            top_ps=jnp.ones(2, jnp.float32),
        ))
        for b in range(2):
            assert toks[b] in top3[b], (pos, b, toks[b], top3[b])


def test_sample_per_row_key_independent_of_batch():
    """Row keys depend on (uid, position) only — the same request sampled
    in a different slot / batch mix gets the same tokens."""
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(jax.random.PRNGKey(3), (3, 64))
    kw = dict(
        temps=jnp.full((3,), 0.9, jnp.float32),
        top_ks=jnp.zeros(3, jnp.int32),
        top_ps=jnp.ones(3, jnp.float32),
    )
    a = np.asarray(sample_per_row(
        logits, key, uids=jnp.asarray([5, 6, 7]),
        positions=jnp.asarray([10, 11, 12]), **kw,
    ))
    b = np.asarray(sample_per_row(
        logits[::-1], key, uids=jnp.asarray([7, 6, 5]),
        positions=jnp.asarray([12, 11, 10]), **kw,
    ))
    np.testing.assert_array_equal(a, b[::-1])


# ------------------------------------------------------ engine sampling --
def test_engine_sampled_deterministic_and_valid(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (3, 5, 4)]
    sc = SamplingConfig(temperature=0.8, top_k=20)
    _, r1 = _run_engine(cfg, params, prompts, [6, 5, 7], sampl=[sc] * 3,
                        seed=42)
    _, r2 = _run_engine(cfg, params, prompts, [6, 5, 7], sampl=[sc] * 3,
                        seed=42)
    for a, b in zip(r1, r2):
        assert a.out == b.out  # same seed => same stream
        assert all(0 <= t < cfg.vocab_size for t in a.out)
        assert len(a.out) == a.max_new
    _, r3 = _run_engine(cfg, params, prompts, [6, 5, 7], sampl=[sc] * 3,
                        seed=43)
    assert any(a.out != c.out for a, c in zip(r1, r3))  # seed matters


def test_engine_mixed_greedy_rows_unaffected(model):
    """Greedy requests batched WITH sampled requests must produce exactly
    the tokens of an all-greedy engine run."""
    cfg, params = model
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (4, 6, 3, 5)]
    max_news = [5, 6, 4, 5]
    _, greedy_reqs = _run_engine(cfg, params, prompts, max_news)
    sc = SamplingConfig(temperature=1.0, top_p=0.9)
    mixed = [None, sc, None, sc]
    _, mixed_reqs = _run_engine(cfg, params, prompts, max_news, sampl=mixed)
    for i in (0, 2):  # the greedy rows
        assert mixed_reqs[i].out == greedy_reqs[i].out


# --------------------------------------------------- speculative engine --
def test_spec_engine_exact_perfect_draft(model):
    """Draft == target: every draft accepted, outputs still token-exact."""
    cfg, params = model
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (3, 7, 5, 4, 6)]
    max_news = [6, 4, 8, 5, 7]
    _, want = _run_engine(cfg, params, prompts, max_news)
    eng, got = _run_engine(
        cfg, params, prompts, max_news, draft=(cfg, params), spec_k=3
    )
    for w, g in zip(want, got):
        assert g.out == w.out, (g.uid, g.out, w.out)
    assert eng.stats_spec["accepted"] == eng.stats_spec["drafted"]
    # perfect draft: rows advance k+1 per step => far fewer steps
    assert eng.stats["steps"] < sum(max_news)


def test_spec_engine_exact_imperfect_draft(model, other_model):
    """A random unrelated draft (low acceptance) must still be exact."""
    cfg, params = model
    _, params_d = other_model
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (4, 6, 3)]
    max_news = [7, 5, 6]
    _, want = _run_engine(cfg, params, prompts, max_news)
    eng, got = _run_engine(
        cfg, params, prompts, max_news, draft=(cfg, params_d), spec_k=3
    )
    for w, g in zip(want, got):
        assert g.out == w.out, (g.uid, g.out, w.out)
    assert eng.stats_spec["accepted"] <= eng.stats_spec["drafted"]


def test_spec_engine_eos_stop(model):
    cfg, params = model
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)
    # find the 3rd greedy token and use it as eos
    _, ref = _run_engine(cfg, params, [prompt], [8])
    eos = ref[0].out[2]
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64,
                      draft=(cfg, params), spec_k=3)
    req = eng.submit(prompt, 8, eos_id=eos)
    eng.run(max_steps=100)
    assert req.done and req.out[-1] == eos
    assert req.out == ref[0].out[: req.out.index(eos) + 1 if eos in req.out
                                 else len(req.out)]


def test_spec_engine_sampled_requests(model, other_model):
    """Speculative SAMPLING (rejection scheme): sampled requests ride the
    draft/verify path — deterministic per seed, valid tokens; greedy rows
    in the same batch stay exact vs the plain greedy engine."""
    cfg, params = model
    _, params_d = other_model
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (4, 6)]
    sc = SamplingConfig(temperature=0.9, top_k=24)
    mixed = [sc, None]  # one sampled + one greedy, same spec engine

    _, a = _run_engine(cfg, params, prompts, [7, 6], sampl=mixed,
                       draft=(cfg, params_d), spec_k=3, seed=11)
    _, b = _run_engine(cfg, params, prompts, [7, 6], sampl=mixed,
                       draft=(cfg, params_d), spec_k=3, seed=11)
    assert a[0].out == b[0].out  # sampled stream deterministic per seed
    assert all(0 <= t < cfg.vocab_size for t in a[0].out)
    assert len(a[0].out) == 7

    # the greedy row must match the NON-speculative greedy engine exactly
    _, want = _run_engine(cfg, params, [prompts[1]], [6])
    assert a[1].out == want[0].out


def test_spec_accept_math_is_target_distributed():
    """The rejection scheme's emitted tokens are distributed exactly as
    target-only sampling (empirical TV vs analytic acceptance rate)."""
    from pt2tpu.serve.sampling import _spec_keys, spec_accept_per_row

    key = jax.random.PRNGKey(0)
    V, k, N = 8, 1, 30000
    rng = np.random.default_rng(0)
    pt0 = rng.dirichlet(np.ones(V)).astype(np.float32)
    pd0 = rng.dirichlet(np.ones(V)).astype(np.float32)
    pt = jnp.tile(jnp.asarray(pt0)[None, None], (N, k + 1, 1))
    pd = jnp.tile(jnp.asarray(pd0)[None, None], (N, k, 1))
    uids = jnp.zeros((N,), jnp.int32)
    positions = jnp.arange(N, dtype=jnp.int32) * 10
    kd = _spec_keys(key, uids, positions, k, salt=1)
    drafts = jax.vmap(jax.vmap(jax.random.categorical))(
        kd, jnp.log(pd + 1e-20)
    ).astype(jnp.int32)
    tokens, n_acc = spec_accept_per_row(key, uids, positions, drafts, pd, pt)
    emp = np.bincount(np.asarray(tokens[:, 0]), minlength=V) / N
    tv = 0.5 * np.abs(emp - pt0).sum()
    assert tv < 0.02, tv
    acc = float(np.mean(np.asarray(n_acc) == k))
    theory = float(np.minimum(pt0, pd0).sum())
    assert abs(acc - theory) < 0.02, (acc, theory)


def test_engine_snapshot_restore_mid_flight(model, tmp_path):
    """Preemption recovery: snapshot a live engine mid-decode, restore
    into a fresh process-equivalent engine, and finish — token-identical
    to the uninterrupted run (per-(seed,uid,position) sampling keys make
    the random stream restore-safe)."""
    from pt2tpu.serve.engine import load_engine_state, save_engine_state

    cfg, params = model
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (4, 6, 5)]
    max_news = [8, 7, 9]
    sc = SamplingConfig(temperature=0.8, top_k=16)
    sampl = [None, sc, None]

    # uninterrupted reference
    _, want = _run_engine(cfg, params, prompts, max_news, sampl=sampl,
                          seed=3)

    # interrupted run: 3 steps, snapshot, restore into a fresh engine
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64, seed=3)
    for i, (p, m) in enumerate(zip(prompts, max_news)):
        eng.submit(p, m, sampling=sampl[i])
    for _ in range(3):
        eng.step()
    save_engine_state(eng, str(tmp_path / "snap"))

    eng2 = ServeEngine(cfg, params, max_batch=2, max_len=64, seed=3)
    restored = load_engine_state(eng2, str(tmp_path / "snap"))
    eng2.run(max_steps=300)
    got = {r.uid: r.out for r in restored}
    for w in want:
        assert got[w.uid] == w.out, (w.uid, got[w.uid], w.out)
