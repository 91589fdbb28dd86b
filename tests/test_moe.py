"""Mixture-of-experts tests: routed decoder forward, top-k decode fast path,
per-expert GPTQ quantization, and expert-parallel shard_map execution.

The reference has no MoE support at all (ref model.py:162-171 discovers
dense nn.Linear only) — this whole family is new-framework scope
(SURVEY.md §2.3 expert-parallelism row, VERDICT round-1 item 4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.ops.ternary_matmul import PackedTernaryLinear
from pt2tpu.parallel.ep import ep_moe_mlp, ep_param_specs, shard_moe_layer
from pt2tpu.quant.pipeline import QuantConfig, quantize_model
from pt2tpu.serve import forward_cached, init_cache, prefill

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(scope="module")
def moe_model():
    cfg = get_config("tiny-moe")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


@pytest.fixture(scope="module")
def moe_quantized(moe_model):
    cfg, params = moe_model
    # MoE needs a beefier calib set than the dense tiny models: each expert
    # only sees its routed (weighted) share of the tokens.
    calib = jax.random.randint(
        jax.random.PRNGKey(7), (8, 32), 0, cfg.vocab_size
    )
    qparams, report = quantize_model(cfg, params, calib, QuantConfig())
    return cfg, params, qparams, report


def test_moe_config():
    cfg = get_config("tiny-moe")
    assert cfg.is_moe and cfg.n_experts == 4 and cfg.experts_per_token == 2
    big = get_config("mixtral-8x7b")
    assert big.is_moe and big.n_experts == 8 and big.expert_inter == 14336
    qmoe = get_config("qwen3-30b-a3b")
    assert qmoe.n_experts == 128 and qmoe.expert_inter == 768


def test_moe_forward_finite_and_causal(moe_model):
    cfg, params = moe_model
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    l1 = dec.forward(cfg, params, toks)
    assert l1.shape == (1, 12, cfg.vocab_size)
    assert bool(jnp.isfinite(l1).all())
    toks2 = toks.at[0, 8].set((toks[0, 8] + 1) % cfg.vocab_size)
    l2 = dec.forward(cfg, params, toks2)
    np.testing.assert_allclose(
        np.asarray(l1[0, :8]), np.asarray(l2[0, :8]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[0, 8:]), np.asarray(l2[0, 8:]))


def test_router_weights_match_naive(moe_model):
    """moe_router_weights == naive softmax/top-k/renormalize oracle."""
    cfg, params = moe_model
    lp = dec.layer_slice(params["layers"], 0)
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 5, cfg.dim))
    wfull, topw, topi = dec.moe_router_weights(cfg, lp["router"], h)
    logits = np.asarray(h, np.float32) @ np.asarray(lp["router"].w, np.float32).T
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    want = np.zeros_like(probs)
    for b in range(2):
        for t in range(5):
            top = np.argsort(-probs[b, t])[: cfg.experts_per_token]
            w = probs[b, t, top]
            want[b, t, top] = w / w.sum()
    np.testing.assert_allclose(np.asarray(wfull), want, rtol=1e-5, atol=1e-6)
    # exactly k nonzeros per token
    assert int((np.asarray(wfull) > 0).sum(-1).max()) == cfg.experts_per_token
    np.testing.assert_allclose(
        np.asarray(topw).sum(-1), np.ones((2, 5)), rtol=1e-6
    )


def test_moe_decode_matches_full_forward(moe_model):
    """Cached token-by-token decode (top-k fast path: only the selected
    experts run) must equal the full uncached forward (dense all-expert
    combine) — the routing weights zero out unselected experts exactly."""
    cfg, params = moe_model
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 10), 0, cfg.vocab_size)
    full = dec.forward(cfg, params, toks)
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = prefill(cfg, params, toks[:, :4], cache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 3]), rtol=2e-4, atol=2e-4
    )
    for t in range(4, 10):
        logits, cache = forward_cached(
            cfg, params, toks[:, t : t + 1], cache, jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), rtol=5e-4, atol=5e-4,
            err_msg=f"t={t}",
        )


def test_moe_quantize_structure(moe_quantized):
    cfg, params, qparams, report = moe_quantized
    layers = qparams["layers"]
    # experts stack into one (L, E, ...) packed leaf set; gate/up are gone
    assert isinstance(layers["gateup"], PackedTernaryLinear)
    assert isinstance(layers["down"], PackedTernaryLinear)
    assert layers["gateup"].packed.shape[:2] == (cfg.n_layers, cfg.n_experts)
    assert "gate" not in layers and "up" not in layers
    assert layers["router"] is not None  # router stays dense
    for lr in report["layers"]:
        for name in ("gateup", "down", "qkv", "o"):
            assert np.isfinite(lr[name]["rel_out_err"]), (name, lr)
            assert lr[name]["rel_out_err"] < 0.5, (name, lr)


def test_moe_quantized_forward_correlated(moe_quantized):
    cfg, params, qparams, _ = moe_quantized
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, cfg.vocab_size)
    lf = dec.forward(cfg, params, toks)
    lq = dec.forward(cfg, qparams, toks)
    assert bool(jnp.isfinite(lq).all())
    a, b = np.asarray(lf).ravel(), np.asarray(lq).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.3, f"quantized MoE logits decorrelated: corr={corr:.3f}"


def test_moe_quantized_decode_matches_forward(moe_quantized):
    """Quantized decode (stacked scalar-prefetch expert kernel on the top-k
    fast path) must token-match the quantized uncached forward."""
    cfg, _, qparams, _ = moe_quantized
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, cfg.vocab_size)
    full = dec.forward(cfg, qparams, toks)
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = prefill(cfg, qparams, toks[:, :4], cache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 3]), rtol=2e-4, atol=2e-4
    )
    for t in range(4, 8):
        logits, cache = forward_cached(
            cfg, qparams, toks[:, t : t + 1], cache, jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), rtol=5e-4, atol=5e-4,
            err_msg=f"t={t}",
        )


def _expert_mesh(ways=4):
    devs = np.array(jax.devices()[:ways])
    return Mesh(devs, ("expert",))


def test_ep_dense_parity(moe_model):
    """shard_map EP (4-way expert axis) == single-device _moe_mlp, dense."""
    cfg, params = moe_model
    lp = dec.layer_slice(params["layers"], 0)
    h = jax.random.normal(jax.random.PRNGKey(6), (2, 6, cfg.dim))
    want = dec._moe_mlp(cfg, lp, h, "xla", 0)
    mesh = _expert_mesh(4)
    lp_sharded = shard_moe_layer(lp, mesh)
    got = ep_moe_mlp(cfg, lp_sharded, h, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ep_ternary_parity(moe_quantized):
    """shard_map EP on quantized expert-stacked ternary leaves == the
    single-device quantized _moe_mlp."""
    cfg, _, qparams, _ = moe_quantized
    lp = dec.layer_slice(qparams["layers"], 0)
    h = jax.random.normal(jax.random.PRNGKey(8), (2, 6, cfg.dim))
    want = dec._moe_mlp(cfg, lp, h, "xla", 0)
    mesh = _expert_mesh(4)
    lp_sharded = shard_moe_layer(lp, mesh)
    got = ep_moe_mlp(cfg, lp_sharded, h, mesh, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_ep_param_specs_shard_expert_dim(moe_quantized):
    cfg, _, qparams, _ = moe_quantized
    lp = dec.layer_slice(qparams["layers"], 0)
    specs = ep_param_specs(lp)
    gu = specs["gateup"]
    assert gu.packed[0] == "expert"
    assert specs["router"].w == jax.sharding.PartitionSpec()
    mesh = _expert_mesh(4)
    lp_sharded = shard_moe_layer(lp, mesh)
    # each device holds E/4 experts of the packed planes
    shard_shape = lp_sharded["gateup"].packed.sharding.shard_shape(
        lp_sharded["gateup"].packed.shape
    )
    assert shard_shape[0] == cfg.n_experts // 4


def test_gspmd_shardings_accept_moe(moe_quantized):
    """param_shardings on a ('data','model') mesh must produce valid specs
    for the expert-stacked leaves (expert dim replicated when there is no
    'expert' axis)."""
    from pt2tpu.parallel.sharding import param_shardings, shard_params

    cfg, _, qparams, _ = moe_quantized
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    sharded = shard_params(qparams, mesh)
    toks = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 0, cfg.vocab_size)
    want = dec.forward(cfg, qparams, toks)
    got = dec.forward(cfg, sharded, toks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_moe_engine_continuous_batching(moe_quantized):
    """The continuous batcher must serve the quantized MoE model: batched
    decode takes the dense all-expert combine path (B*L > 1), which must
    token-match the B=1 lockstep path per request."""
    from pt2tpu.serve import greedy_generate
    from pt2tpu.serve.engine import ServeEngine

    cfg, _, qparams, _ = moe_quantized
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).astype(np.int32)
               for l in (3, 6, 4)]
    max_news = [5, 4, 6]
    eng = ServeEngine(cfg, qparams, max_batch=2, max_len=64)
    reqs = [eng.submit(p, m) for p, m in zip(prompts, max_news)]
    eng.run(max_steps=200)
    assert all(r.done for r in reqs)
    for r, p, m in zip(reqs, prompts, max_news):
        want = np.asarray(greedy_generate(
            cfg, qparams, jnp.asarray(p[None, :]), max_new=m, max_len=64
        ))[0].tolist()
        assert r.out == want, (r.uid, r.out, want)


def test_ep_forward_full_model(moe_model, moe_quantized):
    """Full expert-parallel forward (moe_fn hook + psum per layer) ==
    single-device forward, dense and quantized."""
    from pt2tpu.parallel.ep import ep_forward
    from pt2tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"expert": 4}, jax.devices()[:4])
    toks = jax.random.randint(jax.random.PRNGKey(12), (2, 10), 0, 256)

    cfg, params = moe_model
    want = dec.forward(cfg, params, toks, impl="xla")
    got = ep_forward(cfg, params, toks, mesh, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    cfg, _, qparams, _ = moe_quantized
    want_q = dec.forward(cfg, qparams, toks, impl="xla")
    got_q = ep_forward(cfg, qparams, toks, mesh, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got_q), np.asarray(want_q), rtol=5e-4, atol=5e-4
    )
