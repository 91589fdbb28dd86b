"""Pipeline parallelism (parallel/pp.py): stage-partitioned microbatch
pipeline == single-device forward, exactly.

The reference has nothing to compare against here (SURVEY.md §2.3: no PP);
the contract is internal consistency with models/decoder.forward.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.parallel.mesh import make_mesh
from pt2tpu.parallel.pp import pp_forward
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 2), (4, 4), (2, 1)])
def test_pp_matches_forward_dense(rng, stages, n_micro):
    cfg = get_config("tiny-llama").with_(n_layers=4)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 8)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")

    mesh = make_mesh({"stage": stages}, jax.devices()[:stages])
    got = pp_forward(cfg, mesh, params, toks, n_micro=n_micro, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_pp_matches_forward_quantized(rng):
    """Stage-sharded packed-ternary leaves (stacked kernels, SSR gathers)."""
    cfg = get_config("tiny-llama").with_(n_layers=4)
    params = random_ternary_params(cfg, jax.random.PRNGKey(3), perm_mode="ssr")
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 8)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")

    mesh = make_mesh({"stage": 4}, jax.devices()[:4])
    got = pp_forward(cfg, mesh, params, toks, n_micro=2, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_pp_sliding_global_layer_index(rng):
    """gemma3 split across stages: each stage must resolve its layers'
    GLOBAL indices for the sliding/global attention pattern."""
    cfg = get_config("tiny-gemma3")  # 4 layers, alternating sliding/global
    params = dec.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")

    mesh = make_mesh({"stage": 2}, jax.devices()[:2])
    got = pp_forward(cfg, mesh, params, toks, n_micro=2, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_pp_validation():
    cfg = get_config("tiny-llama")  # 2 layers
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh({"stage": 4}, jax.devices()[:4])
    with pytest.raises(ValueError, match="stages"):
        pp_forward(cfg, mesh, params, jnp.zeros((4, 8), jnp.int32))


def test_sp_forward_matches_replicated(rng):
    """Sequence-parallel prefill (L sharded over 'data', GSPMD collectives
    inside attention) == replicated forward."""
    from pt2tpu.parallel.sharding import shard_params, sp_forward

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_params(params, mesh)
    got = sp_forward(cfg, sp, toks, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_sp_forward_quantized_sliding(rng):
    """SP over a packed-ternary gemma3: sequence sharding composes with the
    sliding-window masks and the packed-weight leaves."""
    from pt2tpu.parallel.sharding import shard_params, sp_forward

    cfg = get_config("tiny-gemma3")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(1), perm_mode="ssr", dtype=jnp.float32,
        scale_dtype=jnp.float32,
    )
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 24)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")

    mesh = make_mesh({"data": 8, "model": 1})
    sp = shard_params(params, mesh)
    got = sp_forward(cfg, sp, toks, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (2, 4), (4, 2)])
def test_pp_generate_matches_greedy(rng, stages, n_micro):
    """Staged pipeline DECODE (stage-local KV caches, wave-scheduled
    microbatches) must be token-exact vs single-device greedy decoding."""
    from pt2tpu.parallel.pp import pp_generate
    from pt2tpu.serve import greedy_generate

    cfg = get_config("tiny-llama").with_(n_layers=4)
    params = dec.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 6)), jnp.int32)
    want = greedy_generate(
        cfg, params, prompt, max_new=5, max_len=32, impl="xla"
    )

    mesh = make_mesh({"stage": stages}, jax.devices()[:stages])
    got = pp_generate(
        cfg, mesh, params, prompt, max_new=5, n_micro=n_micro, max_len=32,
        impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pp_generate_quantized(rng):
    """Staged decode over stage-sharded packed-ternary leaves."""
    from pt2tpu.parallel.pp import pp_generate
    from pt2tpu.serve import greedy_generate

    cfg = get_config("tiny-llama").with_(n_layers=4)
    params = random_ternary_params(cfg, jax.random.PRNGKey(4), perm_mode="ssr")
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
    want = greedy_generate(
        cfg, params, prompt, max_new=4, max_len=32, impl="xla"
    )
    mesh = make_mesh({"stage": 2}, jax.devices()[:2])
    got = pp_generate(
        cfg, mesh, params, prompt, max_new=4, n_micro=2, max_len=32,
        impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pp_generate_sliding(rng):
    """Staged decode on a sliding-window config (VERDICT r3 weak-4 lift):
    gemma3's per-layer global/local windows + dual RoPE tables flow
    through the wave schedule (window folded into kv_valid on the
    scalar-pos decode path) — token-exact vs single-device greedy."""
    from pt2tpu.parallel.pp import pp_generate
    from pt2tpu.serve import greedy_generate

    cfg = get_config("tiny-gemma3").with_(n_layers=4)
    params = random_ternary_params(cfg, jax.random.PRNGKey(6), perm_mode="ssr")
    # long enough that decode positions actually fall outside the window
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    want = greedy_generate(
        cfg, params, prompt, max_new=8, max_len=32, impl="xla"
    )
    mesh = make_mesh({"stage": 2}, jax.devices()[:2])
    got = pp_generate(
        cfg, mesh, params, prompt, max_new=8, n_micro=2, max_len=32,
        impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
