"""Context parallelism (parallel/cp.py): ring attention over a sequence-
sharded mesh must equal single-device causal attention / forward.

No reference counterpart (SURVEY.md §2.3 context-parallel row: absent —
HF transformers runs the reference's attention).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.models.common import attention, causal_mask
from pt2tpu.parallel.cp import cp_forward, ring_attention
from pt2tpu.parallel.mesh import make_mesh
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.mark.parametrize("C,H,Hkv", [(4, 4, 4), (4, 4, 2), (2, 8, 1)])
def test_ring_attention_matches_causal(C, H, Hkv):
    B, L, hd = 2, 32, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, H, hd), jnp.float32)
    k = jax.random.normal(kk, (B, L, Hkv, hd), jnp.float32)
    v = jax.random.normal(kv, (B, L, Hkv, hd), jnp.float32)
    want = attention(q, k, v, causal_mask(L, L))

    mesh = make_mesh({"context": C}, jax.devices()[:C])
    fn = jax.jit(
        jax.shard_map(
            lambda q_, k_, v_: ring_attention(q_, k_, v_, "context"),
            mesh=mesh,
            in_specs=(P(None, "context"), P(None, "context"),
                      P(None, "context")),
            out_specs=P(None, "context"),
            check_vma=False,
        )
    )
    got = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_ring_attention_softcap_and_scale():
    B, L, H, hd, C = 1, 16, 2, 8, 4
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(kk, (B, L, H, hd), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    want = attention(q, k, v, causal_mask(L, L), scale=0.25, softcap=30.0)
    mesh = make_mesh({"context": C}, jax.devices()[:C])
    fn = jax.jit(
        jax.shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, "context", scale=0.25, softcap=30.0
            ),
            mesh=mesh,
            in_specs=(P(None, "context"),) * 3,
            out_specs=P(None, "context"),
            check_vma=False,
        )
    )
    got = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("name", ["tiny-llama", "tiny-qwen3"])
def test_cp_forward_matches_single_device(rng, name):
    cfg = get_config(name)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")
    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    got = cp_forward(cfg, mesh, params, toks, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )


def test_cp_forward_quantized(rng):
    cfg = get_config("tiny-llama")
    params = random_ternary_params(cfg, jax.random.PRNGKey(2), perm_mode="ssr")
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")
    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    got = cp_forward(cfg, mesh, params, toks, impl="xla")
    # bf16 activations: ring vs one-shot softmax reduction order costs a
    # few bf16 ulps end-to-end
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g, w, atol=0.08, rtol=0.08)
    assert np.corrcoef(g.ravel(), w.ravel())[0, 1] > 0.9999


def test_cp_forward_sliding(rng):
    """Ring attention on a sliding-window config (VERDICT r3 weak-4 lift):
    per-layer global/local windows + dual RoPE fold into the per-round
    global-position mask; equals the single-device forward."""
    cfg = get_config("tiny-gemma3")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # 32 > window 16, so the window actually clips cross-shard blocks
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")
    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    got = cp_forward(cfg, mesh, params, toks, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )


def test_cp_forward_alibi(rng):
    """Ring attention on bloom: per-head alibi distance bias computed from
    ring-global positions; equals the single-device forward."""
    cfg = get_config("tiny-bloom")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    want = dec.forward(cfg, params, toks, impl="xla")
    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    got = cp_forward(cfg, mesh, params, toks, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )
