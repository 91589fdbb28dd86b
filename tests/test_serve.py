"""Serving-path tests: cached decode must match the uncached forward, INT8
KV cache must stay close, generation must be deterministic and static-shaped."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate, init_cache, prefill, forward_cached
from pt2tpu.serve.kvcache import _quantize_i8

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(params=["tiny-llama", "tiny-llama-gqa", "tiny-opt", "tiny-bloom"])
def model(request):
    cfg = get_config(request.param)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_cached_prefill_matches_uncached(model):
    """Prefill through the cache must equal the plain causal forward."""
    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    want = dec.forward(cfg, params, toks)[:, -1]  # (B, V)
    cache = init_cache(cfg, 2, 16, dtype=jnp.float32)
    got, cache2 = prefill(cfg, params, toks, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    assert int(cache2.length) == 12


def test_incremental_decode_matches_full_forward(model):
    """Token-by-token decode must equal running the full sequence at once."""
    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 10), 0, cfg.vocab_size)
    full = dec.forward(cfg, params, toks)  # (1, 10, V)

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


def test_greedy_generate_shapes_and_determinism(model):
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, cfg.vocab_size)
    out1 = greedy_generate(cfg, params, prompt, max_new=6, max_len=32)
    out2 = greedy_generate(cfg, params, prompt, max_new=6, max_len=32)
    assert out1.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.asarray(out1).min() >= 0 and np.asarray(out1).max() < cfg.vocab_size


def test_greedy_matches_manual_argmax_rollout(model):
    """Greedy decode must equal manually re-running the growing sequence
    through the uncached forward and taking argmax each step."""
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0, cfg.vocab_size)
    out = np.asarray(greedy_generate(cfg, params, prompt, max_new=4, max_len=16))
    seq = np.asarray(prompt)
    for i in range(4):
        logits = dec.forward(cfg, params, jnp.asarray(seq))
        nxt = int(jnp.argmax(logits[0, -1]))
        assert nxt == out[0, i], f"step {i}: {nxt} != {out[0, i]}"
        seq = np.concatenate([seq, [[nxt]]], axis=1)


def test_int8_kv_quantizer_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 32)).astype(np.float32))
    q, s = _quantize_i8(x)
    back = q.astype(jnp.float32) * s
    rel = float(jnp.linalg.norm(back - x) / jnp.linalg.norm(x))
    assert rel < 0.01  # int8 absmax ~0.2-0.5% rms error


def test_int8_kv_cache_decode_close(model):
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, cfg.vocab_size)
    out_fp = np.asarray(greedy_generate(cfg, params, prompt, max_new=8, max_len=32))
    out_i8 = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=8, max_len=32, kv_quant=True)
    )
    # int8 KV noise may flip late tokens on a random-init model, but the
    # first steps (short horizon) must agree.
    assert (out_fp[0, :4] == out_i8[0, :4]).all(), (out_fp, out_i8)


def test_generate_rejects_overflow(model):
    cfg, params = model
    prompt = jnp.zeros((1, 30), jnp.int32)
    with pytest.raises(ValueError):
        greedy_generate(cfg, params, prompt, max_new=8, max_len=32)


def test_chunked_prefill_token_exact(model):
    """Chunked prefill must reproduce whole-prompt generate exactly —
    including a remainder chunk and a chunk dividing Lp evenly."""
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 21), 0, cfg.vocab_size)
    want = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=5, max_len=32,
                        prefill_chunk=0)
    )
    for chunk in (7, 8, 21):  # 21 = 3*7 exact; 8 leaves remainder 5
        got = np.asarray(
            greedy_generate(cfg, params, prompt, max_new=5, max_len=32,
                            prefill_chunk=chunk)
        )
        np.testing.assert_array_equal(got, want)


def test_chunked_prefill_kv_quant(model):
    """Chunking composes with the int8 KV cache (same tokens as unchunked)."""
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 12), 0, cfg.vocab_size)
    want = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=4, max_len=24,
                        kv_quant=True, prefill_chunk=0)
    )
    got = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=4, max_len=24,
                        kv_quant=True, prefill_chunk=5)
    )
    np.testing.assert_array_equal(got, want)


def test_int8_integer_domain_close(model):
    """The integer-domain int8 attention path (q-int8 scores + P-int8
    context, default OFF — see common.INT8_INTEGER_DOMAIN) implements the
    same math as the convert-based path to quantization tolerance."""
    from pt2tpu.models import common

    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(7), (2, 10), 0, cfg.vocab_size)
    want = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=4, max_len=24, kv_quant=True)
    )
    orig = common.INT8_INTEGER_DOMAIN
    common.INT8_INTEGER_DOMAIN = True
    try:
        # distinct max_len: the flag is read at trace time (jit-cache key)
        got = np.asarray(
            greedy_generate(cfg, params, prompt, max_new=4, max_len=32,
                            kv_quant=True)
        )
    finally:
        common.INT8_INTEGER_DOMAIN = orig
    # token drift allowed only at argmax near-ties; require >= 3/4 agreement
    assert (got == want).mean() >= 0.75
