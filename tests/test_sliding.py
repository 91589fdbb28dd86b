"""Sliding-window attention semantics (gemma2/3 families).

The reference never touches attention internals (it rides HF transformers,
ref model.py:254-260); these tests pin our from-scratch sliding-window /
dual-RoPE implementation: a sliding layer's receptive field is exactly the
trailing window, global layers see everything, and the cached decode path
(scalar positions) reproduces the uncached forward bit-for-bit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models.registry import get_config

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def _one_layer_cfg(window: int, is_global: bool):
    base = get_config("tiny-llama")
    return base.with_(
        n_layers=1,
        sliding_window=window,
        layer_globals=(is_global,),
    )


def _logits(cfg, params, toks):
    return np.asarray(dec.forward(cfg, params, jnp.asarray(toks, jnp.int32)))


def test_sliding_layer_ignores_tokens_outside_window():
    W = 4
    cfg = _one_layer_cfg(W, is_global=False)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (1, 12))

    # kv positions visible to query 11: (11 - W, 11] = {8, 9, 10, 11}
    far = toks.copy()
    far[0, 3] = (far[0, 3] + 1) % cfg.vocab_size  # outside the window
    near = toks.copy()
    near[0, 9] = (near[0, 9] + 1) % cfg.vocab_size  # inside the window

    base = _logits(cfg, params, toks)[0, -1]
    np.testing.assert_allclose(
        _logits(cfg, params, far)[0, -1], base, atol=1e-6
    )
    assert np.abs(_logits(cfg, params, near)[0, -1] - base).max() > 1e-4


def test_global_layer_sees_outside_window():
    cfg = _one_layer_cfg(4, is_global=True)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (1, 12))
    far = toks.copy()
    far[0, 3] = (far[0, 3] + 1) % cfg.vocab_size
    base = _logits(cfg, params, toks)[0, -1]
    assert np.abs(_logits(cfg, params, far)[0, -1] - base).max() > 1e-4


@pytest.mark.parametrize("kv_quant", [False, True])
def test_cached_decode_matches_forward(kv_quant):
    """Greedy decode (cache path, per-step window masks) must agree with
    re-running the full causal forward at every step."""
    from pt2tpu.serve.generate import greedy_generate

    cfg = get_config("tiny-gemma3")
    params = dec.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    out = np.asarray(
        greedy_generate(cfg, params, prompt, max_new=8, kv_quant=kv_quant)
    )

    seq = np.concatenate([np.asarray(prompt), out], axis=1)
    if kv_quant:
        return  # int8 KV: token-level agreement isn't guaranteed; smoke only
    for t in range(out.shape[1]):
        full = _logits(cfg, params, seq[:, : 9 + t])
        nxt = np.argmax(full[:, -1], axis=-1)
        np.testing.assert_array_equal(nxt, out[:, t], err_msg=f"step {t}")


def test_pos_tables_local_pair():
    cfg = get_config("tiny-gemma3")
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, 32)
    assert cos_l is not None and sin_l is not None
    assert cos.shape == cos_l.shape == (32, cfg.hd // 2)
    # distinct bases produce distinct tables
    assert np.abs(np.asarray(cos) - np.asarray(cos_l)).max() > 1e-3
    # non-sliding config: no local tables
    cos, sin, cos_l, sin_l = dec.pos_tables(get_config("tiny-llama"), 32)
    assert cos_l is None and sin_l is None
