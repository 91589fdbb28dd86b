"""Tests for the unified functional decoder (models/decoder.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.models.registry import get_model_type

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(params=["tiny-llama", "tiny-llama-gqa", "tiny-opt", "tiny-gpt2", "tiny-gemma", "tiny-bloom", "tiny-qwen3", "tiny-gemma3"])
def model(request):
    cfg = get_config(request.param)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_forward_shapes_and_finiteness(model):
    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits = dec.forward(cfg, params, toks)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_causality(model):
    """Changing a future token must not change past logits."""
    cfg, params = model
    key = jax.random.PRNGKey(2)
    toks = jax.random.randint(key, (1, 12), 0, cfg.vocab_size)
    toks2 = toks.at[0, 8].set((toks[0, 8] + 1) % cfg.vocab_size)
    l1 = dec.forward(cfg, params, toks)
    l2 = dec.forward(cfg, params, toks2)
    np.testing.assert_allclose(
        np.asarray(l1[0, :8]), np.asarray(l2[0, :8]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[0, 8:]), np.asarray(l2[0, 8:]))


def test_scan_matches_per_layer_loop(model):
    """The lax.scan over stacked layers must equal an explicit Python loop
    over layer slices (the calibration pipeline's path)."""
    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 0, cfg.vocab_size)
    want = dec.forward(cfg, params, toks)

    h = dec.embed_tokens(cfg, params, toks)
    L = toks.shape[1]
    mask = dec.build_mask(cfg, L, L)
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    for i in range(cfg.n_layers):
        lp = dec.layer_slice(params["layers"], i)
        h, _ = dec.layer_forward(
            cfg, lp, h, cos, sin, mask, layer_idx=i,
            cos_loc=cos_l, sin_loc=sin_l,
        )
    got = dec.unembed(cfg, params, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_taps_feed_linears(model):
    """Tap contract: the recorded activations are exactly the inputs of the
    corresponding projections (what the reference captures with hooks)."""
    cfg, params = model
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, cfg.vocab_size)
    h = dec.embed_tokens(cfg, params, toks)
    L = toks.shape[1]
    mask = dec.build_mask(cfg, L, L)
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    lp = dec.layer_slice(params["layers"], 0)
    _, io = dec.layer_forward(
        cfg, lp, h, cos, sin, mask, return_taps=True, layer_idx=0,
        cos_loc=cos_l, sin_loc=sin_l,
    )
    taps = io.taps
    names = [n for n in dec.LINEAR_NAMES if cfg.gated_mlp or n != "gate"]
    for n in names:
        t = taps[dec.TAP_OF_LINEAR[n]]
        assert t.shape[-1] == lp[n].in_features, (n, t.shape)
    # attn_in really is the ln1 output: recompute directly
    want = dec._norm(cfg, h, lp["ln1_w"], lp["ln1_b"])
    np.testing.assert_allclose(
        np.asarray(taps["attn_in"]), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_gqa_reduces_to_mha():
    """A GQA config with n_kv == n_heads must equal plain MHA numerics."""
    cfg = get_config("tiny-llama")
    cfg_kv = cfg.with_(n_kv_heads=cfg.n_heads)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0, cfg.vocab_size)
    l1 = dec.forward(cfg, params, toks)
    l2 = dec.forward(cfg_kv, params, toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-6)


def test_model_type_inference():
    assert get_model_type("meta-llama/Llama-2-7b-hf") == "llama2"
    assert get_model_type("facebook/opt-125m") == "opt"
    assert get_model_type("Qwen/Qwen3-8B") == "qwen3"
    assert get_model_type("google/gemma-3-4b") == "gemma3"
    assert get_model_type("bigscience/bloom-560m") == "bloom"
    assert get_model_type("openai-community/gpt2-xl") == "gpt2"
    assert get_model_type("mystery-model") == "llama"


def test_gemma_version_classification():
    """'gemma-2b' is gemma v1 (2B size), not gemma2 (ref model.py:267-290
    has the same trap)."""
    assert get_model_type("google/gemma-2b") == "gemma"
    assert get_model_type("gemma-7b-it") == "gemma"
    assert get_model_type("google/gemma-2-9b") == "gemma2"
    assert get_model_type("google/gemma-2-2b-it") == "gemma2"
    assert get_model_type("gemma-3-4b-it") == "gemma3"


def test_gemma3_multimodal_text_config(tmp_path):
    """Multimodal gemma3 config.json wraps the LM under text_config; the
    loader must quantize/serve the text model (ref model.py:143-151 walks
    language_model.layers for the same reason)."""
    import json

    from pt2tpu.models.hf_loader import config_from_hf

    hc = {
        "architectures": ["Gemma3ForConditionalGeneration"],
        "model_type": "gemma3",
        "text_config": {
            "model_type": "gemma3_text", "vocab_size": 99, "hidden_size": 32,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8,
            "intermediate_size": 64, "max_position_embeddings": 64,
            "sliding_window": 4, "sliding_window_pattern": 2,
            "rope_theta": 1000000.0, "rope_local_base_freq": 10000.0,
            "query_pre_attn_scalar": 8,
        },
    }
    d = tmp_path / "mm"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hc))
    cfg = config_from_hf(str(d))
    assert cfg.family == "gemma3" and cfg.n_layers == 4
    assert cfg.sliding_window == 4 and cfg.qk_norm and cfg.sandwich_norm
    assert cfg.layer_globals == (False, True, False, True)
