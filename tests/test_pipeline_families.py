"""Quantization pipeline across every model family (tiny configs):
each family must quantize, stay finite, and serve through the packed path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.data import get_calibration_data
from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.quant import QuantConfig, quantize_model
from pt2tpu.serve import greedy_generate

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.mark.parametrize(
    "name", ["tiny-llama-gqa", "tiny-opt", "tiny-gpt2", "tiny-gemma",
             "tiny-bloom", "tiny-qwen3", "tiny-gemma3"]
)
def test_family_quantize_and_serve(name):
    cfg = get_config(name).with_(n_layers=1)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib, _ = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=4, seq_len=32, seed=0
    )
    qp, report = quantize_model(
        cfg, params, jnp.asarray(calib), QuantConfig(block_size=32, batch_size=4)
    )
    for lr in report["layers"]:
        for proj, stats in lr.items():
            assert np.isfinite(stats["rel_out_err"]), (name, proj, stats)

    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    logits = dec.forward(cfg, qp, toks, impl="xla")
    assert bool(jnp.isfinite(logits).all())
    out = greedy_generate(cfg, qp, toks, max_new=4, max_len=16, impl="xla")
    assert out.shape == (1, 4)


def test_hf_mixtral_quantize_and_serve(tmp_path):
    """Full integration on a REAL HF-format MoE checkpoint: transformers
    save_pretrained -> hf_loader -> routed per-expert GPTQ -> packed
    decode. (The reference cannot do any of this — dense nn.Linear only,
    ref model.py:162-171.)"""
    transformers = pytest.importorskip("transformers")

    c = transformers.MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    d = str(tmp_path / "mx")
    transformers.MixtralForCausalLM(c).save_pretrained(
        d, safe_serialization=True
    )
    from pt2tpu.models.hf_loader import load_hf_model

    cfg, params = load_hf_model(d, dtype=jnp.float32)
    assert cfg.is_moe and cfg.n_experts == 4
    calib, _ = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=4, seq_len=32, seed=0
    )
    qp, report = quantize_model(
        cfg, params, jnp.asarray(calib),
        QuantConfig(block_size=32, batch_size=4),
    )
    assert qp["layers"]["gateup"].packed.shape[:2] == (1, 4)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    out = greedy_generate(cfg, qp, toks, max_new=4, max_len=16, impl="xla")
    assert out.shape == (1, 4)
