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
