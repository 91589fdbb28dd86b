"""Roofline calculator and weight-byte accounting sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from pt2tpu.models import get_config
from pt2tpu.utils.profiling import model_weight_bytes, ternary_decode_roofline, time_fn


def test_weight_bytes_7b():
    cfg = get_config("llama-2-7b")
    t = model_weight_bytes(cfg, ternary=True)
    d = model_weight_bytes(cfg, ternary=False)
    # ~6.5B decoder params: ternary ~1.7GB, dense ~13GB
    assert 6.0e9 < t["params"] < 7.0e9
    assert 1.5e9 < t["layer_bytes"] < 2.0e9
    assert 12.5e9 < d["layer_bytes"] < 14e9
    assert d["total_bytes"] / t["total_bytes"] > 5.5


def test_roofline_ratio():
    cfg = get_config("llama-2-7b")
    r = ternary_decode_roofline(cfg, hbm_gbps=819.0)
    assert r["ternary_tok_s"] > r["bf16_tok_s"]
    assert 5.0 < r["ideal_speedup"] < 8.0
    # v5e ceiling sanity: hundreds of tok/s ternary, tens dense
    assert 300 < r["ternary_tok_s"] < 1500
    assert 40 < r["bf16_tok_s"] < 120


def test_time_fn_materializes():
    calls = []

    def f(x):
        calls.append(1)
        return x * 2

    t = time_fn(jax.jit(f), jnp.ones(8), reps=2)
    assert t >= 0.0
    assert len(calls) >= 1


def test_randmodel_has_no_dense_projections():
    """random_ternary_params must not materialize dense projection weights
    (a 7B dense init OOMs next to the packed model)."""
    from pt2tpu.models.common import DenseLinear
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("tiny-llama")
    p = random_ternary_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32,
                              block_size=32, scale_dtype=jnp.float32)
    for name, leaf in p["layers"].items():
        assert not isinstance(leaf, DenseLinear), name
    assert isinstance(p["lm_head"], DenseLinear)  # head stays dense
