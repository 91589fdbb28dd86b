"""ssr_scope: the width-gated gather-free serving layout default.

Evidence base (RESULTS round 5, 61M gate): skipping SSR on qkv/gateup/o
is quality-free at dim 640 (ppl 11.65 vs 11.69 full-SSR) while costing
+7.9% ppl at dim 384 — so ssr_scope='auto' keeps the reference's full
recipe below dim 640 and emits the gather-free layout (SSR only on down,
whose perm folds at pack time) at or above it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt2tpu.models import decoder as dec
from pt2tpu.quant.pipeline import (
    QuantConfig,
    quantize_model,
    resolve_ssr_skip,
)

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def test_resolve_ssr_skip():
    q = QuantConfig()
    assert resolve_ssr_skip(q, 128) == ()
    wide = resolve_ssr_skip(q, 640)
    assert "down" not in wide
    for g in ("q", "k", "v", "qkv", "o", "gate", "up", "gateup"):
        assert g in wide
    # explicit entries union in; scope overrides respected
    q2 = dataclasses.replace(q, ssr_skip=("down",))
    assert "down" in resolve_ssr_skip(q2, 640)
    assert resolve_ssr_skip(dataclasses.replace(q, ssr_scope="all"), 640) == ()
    assert "qkv" in resolve_ssr_skip(
        dataclasses.replace(q, ssr_scope="down"), 128
    )
    with pytest.raises(ValueError):
        resolve_ssr_skip(dataclasses.replace(q, ssr_scope="bogus"), 128)


def _quantize(cfg, rng):
    params = dec.init_params(cfg, jax.random.PRNGKey(3))
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qp, _ = quantize_model(cfg, params, calib, QuantConfig(batch_size=4))
    return qp


def test_auto_scope_narrow_keeps_full_ssr(rng):
    cfg = dec.ModelConfig(
        family="llama", vocab_size=256, dim=128, n_layers=1, n_heads=4,
        intermediate=256, max_seq_len=64,
    )
    qp = _quantize(cfg, rng)
    layers = qp["layers"]
    # full SSR: qkv/gateup/o carry packed gathers, down folded
    assert layers["qkv"].gather is not None
    assert layers["gateup"].gather is not None
    assert layers["down"].input_folded


def test_auto_scope_wide_emits_gather_free(rng):
    cfg = dec.ModelConfig(
        family="llama", vocab_size=256, dim=640, n_layers=1, n_heads=5,
        intermediate=256, max_seq_len=64,
    )
    qp = _quantize(cfg, rng)
    layers = qp["layers"]
    # gather-free: no runtime gathers anywhere; down still SSR'd via fold
    assert layers["qkv"].gather is None
    assert layers["gateup"].gather is None
    assert layers["o"].gather is None
    assert layers["down"].input_folded
    # and the model still runs
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    out = dec.forward(cfg, qp, toks, impl="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_kurtosis_conditioning_signal(rng, capsys):
    """Heavy-tailed weights trigger the w_kurt warning; gaussian don't.
    (The 120M collapse of RESULTS round 5: kurtosis-6+ MLP rows quantize
    at tiny rel_out_err and detonate end-to-end — w_kurt is the cheap
    predictor.)"""
    import sys

    from pt2tpu.models.decoder import DenseLinear
    from pt2tpu.quant.hessian import HessianAccumulator
    from pt2tpu.quant.pipeline import quantize_linear

    m = 256
    X = jnp.asarray(rng.standard_normal((1024, m)), jnp.float32)
    acc = HessianAccumulator(m)
    acc.update(X)

    Wg = jnp.asarray(rng.standard_normal((128, m)) * 0.05, jnp.float32)
    _, st = quantize_linear(DenseLinear(w=Wg), acc, QuantConfig())
    assert st["w_kurt"] < 4.0

    # student-t(3) weights: heavy tails, kurtosis far above gaussian
    Wt = jnp.asarray(rng.standard_t(3, (128, m)) * 0.05, jnp.float32)
    _, st2 = quantize_linear(DenseLinear(w=Wt), acc, QuantConfig())
    err = capsys.readouterr().err
    assert st2["w_kurt"] > 5.0
    assert "heavy-tailed" in err
