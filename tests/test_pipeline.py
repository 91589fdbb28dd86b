"""End-to-end model quantization pipeline tests (the reference's CLI flow,
SURVEY.md §3.1-3.2, on a tiny model): quantize -> packed inference -> ppl."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.data import evaluate_perplexity, get_calibration_data
from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.ops.ternary_matmul import PackedTernaryLinear
from pt2tpu.quant import QuantConfig, quantize_model
from pt2tpu.utils.metrics import model_bits_per_weight

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


@pytest.fixture(scope="module")
def quantized_tiny():
    cfg = get_config("tiny-llama").with_(n_layers=2)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib, prov = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=8, seq_len=32, seed=42
    )
    qcfg = QuantConfig(block_size=32, batch_size=4)
    qparams, report = quantize_model(cfg, params, jnp.asarray(calib), qcfg)
    return cfg, params, qparams, report


def test_quantized_structure(quantized_tiny):
    cfg, params, qparams, report = quantized_tiny
    layers = qparams["layers"]
    # default pipeline fuses qkv and gate+up into single projections
    for name in ("qkv", "o", "gateup", "down"):
        assert isinstance(layers[name], PackedTernaryLinear), name
        assert layers[name].packed.shape[0] > 0
    for gone in ("q", "k", "v", "gate", "up"):
        assert gone not in layers
    # embeddings / head stay dense (reference scope: only decoder linears)
    assert qparams["embed"].dtype == params["embed"].dtype
    assert len(report["layers"]) == cfg.n_layers
    for lr in report["layers"]:
        for n, stats in lr.items():
            assert np.isfinite(stats["rel_out_err"]), (n, stats)


def test_quantized_forward_close_and_ppl(quantized_tiny):
    cfg, params, qparams, report = quantized_tiny
    toks = jax.random.randint(jax.random.PRNGKey(9), (2, 32), 0, cfg.vocab_size)
    lf = dec.forward(cfg, params, toks)
    lq = dec.forward(cfg, qparams, toks, impl="xla")
    assert bool(jnp.isfinite(lq).all())
    # Random-init weights are the worst case for ternarization (no structure
    # to exploit; ~12% output error per projection compounds over layers).
    # Gates: per-projection Hessian-weighted error bounded, logits still
    # clearly correlated, ppl finite and not exploding.
    for lr in report["layers"]:
        for n, stats in lr.items():
            assert stats["rel_out_err"] < 0.5, (n, stats)
    a, b = np.asarray(lf).ravel(), np.asarray(lq).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.3, f"quantized logits decorrelated: corr={corr:.3f}"

    stream = np.random.default_rng(0).integers(0, cfg.vocab_size, 256)
    ppl_f = evaluate_perplexity(cfg, params, stream, seq_len=32, batch_size=4)
    ppl_q = evaluate_perplexity(cfg, qparams, stream, seq_len=32, batch_size=4)
    assert np.isfinite(ppl_q["ppl"])
    assert ppl_q["ppl"] < 4 * ppl_f["ppl"]  # no blow-up


def test_bits_per_weight(quantized_tiny):
    cfg, _, qparams, report = quantized_tiny
    bpw = model_bits_per_weight(qparams)
    assert report["bits_per_weight"] == pytest.approx(bpw)
    # 2-bit planes + 2 bf16 scales per 32-wide block => 2 + 2*16/32 = 3.0
    assert 2.0 <= bpw <= 3.2


def test_resume_from_partial(quantized_tiny):
    """Per-layer resumability: quantizing layer 1 with layer 0's output must
    equal the full run (the journal/resume contract, SURVEY.md §5)."""
    cfg, params, qparams, _ = quantized_tiny
    calib, _ = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=8, seq_len=32, seed=42
    )
    qcfg = QuantConfig(block_size=32, batch_size=4)
    # Resume with layer 0 taken from the full run: layer 1 must calibrate
    # against the replayed quantized-prefix hidden state and reproduce the
    # full run's layer 1 exactly.
    l0 = dec.layer_slice(qparams["layers"], 0)
    resumed, _ = quantize_model(
        cfg,
        params,
        jnp.asarray(calib),
        qcfg,
        start_layer=1,
        prequantized_layers=[l0],
    )
    for name in ("qkv", "o", "gateup", "down"):
        a = np.asarray(dec.layer_slice(resumed["layers"], 1)[name].packed)
        b = np.asarray(dec.layer_slice(qparams["layers"], 1)[name].packed)
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        quantize_model(
            cfg, params, jnp.asarray(calib), qcfg, start_layer=2,
            prequantized_layers=[l0],
        )


def test_unfused_pipeline_keeps_reference_layout(rng):
    """fuse_projections=False preserves the reference's per-projection
    quantization (one Hessian per linear, separate perms)."""
    from pt2tpu.data import get_calibration_data

    cfg = get_config("tiny-llama").with_(n_layers=1)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib, _ = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=4, seq_len=32, seed=1
    )
    qp, _ = quantize_model(
        cfg, params, jnp.asarray(calib),
        QuantConfig(block_size=32, batch_size=4, fuse_projections=False),
    )
    layers = qp["layers"]
    for name in dec.LINEAR_NAMES:
        assert isinstance(layers[name], PackedTernaryLinear), name
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, cfg.vocab_size)
    out = dec.forward(cfg, qp, toks, impl="xla")
    assert bool(jnp.isfinite(out).all())
