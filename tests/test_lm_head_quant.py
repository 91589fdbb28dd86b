"""Optional lm_head ternarization (QuantConfig.quantize_lm_head)."""

import jax
import jax.numpy as jnp
import numpy as np

from pt2tpu.models import decoder as dec
from pt2tpu.ops.ternary_matmul import PackedTernaryLinear
from pt2tpu.quant.pipeline import QuantConfig, quantize_model

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')

CFG = dec.ModelConfig(
    family="llama",
    vocab_size=256,
    dim=128,
    n_layers=1,
    n_heads=4,
    intermediate=256,
    max_seq_len=64,
)


def test_lm_head_quantization(rng):
    params = dec.init_params(CFG, jax.random.PRNGKey(0))
    calib = jnp.asarray(rng.integers(0, 256, (2, 32)), jnp.int32)
    q, rep = quantize_model(
        CFG, params, calib, QuantConfig(batch_size=2, quantize_lm_head=True)
    )
    head = q["lm_head"]
    assert isinstance(head, PackedTernaryLinear)
    assert "lm_head" in rep and rep["lm_head"]["rel_out_err"] < 0.6
    toks = jnp.asarray(rng.integers(0, 256, (1, 8)), jnp.int32)
    logits = dec.forward(CFG, q, toks, impl="xla")
    dense_q, _ = quantize_model(CFG, params, calib, QuantConfig(batch_size=2))
    base = dec.forward(CFG, dense_q, toks, impl="xla")
    # Heads differ but rankings should broadly correlate on the tiny model —
    # at minimum the quantized head must produce finite, non-degenerate output.
    assert bool(jnp.isfinite(logits).all())
    assert float(jnp.std(logits)) > 0.1 * float(jnp.std(base))
    # Logical storage (real scale blocks, ex tile padding) beats bf16: the
    # in-memory x16 block padding dominates only at toy dims like this test's.
    from pt2tpu.core.packing import packed_nbytes

    logical = packed_nbytes(CFG.vocab_size, CFG.dim, -(-CFG.dim // 128))
    assert logical < 2 * CFG.vocab_size * CFG.dim


def test_lm_head_tied_embeddings_skipped(rng):
    cfg = CFG.with_(tie_embeddings=True)
    params = dec.init_params(cfg, jax.random.PRNGKey(1))
    calib = jnp.asarray(rng.integers(0, 256, (2, 32)), jnp.int32)
    q, _ = quantize_model(
        cfg, params, calib, QuantConfig(batch_size=2, quantize_lm_head=True)
    )
    assert q["lm_head"] is None


def test_greedy_decode_with_ternary_head(rng):
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = CFG.with_(vocab_size=256)
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(3), perm_mode="ssr", ternary_lm_head=True
    )
    assert isinstance(params["lm_head"], PackedTernaryLinear)
    prompt = jnp.asarray(rng.integers(0, 256, (2, 4)), jnp.int32)
    out = greedy_generate(cfg, params, prompt, max_new=4, max_len=16, impl="xla")
    assert out.shape == (2, 4)
    assert bool((out >= 0).all() and (out < 256).all())
