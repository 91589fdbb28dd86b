"""Real-language quality gate over the tiny-LM artifacts (RESULTS round 4).

Runs only where the tiny-LM pipeline has been built (scripts/tinylm/ —
see the verify skill): asserts the fp checkpoint still predicts held-out
text (ppl well under uniform) and that the ternary artifact's degradation
stays in the measured envelope. Guards against silent regressions in the
loader/eval/artifact path on REAL weights, which random-init tests cannot
see (the quantized-lm_head "improvement" on random weights that reversed
into +33% ppl on real language is the canonical example)."""

import os

import numpy as np
import pytest

CKPT = "/root/tinylm/ckpt"
ART = "/root/tinylm/art"
HELD = "/root/tinylm/heldout_tokens.npy"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (os.path.isdir(CKPT) and os.path.isdir(ART)
             and os.path.exists(HELD)),
        reason="tiny-LM artifacts not built (scripts/tinylm/)",
    ),
]


def _ppl(model_dir, n_windows=12):
    import jax.numpy as jnp

    from pt2tpu.data.evaluate import evaluate_perplexity
    from pt2tpu.models.hf_loader import load_hf_model
    from pt2tpu.utils.checkpoint import load_model

    if os.path.exists(os.path.join(model_dir, "manifest.json")):
        cfg, params = load_model(model_dir)
    else:
        cfg, params = load_hf_model(model_dir, dtype=jnp.float32)
    held = np.load(HELD)
    return evaluate_perplexity(
        cfg, params, held, seq_len=256, max_windows=n_windows, impl="xla"
    )["ppl"]


def test_fp_checkpoint_predicts_language():
    ppl = _ppl(CKPT)
    # uniform over vocab 8192 would be 8192; the trained model measured
    # ~6.6 over the full held-out stream
    assert ppl < 12.0, ppl


def test_ternary_artifact_degradation_envelope():
    fp = _ppl(CKPT)
    tern = _ppl(ART)
    # measured 2.94x over the full stream; fail on >1.5x regression of
    # the *ratio* (loader/eval/artifact breakage, not quant noise)
    assert tern / fp < 4.5, (fp, tern)
    assert tern / fp > 1.2, "ternary cannot be better than fp here"
