"""Decode-attention Pallas kernel (ops/kernels/pallas_attention.py) vs the
XLA attention reference — interpret mode (compiled check runs on-chip via
scripts/tpu_smoke.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models.common import attention

pytestmark = pytest.mark.slow


def _mk(B, M, H, Hkv, hd, quant, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, H, hd)), jnp.bfloat16)
    kf = rng.normal(size=(B, M, Hkv, hd)).astype(np.float32)
    vf = rng.normal(size=(B, M, Hkv, hd)).astype(np.float32)
    lens = rng.integers(1, M + 1, size=(B,))
    valid = jnp.asarray(np.arange(M)[None, :] < lens[:, None])
    if quant:
        ks = np.abs(kf).max(axis=-1, keepdims=True).astype(np.float32) / 127
        vs = np.abs(vf).max(axis=-1, keepdims=True).astype(np.float32) / 127
        k8 = np.clip(np.round(kf / ks), -127, 127).astype(np.int8)
        v8 = np.clip(np.round(vf / vs), -127, 127).astype(np.int8)
        return (q, jnp.asarray(k8), jnp.asarray(v8), valid,
                jnp.asarray(ks), jnp.asarray(vs))
    return (q, jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
            valid, None, None)


@pytest.mark.parametrize(
    "B,M,H,Hkv,quant",
    [
        (2, 256, 4, 4, False),   # MHA bf16
        (2, 256, 4, 4, True),    # MHA int8
        (1, 512, 8, 2, True),    # GQA rep=4 int8
        (3, 128, 8, 1, False),   # MQA bf16
    ],
)
def test_decode_attention_matches_reference(B, M, H, Hkv, quant):
    from pt2tpu.ops.kernels import pallas_attention as pa

    hd = 128
    q, k, v, valid, ks, vs = _mk(B, M, H, Hkv, hd, quant)
    want = attention(
        q, k, v, None, valid, scale=0.125, k_scale=ks, v_scale=vs
    )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = pa.decode_attention_pallas(
            q, k, v, valid, 0.125, k_scale=ks, v_scale=vs
        )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_quant_layouts_agree():
    """The round-4 (bm, H) and round-5 transposed (H, bm) int8 score
    layouts implement the same math (both vs the XLA reference)."""
    from pt2tpu.ops.kernels import pallas_attention as pa
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, valid, ks, vs = _mk(2, 256, 8, 2, 128, True, seed=5)
    want = attention(q, k, v, None, valid, scale=0.125, k_scale=ks,
                     v_scale=vs, attn_kernel=False)
    outs = {}
    orig = pa.QUANT_SCORE_LAYOUT
    try:
        for layout in ("bh", "hb"):
            pa.QUANT_SCORE_LAYOUT = layout
            with pltpu.force_tpu_interpret_mode():
                outs[layout] = np.asarray(pa.decode_attention_pallas(
                    q, k, v, valid, 0.125, k_scale=ks, v_scale=vs
                ), np.float32)
            np.testing.assert_allclose(
                outs[layout], np.asarray(want, np.float32),
                atol=2e-2, rtol=2e-2,
            )
    finally:
        pa.QUANT_SCORE_LAYOUT = orig
    np.testing.assert_allclose(outs["bh"], outs["hb"], atol=1e-3, rtol=1e-3)
