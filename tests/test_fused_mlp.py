"""Fused MLP megakernel (ops/kernels/pallas_ternary.ternary_mlp_pallas*):
one pallas call for SSR gather -> gateup -> act*mul -> down, vs the
two-call reference path. Interpret mode on CPU; the on-chip gate lives in
scripts/tpu_smoke.py and ops.ternary_matmul.verify_fused_mlp.

The fused path keeps the intermediate activations in f32 VMEM while the
two-call path rounds them through bf16 scale dtypes, so comparisons carry a
small tolerance rather than bit-equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pt2tpu.ops.kernels.pallas_ternary import (
    ternary_mlp_pallas,
    ternary_mlp_pallas_stacked,
)
from pt2tpu.ops.ternary_matmul import (
    fused_mlp_apply,
    fused_mlp_ok,
    ternary_linear_apply,
)
from pt2tpu.quant import fold as foldmod
from pt2tpu.utils.randmodel import random_ternary_linear


class _Cfg:
    gated_mlp = True


def _make_lp(i, D, I, n, perm_mode="ssr"):
    gu = random_ternary_linear(
        jax.random.PRNGKey(10 + i), 2 * I, D, perm_mode=perm_mode
    )
    dn = random_ternary_linear(
        jax.random.PRNGKey(20 + i), n, I, perm_mode=perm_mode
    )
    return foldmod.fold_layer_perms(_Cfg(), {"gateup": gu, "down": dn})


def _ref(lp, x, I, act=jax.nn.silu):
    guo = ternary_linear_apply(lp["gateup"], x, impl="xla",
                               out_dtype=jnp.float32)
    mid = act(guo[..., :I]) * guo[..., I:]
    return ternary_linear_apply(lp["down"], mid, impl="xla",
                                out_dtype=jnp.float32)


@pytest.mark.parametrize("I", [640, 512])  # ragged (5 of 16 blocks) + even
def test_fused_mlp_matches_two_call(I):
    D, n = 512, 512
    lp = _make_lp(0, D, I, n)
    gu, dn = lp["gateup"], lp["down"]
    assert dn.input_folded and gu.gather is not None
    x = jax.random.normal(jax.random.PRNGKey(3), (4, D), jnp.float32)
    want = np.asarray(_ref(lp, x, I))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ternary_mlp_pallas(
            x, gu.perm, gu.packed, gu.alpha, gu.mu,
            dn.packed, dn.alpha, dn.mu, act="silu", intermediate=I,
        ))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel


def test_fused_mlp_identity_perm():
    D, I, n = 512, 640, 512
    lp = _make_lp(1, D, I, n, perm_mode="identity")
    gu, dn = lp["gateup"], lp["down"]
    x = jax.random.normal(jax.random.PRNGKey(4), (3, D), jnp.float32)
    want = np.asarray(_ref(lp, x, I))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ternary_mlp_pallas(
            x, None, gu.packed, gu.alpha, gu.mu,
            dn.packed, dn.alpha, dn.mu, act="silu", intermediate=I,
        ))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel


def test_fused_mlp_stacked_layer_select():
    D, I, n = 512, 640, 512
    lps = [_make_lp(i, D, I, n) for i in range(3)]
    stack = lambda f: jnp.stack([f(l) for l in lps])  # noqa: E731
    gup = stack(lambda l: l["gateup"].packed)
    gua = stack(lambda l: l["gateup"].alpha)
    gum = stack(lambda l: l["gateup"].mu)
    gupm = stack(lambda l: l["gateup"].perm)
    dnp_ = stack(lambda l: l["down"].packed)
    dna = stack(lambda l: l["down"].alpha)
    dnm = stack(lambda l: l["down"].mu)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, D), jnp.float32)
    for li in range(3):
        want = np.asarray(_ref(lps[li], x, I))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ternary_mlp_pallas_stacked(
                x, gupm, gup, gua, gum, dnp_, dna, dnm, jnp.int32(li),
                act="silu", intermediate=I,
            ))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-4, (li, rel)


def test_fused_mlp_routing_predicate():
    D, I, n = 512, 640, 512
    lp = _make_lp(2, D, I, n)
    gu, dn = lp["gateup"], lp["down"]
    # CPU backend: never routed (kernel needs the TPU dtype paths)
    assert not fused_mlp_ok(gu, dn, "auto", 4)

    class _FakeTPU:
        def __call__(self):
            return "tpu"

    orig = jax.default_backend
    jax.default_backend = _FakeTPU()
    try:
        assert fused_mlp_ok(gu, dn, "auto", 4)
        assert not fused_mlp_ok(gu, dn, "a8", 4)  # a8 keeps two-call path
        assert not fused_mlp_ok(gu, dn, "auto", 128)  # prefill rows
        import dataclasses

        unfolded = dataclasses.replace(dn, input_folded=False)
        assert not fused_mlp_ok(gu, unfolded, "auto", 4)
    finally:
        jax.default_backend = orig


def test_fused_mlp_apply_wrapper_shape_and_value():
    D, I, n = 512, 640, 512
    lp = _make_lp(3, D, I, n)
    gu, dn = lp["gateup"], lp["down"]
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, D), jnp.float32)
    want = np.asarray(_ref(lp, x.reshape(-1, D), I)).reshape(2, 3, n)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mlp_apply(gu, dn, x, "silu", out_dtype=jnp.float32)
        )
    assert got.shape == (2, 3, n)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel


def test_pad_gateup_blocks_exact():
    """pad_gateup_blocks widens gate/up halves with zero-scale columns:
    the fused kernel (bps_d-friendly grid) and the decoder's half-split
    two-call path both reproduce the unpadded math exactly."""
    D, I, n = 512, 640, 512  # nv=5 -> padded to 8 blocks per half
    lp = _make_lp(7, D, I, n)
    lpp = foldmod.pad_gateup_blocks(lp)
    gu0, gup, dn = lp["gateup"], lpp["gateup"], lpp["down"]
    assert gup.out_features == 2 * 1024 and gu0.out_features == 2 * I
    x = jax.random.normal(jax.random.PRNGKey(8), (4, D), jnp.float32)
    want = np.asarray(_ref(lp, x, I))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ternary_mlp_pallas(
            x, gup.perm, gup.packed, gup.alpha, gup.mu,
            dn.packed, dn.alpha, dn.mu, act="silu", intermediate=I,
        ))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel
    # two-call path on the padded layout (decoder splits at out//2)
    guo = ternary_linear_apply(gup, x, impl="xla", out_dtype=jnp.float32)
    half = guo.shape[-1] // 2
    mid = jax.nn.silu(guo[..., :I]) * guo[..., half : half + I]
    got2 = np.asarray(
        ternary_linear_apply(dn, mid, impl="xla", out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got2, want, rtol=0, atol=0)


def test_pad_gateup_blocks_skips_moe_and_noop_cases():
    D, I, n = 512, 1024, 512  # nv=8: already a multiple -> no-op
    lp = _make_lp(8, D, I, n)
    assert foldmod.pad_gateup_blocks(lp)["gateup"] is lp["gateup"]
    lp2 = _make_lp(9, D, 640, n)
    lp2["router"] = object()  # MoE marker: experts stay unpadded
    assert foldmod.pad_gateup_blocks(lp2)["gateup"] is lp2["gateup"]
