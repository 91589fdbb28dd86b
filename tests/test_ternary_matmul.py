"""Tests for the packed ternary matmul: XLA reference vs explicit dequant,
Pallas kernel (interpret mode on CPU) vs XLA reference, and the full
layer wrapper including perm gather + ragged pad lanes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from pt2tpu.core import packing
from pt2tpu.ops import ternary_matmul as tm
from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas
from pt2tpu.quant import gptq, hessian


def _rand_packed(rng, n=256, K=256, bs=128, scale_dtype=jnp.float32):
    T = rng.integers(-1, 2, size=(n, K)).astype(np.int8)
    nb = K // bs
    alpha = rng.normal(0.05, 0.01, size=(nb, n)).astype(np.float32)
    mu = rng.normal(0.0, 0.01, size=(nb, n)).astype(np.float32)
    packed = packing.pack_ternary(jnp.asarray(T), block_size=bs)
    return T, packed, jnp.asarray(alpha, scale_dtype), jnp.asarray(mu, scale_dtype)


def _dense_ref(T, alpha, mu, bs):
    """Explicitly dequantized (K, n) weight for ground truth."""
    n, K = T.shape
    nb = K // bs
    alpha_e = np.repeat(np.asarray(alpha, np.float32), bs, axis=0)  # (K, n)
    mu_e = np.repeat(np.asarray(mu, np.float32), bs, axis=0)
    return alpha_e * T.T.astype(np.float32) + mu_e  # (K, n)


def test_xla_matmul_matches_dense(rng):
    T, packed, alpha, mu = _rand_packed(rng)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    W = _dense_ref(T, alpha, mu, 128)
    want = x @ W
    got = np.asarray(tm.ternary_matmul_xla(jnp.asarray(x), packed, alpha, mu))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 matmul


def test_pallas_interpret_matches_xla(rng):
    T, packed, alpha, mu = _rand_packed(rng, n=256, K=384)
    x = jnp.asarray(rng.normal(size=(8, 384)).astype(np.float32))
    want = tm.ternary_matmul_xla(x, packed, alpha, mu)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = ternary_matmul_pallas(x, packed, alpha, mu, tile_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


def test_pallas_shape_validation(rng):
    _, packed, alpha, mu = _rand_packed(rng)
    with pytest.raises(ValueError):
        ternary_matmul_pallas(jnp.zeros((2, 256)), packed, alpha[:1], mu)


def test_layer_apply_end_to_end(rng):
    """quantize -> pack_layer -> ternary_linear_apply must equal
    x @ dequantize_layer(q).T + b for a ragged (m % bs != 0) layer."""
    n, m = 128, 200  # ragged: 2 blocks of 128 lanes, 56 pad lanes
    W = rng.normal(0.02, 1.0, size=(n, m)).astype(np.float32)
    X = rng.normal(size=(512, m)).astype(np.float32)
    H = jnp.asarray(X.T @ X / 512)
    _, Hinv = hessian.damped_inverse(H)
    q = gptq.ternary_gptq(jnp.asarray(W), H, Hinv, block_size=128)
    W_hat = np.asarray(gptq.dequantize_layer(q, m))  # (n, m) original order

    bias = rng.normal(size=(n,)).astype(np.float32)
    p = tm.pack_layer(q, in_features=m, bias=jnp.asarray(bias), scale_dtype=jnp.float32)

    x = rng.normal(size=(3, 5, m)).astype(np.float32)
    want = x @ W_hat.T + bias
    got = np.asarray(tm.ternary_linear_apply(p, jnp.asarray(x), impl="xla", out_dtype=jnp.float32))
    assert got.shape == (3, 5, n)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_layer_apply_rejects_wrong_features(rng):
    _, packed, alpha, mu = _rand_packed(rng)
    p = tm.PackedTernaryLinear(
        packed=packed, alpha=alpha, mu=mu,
        perm=jnp.arange(256, dtype=jnp.int32), bias=None, in_features=256,
    )
    with pytest.raises(ValueError):
        tm.ternary_linear_apply(p, jnp.zeros((2, 100)))


def test_scale_dtype_bf16_quality(rng):
    """bf16 scales must stay within ~1% of f32 scales on the matmul output."""
    T, packed, alpha, mu = _rand_packed(rng)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    out32 = np.asarray(tm.ternary_matmul_xla(x, packed, alpha, mu))
    out16 = np.asarray(
        tm.ternary_matmul_xla(
            x, packed, alpha.astype(jnp.bfloat16), mu.astype(jnp.bfloat16)
        )
    )
    denom = np.maximum(np.abs(out32), 1e-2)
    assert np.median(np.abs(out16 - out32) / denom) < 0.02


def test_pallas_a8_close_to_xla(rng):
    """W2A8 mode (int8 activations + int8 MXU dots) stays within the
    per-row absmax quantization error envelope of the exact result."""
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.ternary_matmul import ternary_matmul_xla

    K, n = 256, 256
    nb = K // 128
    packed = jnp.asarray(rng.integers(-128, 128, (K // 4, n)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.002, (nb, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = ternary_matmul_pallas(x, packed, alpha, mu, tile_n=128, a8=True)
    want = ternary_matmul_xla(x, packed, alpha, mu)
    denom = float(jnp.max(jnp.abs(want))) + 1e-9
    rel = float(jnp.max(jnp.abs(got - want))) / denom
    assert rel < 0.02, rel


def test_a8_xla_emulation_matches_kernel(rng):
    """ternary_matmul_xla_a8 (the non-TPU --a8 quality-gate path) reproduces
    the pallas kernel's W2A8 quantization semantics: same bf16 row
    normalization, same int8 rounding, integer-exact dots."""
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.ternary_matmul import ternary_matmul_xla_a8

    K, n = 256, 256
    nb = K // 128
    packed = jnp.asarray(rng.integers(-128, 128, (K // 4, n)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.002, (nb, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        kern = ternary_matmul_pallas(x, packed, alpha, mu, tile_n=128, a8=True)
    emu = ternary_matmul_xla_a8(x, packed, alpha, mu)
    denom = float(jnp.max(jnp.abs(kern))) + 1e-9
    rel = float(jnp.max(jnp.abs(emu - kern))) / denom
    assert rel < 1e-5, rel


def test_telescoped_exact_vs_masked(rng):
    """ADVICE r1: the telescoped unpack's exactness vs the masked path is
    empirical (raw planes reach 255 vs 3; the d2[:B]+d2[B:] fold adds a
    rounding site) — pin the two paths together at the production decode
    row tile (B=16) so a future tile-shape change can't silently break the
    contract. In interpret mode the operands stay f32 and dot accumulation
    order differs, so the documented contract HERE is <= 1e-4 relative;
    scripts/tpu_smoke.py asserts bit-equality on-chip (bf16 operands make
    every product exact) at llama-7b projection shapes."""
    from jax.experimental.pallas import tpu as pltpu

    T, packed, alpha, mu = _rand_packed(rng, n=512, K=512)
    x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        masked = ternary_matmul_pallas(
            x, packed, alpha, mu, tile_n=512, _telescope=False
        )
        tele = ternary_matmul_pallas(
            x, packed, alpha, mu, tile_n=512, _telescope=True
        )
    m = np.asarray(masked)
    t = np.asarray(tele)
    rel = np.max(np.abs(t - m)) / max(1e-9, float(np.max(np.abs(m))))
    assert rel <= 1e-4, f"telescoped vs masked rel err {rel:.2e}"


def test_gathered_kernel_matches_two_step(rng):
    """Fused gather+matmul kernel == standalone one-hot gather -> matmul
    (interpret mode keeps everything f32: bit-exact)."""
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.gather import make_packed_gather
    from pt2tpu.ops.kernels.pallas_gather import onehot_matmul_pallas
    from pt2tpu.ops.kernels.pallas_ternary import (
        ternary_matmul_pallas,
        ternary_matmul_pallas_gathered,
        ternary_matmul_pallas_gathered_stacked,
    )

    K, n, bs = 256, 256, 128
    codes = jnp.asarray(rng.integers(-1, 2, (n, K)), jnp.int8)
    packed = packing.pack_ternary(codes, block_size=bs)
    alpha = jnp.asarray(rng.uniform(0.4, 1.2, (K // bs, n)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.05, (K // bs, n)), jnp.float32)
    perm = jnp.asarray(rng.permutation(K), jnp.int32)
    g = make_packed_gather(perm, K)
    # pre-round to bf16: the two-step path casts the gathered x to bf16
    # before its matmul (ternary_matmul_pallas wrapper); the fused path
    # keeps full precision end-to-end — on identical bf16-representable
    # inputs both are bit-exact in interpret mode.
    x = jnp.asarray(rng.normal(size=(5, K)), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        xg = onehot_matmul_pallas(x, g.packed)
        want = ternary_matmul_pallas(xg, packed, alpha, mu, block_size=bs)
        got = ternary_matmul_pallas_gathered(
            x, g.packed, packed, alpha, mu, block_size=bs
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        # stacked variant: 2 layers, pick each
        packed2 = jnp.stack([packed, packed[:, ::-1]])
        alpha2 = jnp.stack([alpha, alpha * 1.5])
        mu2 = jnp.stack([mu, -mu])
        gp2 = jnp.stack([g.packed, g.packed])
        for li in (0, 1):
            want_l = ternary_matmul_pallas(
                xg, packed2[li], alpha2[li], mu2[li], block_size=bs
            )
            got_l = ternary_matmul_pallas_gathered_stacked(
                x, gp2, packed2, alpha2, mu2, jnp.int32(li), block_size=bs
            )
            np.testing.assert_array_equal(
                np.asarray(got_l), np.asarray(want_l), err_msg=f"layer {li}"
            )


def test_gathered_kernel_a8_close(rng):
    """Fused a8 variant stays within the A8 quantization envelope."""
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.gather import make_packed_gather
    from pt2tpu.ops.kernels.pallas_ternary import (
        ternary_matmul_pallas_gathered,
    )

    K, n, bs = 256, 128, 128
    codes = jnp.asarray(rng.integers(-1, 2, (n, K)), jnp.int8)
    packed = packing.pack_ternary(codes, block_size=bs)
    alpha = jnp.asarray(rng.uniform(0.4, 1.2, (K // bs, n)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.05, (K // bs, n)), jnp.float32)
    perm = jnp.asarray(rng.permutation(K), jnp.int32)
    g = make_packed_gather(perm, K)
    x = jnp.asarray(rng.normal(size=(3, K)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        exact = ternary_matmul_pallas_gathered(
            x, g.packed, packed, alpha, mu, block_size=bs
        )
        a8 = ternary_matmul_pallas_gathered(
            x, g.packed, packed, alpha, mu, block_size=bs, a8=True
        )
    rel = float(
        jnp.linalg.norm(a8 - exact) / jnp.maximum(jnp.linalg.norm(exact), 1e-9)
    )
    assert rel < 0.02, rel


def test_iota_gather_matches_index_form(rng):
    """In-kernel iota-generated one-hot gather == index-form gather,
    bit-exactly, incl. ragged pads (perm == m reads 0) and the stacked
    layer-indexed variant. (The packed-plane kernel streams 0.25 B/entry of
    one-hot matrix; this one generates it from the index vector — decode
    budget measured gathers at 19% of a 7B token, see RESULTS.md.)"""
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.gather import apply_input_perm
    from pt2tpu.ops.kernels.pallas_gather import (
        onehot_iota_pallas,
        onehot_iota_pallas_stacked,
    )

    # ragged: m=300 features padded to D=384 lanes, K=512 visit lanes with
    # pads mapping to m (zero slots).
    m, D, K = 300, 384, 512
    perm = np.full(K, m, np.int32)
    perm[:m] = rng.permutation(m)
    x = jnp.asarray(rng.normal(size=(3, m)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = onehot_iota_pallas(x, jnp.asarray(perm), D=D)
    want = apply_input_perm(x, jnp.asarray(perm), m)
    assert (np.asarray(got) == np.asarray(want)).all()

    L = 3
    perms = np.stack([rng.permutation(D) for _ in range(L)]).astype(np.int32)
    xd = jnp.asarray(rng.normal(size=(2, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        for li in range(L):
            got_l = onehot_iota_pallas_stacked(
                xd, jnp.asarray(perms), jnp.int32(li), D=D
            )
            want_l = apply_input_perm(xd, jnp.asarray(perms[li]), D)
            assert (np.asarray(got_l) == np.asarray(want_l)).all(), li
