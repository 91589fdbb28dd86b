"""Stacked (layer-indexed) pallas kernel: interpret-mode equality with the
per-layer XLA path for every layer index."""

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from pt2tpu.core import packing
from pt2tpu.ops import ternary_matmul as tm
from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas_stacked


def test_stacked_kernel_matches_per_layer(rng):
    L, n, K, bs = 3, 256, 256, 128
    nb = K // bs
    packed = []
    codes = []
    for _ in range(L):
        T = rng.integers(-1, 2, size=(n, K)).astype(np.int8)
        codes.append(T)
        packed.append(np.asarray(packing.pack_ternary(jnp.asarray(T), block_size=bs)))
    packed = jnp.asarray(np.stack(packed))
    alpha = jnp.asarray(rng.normal(0.05, 0.01, (L, nb, n)).astype(np.float32))
    mu = jnp.asarray(rng.normal(0, 0.01, (L, nb, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, K)).astype(np.float32))

    for li in range(L):
        want = np.asarray(
            tm.ternary_matmul_xla(x, packed[li], alpha[li], mu[li], block_size=bs)
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                ternary_matmul_pallas_stacked(
                    x, packed, alpha, mu, jnp.int32(li),
                    block_size=bs, tile_n=128,
                )
            )
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2, err_msg=f"layer {li}")
