"""Round-trip and layout-contract tests for 2-bit plane packing."""

import numpy as np
import jax.numpy as jnp
import pytest

from pt2tpu.core import packing


def _rand_T(rng, n, K):
    return rng.integers(-1, 2, size=(n, K)).astype(np.int8)


@pytest.mark.parametrize("n,K,bs", [(8, 128, 128), (16, 256, 128), (4, 64, 16), (3, 384, 128)])
def test_roundtrip(rng, n, K, bs):
    T = _rand_T(rng, n, K)
    packed = packing.pack_ternary(jnp.asarray(T), block_size=bs)
    assert packed.shape == (K // 4, n)
    assert packed.dtype == jnp.int8
    back = np.asarray(packing.unpack_ternary(packed, block_size=bs))
    np.testing.assert_array_equal(back, T.T)


def test_layout_contract(rng):
    """Byte (b*bs4 + r, j) holds visit-columns b*bs + p*bs4 + r in planes p."""
    n, K, bs = 2, 128, 128
    bs4 = bs // 4
    T = _rand_T(rng, n, K)
    packed = np.asarray(packing.pack_ternary(jnp.asarray(T), block_size=bs))
    for r in [0, 7, 31]:
        for p in range(4):
            col = p * bs4 + r
            field = (packed[r].astype(np.int32) >> (2 * p)) & 3
            np.testing.assert_array_equal(field - 1, T[:, col])


def test_density():
    assert packing.packed_nbytes(n=4096, K=4096, num_blocks=32) == 4096 * 1024 + 2 * 32 * 4096 * 2


def test_rejects_bad_shapes(rng):
    with pytest.raises(ValueError):
        packing.pack_ternary(jnp.zeros((4, 100), jnp.int8), block_size=128)


def test_memory_footprint():
    import jax

    from pt2tpu.utils.randmodel import random_ternary_linear

    p = random_ternary_linear(jax.random.PRNGKey(0), 256, 256, perm_mode="ssr")
    fp = p.memory_footprint()
    # K is padded to 16 scale blocks (2048 lanes) at these toy dims.
    K = p.packed.shape[0] * 4
    assert fp["packed"] == K * 256 // 4
    assert fp["gather"] == (256 // 4) * K
    assert fp["total"] == sum(v for k, v in fp.items() if k != "total")
