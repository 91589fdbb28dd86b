"""Native C++ codec: builds, matches the jax packing layout bit-for-bit,
and survives fallback when shapes are invalid."""

import numpy as np
import pytest
import jax.numpy as jnp

from pt2tpu.core import packing
from pt2tpu.utils import native


def test_native_builds_and_loads():
    assert native.native_available(), "C++ runtime failed to build/load"


@pytest.mark.parametrize("n,K,bs", [(8, 128, 128), (16, 256, 128), (3, 384, 128), (5, 64, 16)])
def test_native_pack_matches_jax(rng, n, K, bs):
    codes = rng.integers(-1, 2, size=(n, K)).astype(np.int8)
    want = np.asarray(packing.pack_ternary(jnp.asarray(codes), block_size=bs))
    got = native.pack_ternary_np(codes, block_size=bs)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,K,bs", [(8, 128, 128), (7, 256, 64)])
def test_native_unpack_roundtrip(rng, n, K, bs):
    codes = rng.integers(-1, 2, size=(n, K)).astype(np.int8)
    packed = native.pack_ternary_np(codes, block_size=bs)
    back = native.unpack_ternary_np(packed, block_size=bs)
    np.testing.assert_array_equal(back, codes.T)
    # and cross-check against the jax unpacker
    want = np.asarray(packing.unpack_ternary(jnp.asarray(packed), block_size=bs))
    np.testing.assert_array_equal(back, want)


def test_native_rejects_bad_shapes(rng):
    with pytest.raises(ValueError):
        native.pack_ternary_np(np.zeros((4, 100), np.int8), block_size=128)


def test_native_large_threaded(rng):
    codes = rng.integers(-1, 2, size=(512, 2048)).astype(np.int8)
    packed = native.pack_ternary_np(codes)
    want = np.asarray(packing.pack_ternary(jnp.asarray(codes)))
    np.testing.assert_array_equal(packed, want)
