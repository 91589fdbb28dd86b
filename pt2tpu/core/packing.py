"""2-bit ternary plane packing — kernel-oriented layout.

The reference has a pack/unpack pair that is dead code and persists codes as
int8 anyway (utils.py:189-248, SURVEY.md §2.4-6). Here packing is the load-
bearing representation: packed planes are what lives in HBM and what the
Pallas dequant+matmul kernel streams (ops/kernels/pallas_ternary.py). 4 codes
per byte ⇒ 0.25 bytes/weight (+ bf16 scales) vs 2 bytes for bf16 — an ~8x
HBM-bandwidth reduction, which is the whole game for batch-small decode.

Layout contract ("contraction-major, plane-interleaved"):

  * Input codes ``T`` are (n, K) in **visit order** (K = nb * block_size,
    out of quant/gptq.py).
  * ``packed`` is (K // 4, n) int8. For scale-block b and row r in
    [0, block_size // 4), byte ``packed[b * bs4 + r, j]`` holds the four
    codes for visit-columns ``b*bs + p*bs4 + r`` (p = plane 0..3) of output
    feature j, with code ``T + 1`` ∈ {0,1,2} in bit-field p (bits 2p..2p+1,
    matching the reference's value mapping at utils.py:203).

  Why interleaved: unpacking a 2-bit block then becomes *four shifted copies
  of the same tile concatenated along sublanes* — no per-row variable shifts,
  no cross-lane shuffles — and reproduces visit-column order exactly, so the
  kernel's per-128-column scale blocks stay contiguous.

All ops are jax-traceable and run on CPU or TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_ternary", "unpack_ternary", "packed_nbytes"]


def pack_ternary(T: jax.Array, block_size: int = 128) -> jax.Array:
    """Pack (n, K) ternary codes {-1,0,+1} into (K//4, n) int8 planes.

    K must be a multiple of ``block_size`` (the quant engine always emits
    nb * block_size lanes) and ``block_size`` a multiple of 4.
    """
    n, K = T.shape
    if block_size % 4 != 0:
        raise ValueError(f"block_size must be divisible by 4, got {block_size}")
    if K % block_size != 0:
        raise ValueError(f"K={K} not a multiple of block_size={block_size}")
    bs4 = block_size // 4
    nb = K // block_size

    u = (T.astype(jnp.int32) + 1).astype(jnp.uint8)  # {-1,0,1} -> {0,1,2}
    # (K, n) contraction-major, then split [b, p, r] with column = b*bs + p*bs4 + r.
    ut = u.T.reshape(nb, 4, bs4, n)
    packed = ut[:, 0] | (ut[:, 1] << 2) | (ut[:, 2] << 4) | (ut[:, 3] << 6)
    return packed.reshape(K // 4, n).astype(jnp.int8)


def unpack_ternary(packed: jax.Array, block_size: int = 128) -> jax.Array:
    """Inverse of :func:`pack_ternary`: (K//4, n) int8 → (K, n) int8 in
    {-1,0,+1}, rows in visit-column order.

    Uses ``(x >> s) & 3`` which is correct on int8 even under arithmetic
    shift (the mask keeps only the two target bits) — the same trick the
    Pallas kernel uses in VMEM.
    """
    K4, n = packed.shape
    bs4 = block_size // 4
    if K4 % bs4 != 0:
        raise ValueError(f"packed rows {K4} not a multiple of block_size/4={bs4}")
    nb = K4 // bs4

    pr = packed.reshape(nb, bs4, n)
    planes = [((pr >> (2 * p)) & 3) for p in range(4)]
    stacked = jnp.concatenate(planes, axis=1)  # (nb, bs, n), row = p*bs4 + r
    return (stacked.reshape(nb * block_size, n) - 1).astype(jnp.int8)


def packed_nbytes(n: int, K: int, num_blocks: int, scale_bytes: int = 2) -> int:
    """Storage bytes for one packed layer: planes + alpha/mu scales."""
    return (K // 4) * n + 2 * num_blocks * n * scale_bytes
