"""Fused 2-bit dequant + matmul Pallas TPU kernel.

The hot op of the whole framework: streams packed ternary planes
(0.25 B/weight) and bf16 per-block scales from HBM, unpacks to codes in
VMEM with two-bit shifts, and feeds the MXU — the dequantized weight matrix
never exists in HBM. Replaces the reference's materialize-then-matmul
``TernaryLinear.forward`` (ref model.py:75-110).

Structure (learned from on-chip profiling — small tiles were per-step
overhead-bound at ~14 GB/s effective):

  * grid = (n / tile_n, nb / bps): each step covers ``bps`` 128-column scale
    blocks x ``tile_n`` output features, so DMAs are hundreds of KB and the
    j-sweep revisits a VMEM-resident f32 accumulator tile.
  * Inside a step the ``bps`` sub-blocks unroll as *static* slices (Mosaic
    cannot prove alignment of dynamic single-row slices), each doing:
    widen int8->int32 (no i8 vector shifts on TPU), 4x shift+mask on the
    quarter-size packed tile, concat planes along sublanes (the
    plane-interleaved pack layout makes this reproduce column order),
    scale by alpha in bf16, one (B,128)x(128,tile_n) MXU dot, plus the
    rank-1 mu correction from the block sum of x.

Accumulation is f32 in the output tile; codes x alpha are exact in bf16
({-a, 0, +a}).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "ternary_matmul_pallas",
    "ternary_matmul_pallas_stacked",
    "ternary_matmul_pallas_gathered",
    "ternary_matmul_pallas_gathered_stacked",
    "ternary_matmul_pallas_igathered",
    "ternary_matmul_pallas_igathered_stacked",
    "ternary_mlp_pallas",
    "ternary_mlp_pallas_stacked",
    "normalize_rows_a8",
]


def _pick_tile_n(n: int, want: int) -> int:
    """Pick the output-feature tile: a 128-aligned divisor of n, preferring
    the smallest one >= want (fewer, bigger grid steps), else the largest
    available. Naive "largest divisor <= want" is catastrophic for
    MXU-unfriendly n (n=11008 = 86*128 has no divisor near 2048; <=-clamping
    picked 256 and made the grid 43 steps wide — measured ~5x slowdown on
    the MLP projections)."""
    divisors = [d for d in range(128, n + 1, 128) if n % d == 0]
    at_least = [d for d in divisors if d >= want]
    if at_least:
        return at_least[0]
    return divisors[-1]


def _vmem_estimate(tn: int, bps: int, bs: int, Bp: int) -> int:
    """Rough per-step VMEM bytes: double-buffered inputs + output tile +
    in-kernel temporaries (int32 planes, bf16 code tile, f32 acc)."""
    bs4 = bs // 4
    packed2 = 2 * bps * bs4 * tn  # int8, 2 buffers
    scales2 = 2 * 2 * bps * tn * 2  # alpha+mu bf16, 2 buffers
    x2 = 2 * Bp * bps * bs * 2
    out = 2 * Bp * tn * 4
    temps = bs * tn * 2 + 4 * bs4 * tn * 4 + 2 * Bp * tn * 4
    return packed2 + scales2 + x2 + out + temps


def _pick_tiles(n: int, nb: int, bs: int, Bp: int, want_tn: int, want_bps: int):
    """(tile_n, blocks_per_step) honoring divisibility, 8-alignment, and a
    ~12 MB VMEM budget (16 MB physical; headroom for the pipeline).

    Bigger steps matter: fixed per-grid-step cost ~1.2 us dominated the
    decode path at small tiles (117 us/layer at 4096x16 vs 177 at 2048x8
    measured at llama-2-7b dims)."""
    budget = 12 * 1024 * 1024
    tn = _pick_tile_n(n, min(want_tn, n))
    tn_divisors = sorted(
        (d for d in range(128, n + 1, 128) if n % d == 0), reverse=True
    )

    def bps_candidates():
        c = [b for b in range(8, nb + 1, 8) if nb % b == 0]
        if nb not in c:
            c.append(nb)
        return sorted(c, reverse=True)

    bps = max(
        (b for b in bps_candidates() if b <= max(want_bps, 8)), default=nb
    )
    # Shrink bps, then tn, until the step fits the budget.
    while _vmem_estimate(tn, bps, bs, Bp) > budget:
        smaller_bps = [b for b in bps_candidates() if b < bps]
        if smaller_bps:
            bps = smaller_bps[0]
            continue
        smaller_tn = [d for d in tn_divisors if d < tn]
        if smaller_tn:
            tn = smaller_tn[0]
            continue
        break  # minimal config; let Mosaic report if it truly can't fit
    return tn, bps


def _accumulate_step(xs_src, packed_ref, alpha_ref, mu_ref,
                     bps, bs, a8, force_telescope):
    """Shared per-grid-step partial sum: one (B, bps*bs) x-tile against
    bps packed scale blocks. ``xs_src`` is a jnp array (bf16/f32).
    Returns the (B, tile_n) f32 contribution; the caller owns accumulation
    (VMEM output tile or scratch accumulator).

    ``a8`` is False (bf16), True (W2A8), or the WRONG-MATH sentinel
    ``"floor"``: skip the unpack entirely and dot the raw packed planes
    (replicated to full depth) on the s8 MXU path — the end-to-end
    DMA+dots floor probe (impl="floor8"). Same DMA volume, same call/grid
    structure, zero unpack VPU work; outputs are garbage by design."""
    floor = a8 == "floor"
    bs4 = bs // 4
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = xs_src.shape[0]
    tn = alpha_ref.shape[1]
    acc = jnp.zeros((B, tn), jnp.float32)

    # The kernel is VPU *pass*-bound (each full-size elementwise op is
    # one 8x128/cycle sweep), so scale application moves to the MXU:
    #   W = alpha*(u-1) + mu = alpha*u + (mu - alpha)
    #   x @ W^T = alpha_row * (x_b @ u_b)  +  blocksum(x) @ (mu - alpha)
    # blocksum(x) = x_step @ O with O the (bps*bs, bps) block-indicator —
    # a small MXU dot, NOT a lane reduction (an in-kernel (B,1)
    # lane-reduce + broadcast measured ~300x slower: 28 ms vs 95 us).
    #
    # a8 (W2A8): the wrapper pre-normalizes x to per-row absmax 127 and
    # rescales the output; here the tiny x tile is rounded to int8 so
    # the unpacked codes can stay int8 — skipping the full-volume
    # int32->bf16 cast — and the dots run on the int8 MXU path
    # (measured -15% vs the bf16 pipeline at qkv shape). x remains a
    # bf16 operand (16-row tiles, same VMEM budget as the bf16 path);
    # both terms consume the same quantized xs for affine consistency.
    if a8:
        xs = jnp.clip(
            jnp.round(xs_src.astype(jnp.float32)), -127, 127
        ).astype(jnp.int8)  # (B, bps*bs)
    else:
        xs = xs_src.astype(cdt)
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * bs, bps), 0) // bs
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * bs, bps), 1)
    ones_blocks = (row_blk == col_blk).astype(cdt)
    # int8 values <= 127 are exact in bf16; blocksum accumulates in f32.
    smat = jnp.dot(
        xs.astype(cdt), ones_blocks, preferred_element_type=jnp.float32
    )
    offset = (mu_ref[:] - alpha_ref[:]).astype(cdt)  # (bps, TN)
    acc += jnp.dot(
        smat.astype(cdt), offset, preferred_element_type=jnp.float32
    )

    # Mask-free telescoped unpack for decode-size row tiles: with
    # zero-extended bytes the raw shifted plane s_q = sum_{p>=q}
    # 4^(p-q) c_p telescopes, so  dot(x, masked_planes) =
    # dot([x; -4*shift(x)], raw_planes)  — the 4 full-volume mask
    # passes become 16 extra x rows, free below the MXU pipeline fill
    # (measured ~10% on the qkv shape; exact, unlike folding the
    # stack into one bf16 x~ operand, whose rounding is amplified by
    # the 0..255 plane magnitudes). At prefill row tiles (B > 64) the
    # doubled dot rows are real FLOPs — keep the masked path there.
    # The identity is algebraically exact but NOT bit-equal to the
    # masked path (raw planes reach 255, inflating f32 partial sums
    # ~85x, and the final d2[:B]+d2[B:] adds a rounding site): measured
    # on-chip max 2.5e-6 relative (1-2 f32 ulps) at llama-7b projection
    # shapes. The 1e-5 contract is pinned by tests/test_ternary_matmul
    # ::test_telescoped_exact_vs_masked (interpret) and scripts/
    # tpu_smoke.py (on-chip); re-verify if tile shapes change.
    # ``force_telescope`` exists for those checks.
    if force_telescope is None:
        telescope = (not a8) and B <= 64
    else:
        telescope = force_telescope and not a8
    for p in range(bps):  # static unroll; all slices compile-time aligned
        xb = xs[:, p * bs : (p + 1) * bs]  # (B, bs)
        if floor:
            u8 = jnp.concatenate(
                [packed_ref[p * bs4 : (p + 1) * bs4, :]] * 4, axis=0
            )  # (bs, TN) int8 raw planes — no widen/shift/mask/cast
            d = jnp.dot(
                xb, u8, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            acc += d * alpha_ref[p : p + 1, :].astype(jnp.float32)
            continue
        if telescope:
            pk = pltpu.bitcast(
                packed_ref[p * bs4 : (p + 1) * bs4, :], jnp.uint8
            ).astype(jnp.int32)
            planes = [(pk >> (2 * q)) for q in range(4)]  # no masks
            u = jnp.concatenate(planes, axis=0).astype(cdt)  # <=255 exact
            xb2 = jnp.concatenate(
                [jnp.zeros((B, bs4), cdt), xb[:, : bs - bs4]], axis=1
            )
            xs2 = jnp.concatenate([xb, -4.0 * xb2], axis=0)  # (2B, bs)
            d2 = jnp.dot(xs2, u, preferred_element_type=jnp.float32)
            d = d2[:B] + d2[B:]
            acc += d * alpha_ref[p : p + 1, :].astype(jnp.float32)
            continue
        pk = packed_ref[p * bs4 : (p + 1) * bs4, :].astype(jnp.int32)
        planes = [((pk >> (2 * q)) & 3) for q in range(4)]
        if a8:
            u8 = jnp.concatenate(
                [q_.astype(jnp.int8) for q_ in planes], axis=0
            )  # (bs, TN) int8 {0,1,2}
            d = jnp.dot(
                xb, u8, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        else:
            u = jnp.concatenate(planes, axis=0).astype(cdt)
            d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
        acc += d * alpha_ref[p : p + 1, :].astype(jnp.float32)
    return acc


def _make_kernel(bps: int, bs: int, a8: bool = False, telescope=None):
    def _kernel(x_ref, packed_ref, alpha_ref, mu_ref, o_ref):
        j = pl.program_id(2)  # k-step (innermost)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += _accumulate_step(
            x_ref[:], packed_ref, alpha_ref, mu_ref,
            bps, bs, a8, telescope,
        )

    return _kernel


def _gather_prologue(x_ref, gp_ref, xg_ref):
    """xg = x @ onehot(G) for this j-step's K columns (exact for bf16 x:
    one-hot passthrough). G rows sweep the full input dim in 128-lane
    sub-blocks (32 packed rows each)."""
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    D4 = gp_ref.shape[0]
    xg = jnp.zeros((x_ref.shape[0], gp_ref.shape[1]), jnp.float32)
    for pg in range(D4 // 32):
        gk = gp_ref[pg * 32 : (pg + 1) * 32, :].astype(jnp.int32)
        planes = [((gk >> (2 * q)) & 3) for q in range(4)]
        u = jnp.concatenate(planes, axis=0).astype(cdt)  # (128, TK) {0,1}
        xb = x_ref[:, pg * 128 : (pg + 1) * 128].astype(cdt)
        xg += jnp.dot(xb, u, preferred_element_type=jnp.float32)
    xg_ref[:] = xg.astype(xg_ref.dtype)


def _make_gather_kernel(bps: int, bs: int, nj: int, a8: bool = False):
    """Fused SSR-gather + ternary matmul: grid (B/tb, nb/bps [j], n/tn [i])
    — i innermost so the gathered x tile (scratch) is computed ONCE per
    (b, j) and reused across all output tiles. Drops the standalone gather
    kernel call + its HBM round trip from the decode path.

    Reduction correctness: with i innermost, each o_ref block is revisited
    NON-consecutively across j. On hardware, an output VMEM window does not
    survive (and is not re-fetched) between non-adjacent visits — '+=' into
    o_ref across j silently drops partial sums whenever n/tn > 1 (interpret
    mode hides this; caught on-chip 2026-08, logits off by >1 at 7B qkv/
    gateup shapes). So partial sums live in a per-i-tile f32 VMEM scratch
    ``acc_ref`` (ni, tb, tn) that persists across grid steps, and o_ref is
    written exactly once, on the final j step (its earlier copy-outs write
    garbage that the last, in-order copy-out overwrites)."""

    def _kernel(x_ref, gp_ref, packed_ref, alpha_ref, mu_ref, o_ref,
                xg_ref, acc_ref):
        j = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            _gather_prologue(x_ref, gp_ref, xg_ref)

        step = _accumulate_step(
            xg_ref[:], packed_ref, alpha_ref, mu_ref, bps, bs, a8, None,
        )
        if nj == 1:
            o_ref[:] = step
            return
        # where() (select, not multiply) keeps a NaN-filled uninitialized
        # scratch from poisoning the j == 0 step.
        acc = jnp.where(j == 0, jnp.zeros_like(step), acc_ref[i]) + step
        acc_ref[i] = acc

        @pl.when(j == nj - 1)
        def _():
            o_ref[:] = acc

    return _kernel


def normalize_rows_a8(x: jax.Array):
    """Per-row absmax normalization for W2A8: x ≈ x_norm * sx with
    |x_norm| <= 127. The kernel rounds x_norm to int8 in VMEM (the x tile
    is tiny next to the weights); keeping x a bf16 operand preserves the
    16-row tiling and VMEM budget of the bf16 path.
    """
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    return (x32 / sx).astype(jnp.bfloat16), sx


@functools.partial(
    jax.jit, static_argnames=("block_size", "tile_n", "blocks_per_step", "a8")
)
def ternary_matmul_pallas_stacked(
    x: jax.Array,
    packed: jax.Array,  # (L, K//4, n) — ALL layers' planes, unsliced
    alpha: jax.Array,  # (L, nb, n)
    mu: jax.Array,  # (L, nb, n)
    layer_idx: jax.Array,  # scalar int32
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
) -> jax.Array:
    """Layer-indexed variant for scan-over-layers decode loops.

    Inside ``lax.scan`` the per-layer weight slice of a stacked array cannot
    fuse into an opaque pallas call, so XLA materializes an HBM->HBM copy of
    every operand each layer (measured ~550 us/layer of pure copy at 7B —
    more than the matmuls themselves). Here the kernel receives the WHOLE
    stacked arrays and a scalar-prefetched layer index; the grid's index
    maps select layer ``layer_idx``'s blocks directly, so nothing is ever
    copied.
    """
    L, K4, n = packed.shape
    K = K4 * 4
    _, nb, n2 = alpha.shape
    bs = block_size
    if bs % 128 != 0 or K % bs != 0 or nb * bs != K or n2 != n:
        raise ValueError(
            f"bad shapes: packed {packed.shape}, alpha {alpha.shape}, bs {bs}"
        )
    if n % 128 != 0:
        raise ValueError(f"out_features {n} must be a multiple of 128")
    B = x.shape[0]
    tb = min(max(16, -(-B // 16) * 16), 256)
    Bp = -(-B // tb) * tb
    tn, bps = _pick_tiles(n, nb, bs, tb, tile_n, blocks_per_step)
    bs4 = bs // 4
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)
    else:
        x = x.astype(jnp.bfloat16)

    inner = _make_kernel(bps, bs, a8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, n // tn, nb // bps),
        # Index maps receive (*grid_indices, *scalar_prefetch_refs).
        in_specs=[
            pl.BlockSpec(
                (tb, bps * bs), lambda b, i, j, li: (b, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bps * bs4, tn),
                lambda b, i, j, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bps, tn),
                lambda b, i, j, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bps, tn),
                lambda b, i, j, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j, li: (b, i), memory_space=pltpu.VMEM
        ),
    )

    # Weight blocks carry a leading size-1 layer dim; view it away so the
    # shared inner kernel sees 2-D refs.
    def kernel_wrap(idx_ref, x_ref, packed_ref, alpha_ref, mu_ref, o_ref):
        del idx_ref  # consumed by the index maps
        inner(x_ref, packed_ref.at[0], alpha_ref.at[0], mu_ref.at[0], o_ref)

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, packed, alpha, mu)
    if a8:
        out = out * sx
    return out[:B]


def _gather_vmem_estimate(tn, bps, bs, Bp, D, n):
    base = _vmem_estimate(tn, bps, bs, Bp)
    gp2 = 2 * (D // 4) * bps * bs  # G block, double-buffered
    xfull2 = 2 * Bp * D * 2
    scratch = Bp * bps * bs * 2
    gtemps = 4 * 32 * bps * bs * 4 + 128 * bps * bs * 2
    acc = n * Bp * 4  # (ni, tb, tn) f32 accumulator: ni*tn == n, tn-invariant
    return base + gp2 + xfull2 + scratch + gtemps + acc


def _pick_tiles_gathered(n, nb, bs, Bp, D, want_tn, want_bps):
    budget = 12 * 1024 * 1024
    tn = _pick_tile_n(n, min(want_tn, n))
    tn_divisors = sorted(
        (d for d in range(128, n + 1, 128) if n % d == 0), reverse=True
    )
    bps_all = sorted(
        {b for b in range(8, nb + 1, 8) if nb % b == 0} | {nb}, reverse=True
    )
    bps = max((b for b in bps_all if b <= max(want_bps, 8)), default=nb)
    while _gather_vmem_estimate(tn, bps, bs, Bp, D, n) > budget:
        smaller_bps = [b for b in bps_all if b < bps]
        if smaller_bps:
            bps = smaller_bps[0]
            continue
        smaller_tn = [d for d in tn_divisors if d < tn]
        if smaller_tn:
            tn = smaller_tn[0]
            continue
        break
    return tn, bps


@functools.partial(
    jax.jit, static_argnames=("block_size", "tile_n", "blocks_per_step", "a8")
)
def ternary_matmul_pallas_gathered(
    x: jax.Array,  # (B, D) UN-gathered activations
    gpacked: jax.Array,  # (D//4, K) packed one-hot perm
    packed: jax.Array,  # (K//4, n)
    alpha: jax.Array,
    mu: jax.Array,
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
) -> jax.Array:
    """Fused out = gather(x) @ dequant(packed): the SSR one-hot gather runs
    as a per-j-step prologue inside the matmul kernel (scratch-cached across
    output tiles) instead of a separate kernel call + HBM round trip."""
    D4g, K_g = gpacked.shape
    D = D4g * 4
    K4, n = packed.shape
    K = K4 * 4
    nb = alpha.shape[0]
    bs = block_size
    if K_g != K or bs % 128 != 0 or nb * bs != K or n % 128 != 0:
        raise ValueError(
            f"bad shapes: gpacked {gpacked.shape}, packed {packed.shape}"
        )
    B, m = x.shape
    if m < D:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    # Row tile capped at 64 (not 256): the per-i-tile accumulator scratch
    # costs n*tb*4 bytes regardless of tiling, so big row tiles can't fit.
    # Large-B callers should take the two-step path (ternary_linear_apply
    # routes B > 64 there); this cap keeps the kernel correct at any B.
    tb = min(max(16, -(-B // 16) * 16), 64)
    Bp = -(-B // tb) * tb
    tn, bps = _pick_tiles_gathered(n, nb, bs, tb, D, tile_n, blocks_per_step)
    bs4 = bs // 4
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)  # absmax is permutation-invariant
    else:
        x = x.astype(
            jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype
        )

    nj, ni = nb // bps, n // tn
    grid = (Bp // tb, nj, ni)  # i innermost: xg reused
    out = pl.pallas_call(
        _make_gather_kernel(bps, bs, nj, a8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, D), lambda b, j, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D4g, bps * bs), lambda b, j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bps * bs4, tn), lambda b, j, i: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bps, tn), lambda b, j, i: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bps, tn), lambda b, j, i: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, j, i: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (tb, bps * bs),
                jnp.bfloat16
                if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
            pltpu.VMEM((ni, tb, tn), jnp.float32),
        ],
    )(x, gpacked, packed, alpha, mu)
    if a8:
        out = out * sx
    return out[:B]


@functools.partial(
    jax.jit, static_argnames=("block_size", "tile_n", "blocks_per_step", "a8")
)
def ternary_matmul_pallas_gathered_stacked(
    x: jax.Array,  # (B, D)
    gpacked: jax.Array,  # (L, D//4, K)
    packed: jax.Array,  # (L, K//4, n)
    alpha: jax.Array,  # (L, nb, n)
    mu: jax.Array,
    layer_idx: jax.Array,
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
) -> jax.Array:
    """Stacked (scan-over-layers) fused gather+matmul — scalar-prefetched
    layer index, same rationale as ternary_matmul_pallas_stacked."""
    L, D4g, K_g = gpacked.shape
    D = D4g * 4
    _, K4, n = packed.shape
    K = K4 * 4
    nb = alpha.shape[1]
    bs = block_size
    if K_g != K or bs % 128 != 0 or nb * bs != K or n % 128 != 0:
        raise ValueError(
            f"bad shapes: gpacked {gpacked.shape}, packed {packed.shape}"
        )
    B, m = x.shape
    if m < D:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    tb = min(max(16, -(-B // 16) * 16), 64)  # see gathered (acc scratch)
    Bp = -(-B // tb) * tb
    tn, bps = _pick_tiles_gathered(n, nb, bs, tb, D, tile_n, blocks_per_step)
    bs4 = bs // 4
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)
    else:
        x = x.astype(
            jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype
        )

    nj, ni = nb // bps, n // tn
    inner = _make_gather_kernel(bps, bs, nj, a8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, nj, ni),
        in_specs=[
            pl.BlockSpec(
                (tb, D), lambda b, j, i, li: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, D4g, bps * bs), lambda b, j, i, li: (li[0], 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bps * bs4, tn), lambda b, j, i, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bps, tn), lambda b, j, i, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bps, tn), lambda b, j, i, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, j, i, li: (b, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (tb, bps * bs),
                jnp.bfloat16
                if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
            pltpu.VMEM((ni, tb, tn), jnp.float32),
        ],
    )

    def kernel_wrap(idx_ref, x_ref, gp_ref, packed_ref, alpha_ref, mu_ref,
                    o_ref, xg_ref, acc_ref):
        del idx_ref
        inner(
            x_ref, gp_ref.at[0], packed_ref.at[0], alpha_ref.at[0],
            mu_ref.at[0], o_ref, xg_ref, acc_ref,
        )

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, gpacked, packed,
      alpha, mu)
    if a8:
        out = out * sx
    return out[:B]


# ---------------------------------------------------------------------------
# Fused iota-gather + matmul (v2): the SSR input gather runs as a one-time
# prologue into a block-indexed VMEM scratch, and the matmul grid keeps the
# SAFE accumulation order (output tiles revisited on consecutive j steps
# only). This differs from the retired ternary_matmul_pallas_gathered in
# two ways that made that kernel lose on-chip (120.7 vs 149.1 tok/s):
#   * no packed one-hot G stream from HBM — the one-hot is generated
#     in-kernel from the (1, K) index row (pallas_gather iota rationale);
#   * grid is (b, i, j) with j innermost, so o_ref accumulates across
#     CONSECUTIVE revisits (no per-i-tile f32 accumulator scratch RMW).
# The gathered lanes live in a (nj, tb, bps*bs) scratch written once at
# step (i==0, j==0) with static block slices and read per step via a
# dynamic leading index.
# ---------------------------------------------------------------------------


def _make_igather_kernel(bps: int, bs: int, nj: int, a8: bool):
    def _kernel(x_ref, perm_ref, packed_ref, alpha_ref, mu_ref, o_ref,
                xg_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when((i == 0) & (j == 0))
        def _():
            cdt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                   else jnp.float32)
            B, D = x_ref.shape
            w = bps * bs
            xs = x_ref[:].astype(cdt)
            W = min(_gather_win(w), w)
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
            for jj in range(nj):  # static per-scratch-block gathers
                accs = []
                for jw in range(w // W):
                    lane0 = jj * w + jw * W
                    idx_w = perm_ref[:, lane0 : lane0 + W]  # (1, W)
                    acc = jnp.zeros((B, W), jnp.float32)
                    for p in range(D // 128):
                        u = (rows == idx_w - p * 128).astype(cdt)
                        acc += jnp.dot(
                            xs[:, p * 128 : (p + 1) * 128], u,
                            preferred_element_type=jnp.float32,
                        )
                    accs.append(acc)
                xg_ref[jj] = jnp.concatenate(accs, axis=1).astype(
                    xg_ref.dtype
                ) if len(accs) > 1 else accs[0].astype(xg_ref.dtype)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += _accumulate_step(
            xg_ref[j], packed_ref, alpha_ref, mu_ref, bps, bs, a8, None,
        )

    return _kernel


def _igather_vmem_estimate(tn, bps, bs, Bp, D, K):
    base = _vmem_estimate(tn, bps, bs, Bp)
    xfull = Bp * D * 2
    xg = Bp * K * 2
    # Windowed prologue (_gather_win): compare plane + one-hot + acc per
    # <=4096-lane window. Charged at HALF size: the prologue runs once at
    # step (0,0) and its buffers largely time-share the per-step unpack
    # temps already counted in ``base`` (charging the full window pushed
    # qkv from bps=16 to 8 for temps that never coexist).
    W = 4096
    iota_temps = (2 * 128 * W * 4 + Bp * W * 4) // 2
    return base + xfull + xg + iota_temps


def _pick_tiles_igather(n, nb, bs, Bp, D, want_tn, want_bps):
    budget = 12 * 1024 * 1024
    tn = _pick_tile_n(n, min(want_tn, n))
    tn_divisors = sorted(
        (d for d in range(128, n + 1, 128) if n % d == 0), reverse=True
    )
    bps_all = sorted(
        {b for b in range(8, nb + 1, 8) if nb % b == 0} | {nb}, reverse=True
    )
    bps = max((b for b in bps_all if b <= max(want_bps, 8)), default=nb)
    K = nb * bs
    while _igather_vmem_estimate(tn, bps, bs, Bp, D, K) > budget:
        smaller_bps = [b for b in bps_all if b < bps]
        if smaller_bps:
            bps = smaller_bps[0]
            continue
        smaller_tn = [d for d in tn_divisors if d < tn]
        if smaller_tn:
            tn = smaller_tn[0]
            continue
        break
    return tn, bps


@functools.partial(
    jax.jit, static_argnames=("block_size", "tile_n", "blocks_per_step", "a8")
)
def ternary_matmul_pallas_igathered(
    x: jax.Array,  # (B, m) UN-gathered activations
    perm: jax.Array,  # (K,) int32 visit lane -> original feature
    packed: jax.Array,  # (K//4, n)
    alpha: jax.Array,
    mu: jax.Array,
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
) -> jax.Array:
    """out = gather(x)[perm] @ dequant(packed) in one pallas call."""
    K4, n = packed.shape
    K = K4 * 4
    nb = alpha.shape[0]
    bs = block_size
    if bs % 128 != 0 or nb * bs != K or n % 128 != 0:
        raise ValueError(f"bad shapes: packed {packed.shape}, bs {bs}")
    B, m = x.shape
    D = -(-m // 128) * 128
    if D != m:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    tb = min(max(16, -(-B // 16) * 16), 64)  # decode rows only
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)  # absmax is permutation-invariant
    else:
        x = x.astype(
            jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype
        )
    tn, bps = _pick_tiles_igather(n, nb, bs, tb, D, tile_n, blocks_per_step)
    nj = nb // bps

    out = pl.pallas_call(
        _make_igather_kernel(bps, bs, nj, a8),
        grid=(Bp // tb, n // tn, nj),
        in_specs=[
            pl.BlockSpec((tb, D), lambda b, i, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps * (bs // 4), tn), lambda b, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, i, j: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (nj, tb, bps * bs),
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
        ],
    )(x, perm.reshape(1, K).astype(jnp.int32), packed, alpha, mu)
    if a8:
        out = out * sx
    return out[:B]


@functools.partial(
    jax.jit, static_argnames=("block_size", "tile_n", "blocks_per_step", "a8")
)
def ternary_matmul_pallas_igathered_stacked(
    x: jax.Array,  # (B, m)
    perm: jax.Array,  # (L, K)
    packed: jax.Array,  # (L, K//4, n)
    alpha: jax.Array,  # (L, nb, n)
    mu: jax.Array,
    layer_idx: jax.Array,
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
) -> jax.Array:
    """Scan-over-layers fused iota-gather + matmul (scalar prefetch)."""
    L, K4, n = packed.shape
    K = K4 * 4
    nb = alpha.shape[1]
    bs = block_size
    if bs % 128 != 0 or nb * bs != K or n % 128 != 0:
        raise ValueError(f"bad shapes: packed {packed.shape}, bs {bs}")
    B, m = x.shape
    D = -(-m // 128) * 128
    if D != m:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    tb = min(max(16, -(-B // 16) * 16), 64)
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)
    else:
        x = x.astype(
            jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype
        )
    tn, bps = _pick_tiles_igather(n, nb, bs, tb, D, tile_n, blocks_per_step)
    nj = nb // bps

    inner = _make_igather_kernel(bps, bs, nj, a8)

    def kernel_wrap(idx_ref, x_ref, perm_ref, packed_ref, alpha_ref,
                    mu_ref, o_ref, xg_ref):
        del idx_ref
        inner(x_ref, perm_ref.at[0], packed_ref.at[0], alpha_ref.at[0],
              mu_ref.at[0], o_ref, xg_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, n // tn, nj),
        in_specs=[
            pl.BlockSpec((tb, D), lambda b, i, j, li: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b, i, j, li: (li[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bps * (bs // 4), tn),
                         lambda b, i, j, li: (li[0], j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bps, tn), lambda b, i, j, li: (li[0], j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bps, tn), lambda b, i, j, li: (li[0], j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, i, j, li: (b, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (nj, tb, bps * bs),
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
        ],
    )
    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x,
      perm.reshape(L, 1, K).astype(jnp.int32), packed, alpha, mu)
    if a8:
        out = out * sx
    return out[:B]


# ---------------------------------------------------------------------------
# Fused MLP megakernel: gather -> gateup -> act*mul -> down in ONE pallas call.
# ---------------------------------------------------------------------------
#
# Decode at 7B runs 6 pallas calls per layer (iota gather + matmul for each
# of qkv/o/gateup, plus down); the chained per-call rate (320-414 GB/s,
# RESULTS.md round 1) sits well below the single-call steady state
# (523 GB/s) — inter-call pipeline drains, output round trips, and fixed
# call overhead eat the difference. The MLP half fuses completely because
# down's input is ELEMENTWISE in the feature dim: one k-block of down's
# visit-ordered input ``mid`` needs only the matching 128-column block of
# (folded) gate/up outputs. So one kernel sweeps down's valid k-blocks:
#
#   per grid step k:   gate_k = xg @ dequant(GU[:, gate cols of block k])
#                      up_k   = xg @ dequant(GU[:, up cols of block k])
#                      mid_k  = act(gate_k) * up_k          (f32, in VMEM)
#                      o     += mid_k @ dequant(DN[block k])
#
# with xg (the SSR-gathered activations) computed once on k == 0 by the
# iota one-hot prologue (pallas_gather.py rationale) into a VMEM scratch.
# The (B, 2I) gateup output and (B, I) mid NEVER touch HBM, and the output
# tile is revisited on CONSECUTIVE grid steps only — the safe accumulation
# pattern (unlike the retired gathered-kernel's i-innermost scratch RMW,
# see _make_gather_kernel's docstring).
#
# Exactness: gate/up/mid stay f32 in VMEM (the two-call path rounds mid
# through bf16 in HBM), codes x alpha are exact in bf16, so the fused path
# is s trictly more precise than the sequence it replaces. Down's pad
# blocks (alpha = mu = 0) are simply never visited: their contribution is
# zero by construction, and skipping them skips their DMA too.


def _act_fn(act: str):
    if act == "silu":
        return jax.nn.silu
    if act == "gelu":
        return jax.nn.gelu
    if act == "relu":
        return lambda v: jnp.maximum(v, 0.0)
    raise ValueError(f"unsupported fused-MLP activation {act!r}")


def _gather_win(Kg: int) -> int:
    """Output-lane window for the iota prologue: bounds the (128, W)
    compare-plane temporaries (a full-Kg plane stack blew the 16 MB scoped
    VMEM at K=12288 — Mosaic does not fully reuse unrolled-loop buffers).
    Prefer the widest window <= 4096: wider one-hot dots fill the MXU
    better ((16,128)x(128,4096) vs 4x (..x1024)) at ~3.5 MB of temps."""
    for w in (4096, 2048, 1024, 512, 256, 128):
        if Kg % w == 0:
            return w
    return Kg


def _gather_iota_prologue(x_ref, perm_ref, xg_ref):
    """xg[b, l] = x[b, perm[l]] with the one-hot generated in-kernel from
    the (1, Kg) index row (pallas_gather._make_iota_kernel). Pad lanes
    (perm == m, out of [p*128, p*128+128)) match no row -> exact zero.
    Windowed over output lanes to bound compare-plane temporaries."""
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B, D = x_ref.shape
    Kg = xg_ref.shape[-1]
    xs = x_ref[:].astype(cdt)
    W = _gather_win(Kg)
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
    for jw in range(Kg // W):
        idx_w = perm_ref[:, jw * W : (jw + 1) * W]  # (1, W)
        acc = jnp.zeros((B, W), jnp.float32)
        for p in range(D // 128):
            u = (rows == idx_w - p * 128).astype(cdt)
            acc += jnp.dot(
                xs[:, p * 128 : (p + 1) * 128], u,
                preferred_element_type=jnp.float32,
            )
        xg_ref[:, jw * W : (jw + 1) * W] = acc.astype(xg_ref.dtype)


def _make_mlp_kernel(nbg: int, bs: int, bps_d: int, act: str,
                     has_gather: bool, gated: bool, a8mode=False):
    act_fn = _act_fn(act)
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def _kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        perm_ref = next(it) if has_gather else None
        gug_ref = next(it)
        guu_ref = next(it) if gated else None
        gag_ref, gmg_ref = next(it), next(it)
        gau_ref, gmu_ref = (next(it), next(it)) if gated else (None, None)
        dnp_ref, dna_ref, dnm_ref = next(it), next(it), next(it)
        o_ref = next(it)
        xg_ref = next(it)

        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            if has_gather:
                _gather_iota_prologue(x_ref, perm_ref, xg_ref)
            else:
                xg_ref[:] = x_ref[:].astype(xg_ref.dtype)
            o_ref[:] = jnp.zeros_like(o_ref)

        xg = xg_ref[:]
        gate = _accumulate_step(xg, gug_ref, gag_ref, gmg_ref,
                                nbg, bs, a8mode, None)
        if gated:
            up = _accumulate_step(xg, guu_ref, gau_ref, gmu_ref,
                                  nbg, bs, a8mode, None)
            mid = act_fn(gate) * up
        else:
            mid = act_fn(gate)
        if bps_d % 8 == 0:
            dna, dnm = dna_ref, dnm_ref
        else:
            # dn scales arrive as (8, n) superblocks (Mosaic needs sublane
            # block dims divisible by 8); extract this step's bps_d rows
            # with an exact one-hot dot. bps_d divides 8, so the window
            # [lo, lo + bps_d) never crosses the superblock boundary.
            lo = (k * bps_d) % 8
            rsel = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
            csel = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
            E = (csel == rsel + lo).astype(cdt)
            dna = jnp.dot(E, dna_ref[:].astype(cdt),
                          preferred_element_type=jnp.float32)
            dnm = jnp.dot(E, dnm_ref[:].astype(cdt),
                          preferred_element_type=jnp.float32)
            dna = dna[:bps_d].astype(dna_ref.dtype)  # one-hot pick: exact
            dnm = dnm[:bps_d].astype(dnm_ref.dtype)
        o_ref[:] += _accumulate_step(mid.astype(cdt), dnp_ref, dna,
                                     dnm, bps_d, bs, a8mode, None)

    return _kernel


def _mlp_vmem_estimate(tb, D, Kg, nbg, bs, bps_d, n):
    bs4 = bs // 4
    tn_g = bps_d * bs
    x = tb * D * 2
    xg = tb * Kg * 2
    gu = (2 * 2 * (Kg // 4) * tn_g) + (4 * 2 * 2 * nbg * tn_g * 2)
    dn = 2 * bps_d * bs4 * n + 2 * 2 * bps_d * n * 2
    out = tb * n * 4
    # unpack temps are dominated by down's (4 int32 plane tiles + bf16
    # code tile) plus the gather prologue's (windowed) compare plane
    temps = 4 * bs4 * n * 4 + bs * n * 2 + 128 * 4096 * 2 + 3 * tb * n * 4
    return x + xg + gu + dn + out + temps


def _pick_bps_mlp(nv, tb, D, Kg, nbg, bs, n, want=8):
    # Slightly past the shared 12 MB heuristic: the estimate double-counts
    # prologue-vs-steady-state temps that time-share in practice, and the
    # wide (bps_d=8) grid measured level with two-call only at tn_g=1024.
    # Hardware overflow is caught by verify_fused_mlp -> two-call fallback.
    budget = int(13.5 * 1024 * 1024)
    # Mosaic sublane rule: the dn-scale window must either BE the (8, n)
    # superblock stride (bps_d % 8 == 0) or sit inside one (8 % bps_d == 0).
    cands = sorted((b for b in range(1, nv + 1)
                    if nv % b == 0 and (b % 8 == 0 or 8 % b == 0)),
                   reverse=True)
    ok = [b for b in cands
          if b <= want and _mlp_vmem_estimate(tb, D, Kg, nbg, bs, b, n) <= budget]
    if ok:
        return ok[0]
    fit = [b for b in cands
           if _mlp_vmem_estimate(tb, D, Kg, nbg, bs, b, n) <= budget]
    return fit[0] if fit else 1


def _mlp_common(x, gu_packed, gu_alpha, dn_packed, dn_alpha,
                block_size, intermediate):
    """Shared shape validation; returns (gated, Kg, n, nbg, half, nv).

    ``half`` is the stored gate-half width: >= intermediate when the
    producer was padded to an 8-block multiple by
    quant.fold.pad_gateup_blocks (pad columns carry zero scales, so the
    sweep may include them exactly). The grid visits nv = half // bs
    k-blocks; down must have scale rows through the superblock bound."""
    Kg4, gu_n = gu_packed.shape[-2], gu_packed.shape[-1]
    Kg = Kg4 * 4
    nbg = gu_alpha.shape[-2]
    Kd4, n = dn_packed.shape[-2], dn_packed.shape[-1]
    nbd = dn_alpha.shape[-2]
    bs = block_size
    I = intermediate
    if gu_n >= 2 * I and gu_n % (2 * bs) == 0:
        gated = True
        half = gu_n // 2
    elif gu_n >= I and gu_n % bs == 0:
        gated = False
        half = gu_n
    else:
        raise ValueError(f"gateup width {gu_n} vs intermediate {I}")
    if bs % 128 != 0 or nbg * bs != Kg or nbd * bs != Kd4 * 4:
        raise ValueError(
            f"bad shapes: gu {gu_packed.shape}, dn {dn_packed.shape}, bs {bs}"
        )
    if I % bs != 0:
        raise ValueError(f"intermediate {I} not a multiple of block {bs}")
    nv = half // bs  # swept k-blocks (pad blocks are zero-scaled: exact)
    if nv > nbd:
        raise ValueError(f"gate-half blocks {nv} exceed down blocks {nbd}")
    if -(-nv // 8) * 8 > nbd:
        # the (8, n) scale superblock of the last visited step must exist
        raise ValueError(
            f"down scale rows {nbd} < {-(-nv // 8) * 8} (superblock bound)"
        )
    if n % 128 != 0:
        raise ValueError(f"out_features {n} must be a multiple of 128")
    return gated, Kg, n, nbg, half, nv


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "act", "intermediate", "blocks_per_step", "a8"
    ),
)
def ternary_mlp_pallas(
    x: jax.Array,  # (B, m) UN-gathered post-norm hidden
    gu_perm: Optional[jax.Array],  # (Kg,) int32 visit perm, or None
    gu_packed: jax.Array,  # (Kg//4, 2I) [gate@sigma | up@sigma] (fold.py)
    gu_alpha: jax.Array,  # (nbg, 2I)
    gu_mu: jax.Array,
    dn_packed: jax.Array,  # (Kd//4, n), Kd >= I (pad blocks zero-scaled)
    dn_alpha: jax.Array,  # (nbd, n)
    dn_mu: jax.Array,
    *,
    block_size: int = 128,
    act: str = "silu",
    intermediate: int,
    blocks_per_step: int = 0,  # 0 = auto
    a8=False,  # only "floor" is meaningful here (floor8 probe); the
    # production W2A8 path keeps the MLP megakernel's bf16 telescoped dots
) -> jax.Array:
    """Whole ternary MLP in one pallas call: returns (B, n) f32."""
    gated, Kg, n, nbg, half, nv = _mlp_common(
        x, gu_packed, gu_alpha, dn_packed, dn_alpha, block_size, intermediate
    )
    bs = block_size
    bs4 = bs // 4
    I = intermediate
    B, m = x.shape
    has_gather = gu_perm is not None
    # With a gather, D only needs 128-alignment (pad perm lanes match
    # nothing); the identity path pads x straight to the Kg lane count
    # (identity perms put every pad lane at the zero slot).
    D = -(-m // 128) * 128 if has_gather else Kg
    if D < m:
        raise ValueError(f"x width {m} exceeds lane count {Kg}")
    if D != m:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    tb = min(max(16, -(-B // 16) * 16), 64)
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    x = x.astype(jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype)
    bps_d = blocks_per_step or _pick_bps_mlp(nv, tb, D, Kg, nbg, bs, n)
    if nv % bps_d != 0:
        raise ValueError(f"blocks_per_step {bps_d} must divide {nv}")
    tn_g = bps_d * bs
    up_off = half // tn_g  # up half starts this many tn_g-blocks in

    specs = [pl.BlockSpec((tb, D), lambda b, k: (b, 0),
                          memory_space=pltpu.VMEM)]
    args = [x]
    if has_gather:
        specs.append(pl.BlockSpec((1, Kg), lambda b, k: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(gu_perm.reshape(1, Kg).astype(jnp.int32))
    # gate (and up) column blocks of the SAME packed/scale arrays, selected
    # by two index maps — no host-side split copies.
    specs.append(pl.BlockSpec((Kg // 4, tn_g), lambda b, k: (0, k),
                              memory_space=pltpu.VMEM))
    args.append(gu_packed)
    if gated:
        specs.append(pl.BlockSpec(
            (Kg // 4, tn_g), lambda b, k: (0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_packed)
    specs.append(pl.BlockSpec((nbg, tn_g), lambda b, k: (0, k),
                              memory_space=pltpu.VMEM))
    args.append(gu_alpha)
    specs.append(pl.BlockSpec((nbg, tn_g), lambda b, k: (0, k),
                              memory_space=pltpu.VMEM))
    args.append(gu_mu)
    if gated:
        specs.append(pl.BlockSpec(
            (nbg, tn_g), lambda b, k: (0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_alpha)
        specs.append(pl.BlockSpec(
            (nbg, tn_g), lambda b, k: (0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_mu)
    specs.append(pl.BlockSpec((bps_d * bs4, n), lambda b, k: (k, 0),
                              memory_space=pltpu.VMEM))
    args.append(dn_packed)
    # (sb, n) superblocks: when bps_d < 8 the kernel one-hot-extracts rows
    # [k*bps_d % 8, +bps_d) (Mosaic sublane block-dim rule).
    sb = max(8, bps_d)
    specs.append(pl.BlockSpec((sb, n), lambda b, k: ((k * bps_d) // sb, 0),
                              memory_space=pltpu.VMEM))
    args.append(dn_alpha)
    specs.append(pl.BlockSpec((sb, n), lambda b, k: ((k * bps_d) // sb, 0),
                              memory_space=pltpu.VMEM))
    args.append(dn_mu)

    out = pl.pallas_call(
        _make_mlp_kernel(nbg, bs, bps_d, act, has_gather, gated, a8),
        grid=(Bp // tb, nv // bps_d),
        in_specs=specs,
        out_specs=pl.BlockSpec((tb, n), lambda b, k: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (tb, Kg),
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
        ],
    )(*args)
    return out[:B]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "act", "intermediate", "blocks_per_step", "a8"
    ),
)
def ternary_mlp_pallas_stacked(
    x: jax.Array,  # (B, m)
    gu_perm: Optional[jax.Array],  # (L, Kg) or None
    gu_packed: jax.Array,  # (L, Kg//4, 2I)
    gu_alpha: jax.Array,  # (L, nbg, 2I)
    gu_mu: jax.Array,
    dn_packed: jax.Array,  # (L, Kd//4, n)
    dn_alpha: jax.Array,  # (L, nbd, n)
    dn_mu: jax.Array,
    layer_idx: jax.Array,
    *,
    block_size: int = 128,
    act: str = "silu",
    intermediate: int,
    blocks_per_step: int = 0,
    a8=False,  # "floor" = floor8 probe (see ternary_mlp_pallas)
) -> jax.Array:
    """Scan-over-layers fused MLP: scalar-prefetched layer index, whole
    stacked arrays (ternary_matmul_pallas_stacked rationale)."""
    gated, Kg, n, nbg, half, nv = _mlp_common(
        x, gu_packed, gu_alpha, dn_packed, dn_alpha, block_size, intermediate
    )
    bs = block_size
    bs4 = bs // 4
    I = intermediate
    B, m = x.shape
    has_gather = gu_perm is not None
    # With a gather, D only needs 128-alignment (pad perm lanes match
    # nothing); the identity path pads x straight to the Kg lane count
    # (identity perms put every pad lane at the zero slot).
    D = -(-m // 128) * 128 if has_gather else Kg
    if D < m:
        raise ValueError(f"x width {m} exceeds lane count {Kg}")
    if D != m:
        x = jnp.pad(x, ((0, 0), (0, D - m)))
    tb = min(max(16, -(-B // 16) * 16), 64)
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    x = x.astype(jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype)
    bps_d = blocks_per_step or _pick_bps_mlp(nv, tb, D, Kg, nbg, bs, n)
    if nv % bps_d != 0:
        raise ValueError(f"blocks_per_step {bps_d} must divide {nv}")
    tn_g = bps_d * bs
    up_off = half // tn_g

    specs = [pl.BlockSpec((tb, D), lambda b, k, li: (b, 0),
                          memory_space=pltpu.VMEM)]
    args = [x]
    if has_gather:
        L = gu_perm.shape[0]
        specs.append(pl.BlockSpec(
            (1, 1, Kg), lambda b, k, li: (li[0], 0, 0),
            memory_space=pltpu.VMEM))
        args.append(gu_perm.reshape(L, 1, Kg).astype(jnp.int32))
    specs.append(pl.BlockSpec(
        (1, Kg // 4, tn_g), lambda b, k, li: (li[0], 0, k),
        memory_space=pltpu.VMEM))
    args.append(gu_packed)
    if gated:
        specs.append(pl.BlockSpec(
            (1, Kg // 4, tn_g), lambda b, k, li: (li[0], 0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_packed)
    specs.append(pl.BlockSpec(
        (1, nbg, tn_g), lambda b, k, li: (li[0], 0, k),
        memory_space=pltpu.VMEM))
    args.append(gu_alpha)
    specs.append(pl.BlockSpec(
        (1, nbg, tn_g), lambda b, k, li: (li[0], 0, k),
        memory_space=pltpu.VMEM))
    args.append(gu_mu)
    if gated:
        specs.append(pl.BlockSpec(
            (1, nbg, tn_g), lambda b, k, li: (li[0], 0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_alpha)
        specs.append(pl.BlockSpec(
            (1, nbg, tn_g), lambda b, k, li: (li[0], 0, k + up_off),
            memory_space=pltpu.VMEM))
        args.append(gu_mu)
    specs.append(pl.BlockSpec(
        (1, bps_d * bs4, n), lambda b, k, li: (li[0], k, 0),
        memory_space=pltpu.VMEM))
    args.append(dn_packed)
    sb = max(8, bps_d)
    specs.append(pl.BlockSpec(
        (1, sb, n), lambda b, k, li: (li[0], (k * bps_d) // sb, 0),
        memory_space=pltpu.VMEM))
    args.append(dn_alpha)
    specs.append(pl.BlockSpec(
        (1, sb, n), lambda b, k, li: (li[0], (k * bps_d) // sb, 0),
        memory_space=pltpu.VMEM))
    args.append(dn_mu)

    inner = _make_mlp_kernel(nbg, bs, bps_d, act, has_gather, gated, a8)
    n_in = len(args)

    def kernel_wrap(idx_ref, *refs):
        del idx_ref
        ins, outs = refs[:n_in], refs[n_in:]
        # every operand after x carries a leading size-1 layer dim (the
        # perm row becomes (1, Kg) again); view it away for the inner kernel.
        ins = (ins[0],) + tuple(r.at[0] for r in ins[1:])
        inner(*ins, *outs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, nv // bps_d),
        in_specs=specs,
        out_specs=pl.BlockSpec((tb, n), lambda b, k, li: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (tb, Kg),
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32,
            ),
        ],
    )
    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)
    return out[:B]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "tile_n", "blocks_per_step", "a8", "_telescope"
    ),
)
def ternary_matmul_pallas(
    x: jax.Array,
    packed: jax.Array,
    alpha: jax.Array,
    mu: jax.Array,
    *,
    block_size: int = 128,
    tile_n: int = 4096,
    blocks_per_step: int = 16,
    a8: bool = False,
    _telescope=None,
) -> jax.Array:
    """out = x @ dequant(packed, alpha, mu); (B, K) x (K//4, n) -> (B, n) f32.

    Constraints (asserted): block_size % 128 == 0, K % block_size == 0,
    n % 128 == 0. B is padded to the bf16 sublane tile (16) internally.
    tile_n / blocks_per_step are clamped to divisors of n / nb.
    """
    K4, n = packed.shape
    K = K4 * 4
    nb, n2 = alpha.shape
    bs = block_size
    if bs % 128 != 0 or K % bs != 0 or nb * bs != K or n2 != n:
        raise ValueError(
            f"bad shapes: packed {packed.shape}, alpha {alpha.shape}, bs {bs}"
        )
    if n % 128 != 0:
        raise ValueError(f"out_features {n} must be a multiple of 128")
    B = x.shape[0]
    # Batch rows are tiled too (prefill/eval run thousands of rows; an
    # all-rows output tile would blow VMEM). tb caps the row tile at 256.
    tb = min(max(16, -(-B // 16) * 16), 256)
    Bp = -(-B // tb) * tb
    tn, bps = _pick_tiles(n, nb, bs, tb, tile_n, blocks_per_step)
    bs4 = bs // 4
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if a8:
        x, sx = normalize_rows_a8(x)
    else:
        x = x.astype(jnp.bfloat16)

    grid = (Bp // tb, n // tn, nb // bps)
    out = pl.pallas_call(
        _make_kernel(bps, bs, a8, telescope=_telescope),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, bps * bs), lambda b, i, j: (b, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bps * bs4, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * n,
            bytes_accessed=(Bp // tb) * K4 * n + Bp * K * 2 * (n // tn)
            + 2 * nb * n * 2 + Bp * n * 4,
            transcendentals=0,
        ),
    )(x, packed, alpha, mu)
    if a8:
        out = out * sx
    return out[:B]
