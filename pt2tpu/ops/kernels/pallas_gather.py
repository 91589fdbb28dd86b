"""Packed one-hot gather — MXU permutation of activation features.

SSR reorders weight columns per projection (quant/gptq.py), so inference
must present activations in visit-lane order. A lane-wise ``jnp.take`` on
TPU serializes into VPU shuffles (~40 us for a (1, 4096) gather — measured
dominating real-SSR decode at ~170 us/layer). The TPU-native move is to
express the permutation as a matmul against a one-hot matrix stored in the
same 2-bit plane format as the weights:

    out[b, k] = sum_i x[b, i] * G[i, k],   G[i, k] = 1  iff  perm[k] == i

G streams at 0.25 B/entry (4 MB for a 4096->4096 permutation ~= 5 us at HBM
rate) and the contraction runs on the MXU. Values are {0, 1}, so bf16
inputs pass through *exactly* — unlike routing the gather through the
scaled ternary kernel, whose bf16 mu-offset rounding would perturb the
result.

Pad / invalid lanes (perm[k] == in_features, quant/gptq.py lane pads) get
an all-zero column, reproducing ``apply_input_perm``'s zero-slot semantics
bit-exactly.

The reference never faces this problem: it gathers activations eagerly per
forward and re-materializes fp16 weights (ref model.py:84-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ternary import _pick_tile_n

__all__ = [
    "onehot_matmul_pallas",
    "onehot_matmul_pallas_stacked",
    "onehot_iota_pallas",
    "onehot_iota_pallas_stacked",
]

_BS = 128  # pack-layout granularity (no scale semantics here)


def _vmem_estimate(tn: int, bps: int, Bp: int) -> int:
    bs4 = _BS // 4
    packed2 = 2 * bps * bs4 * tn  # int8 x double buffer
    x2 = 2 * Bp * bps * _BS * 2
    out = 2 * Bp * tn * 4
    temps = _BS * tn * 2 + 4 * bs4 * tn * 4 + Bp * tn * 4
    return packed2 + x2 + out + temps


def _pick_tiles(K: int, nb: int, Bp: int, want_tn: int, want_bps: int):
    budget = 12 * 1024 * 1024
    tn = _pick_tile_n(K, min(want_tn, K))
    tn_divisors = sorted(
        (d for d in range(128, K + 1, 128) if K % d == 0), reverse=True
    )

    def bps_candidates():
        c = [b for b in range(8, nb + 1, 8) if nb % b == 0]
        if nb not in c:
            c.append(nb)
        return sorted(c, reverse=True)

    bps = max((b for b in bps_candidates() if b <= max(want_bps, 8)), default=nb)
    while _vmem_estimate(tn, bps, Bp) > budget:
        smaller_bps = [b for b in bps_candidates() if b < bps]
        if smaller_bps:
            bps = smaller_bps[0]
            continue
        smaller_tn = [d for d in tn_divisors if d < tn]
        if smaller_tn:
            tn = smaller_tn[0]
            continue
        break
    return tn, bps


def _make_kernel(bps: int):
    bs4 = _BS // 4

    def _kernel(x_ref, packed_ref, o_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        xs = x_ref[:].astype(cdt)  # (B, bps*BS)
        acc = jnp.zeros_like(o_ref)
        for p in range(bps):  # static unroll, compile-time aligned slices
            pk = packed_ref[p * bs4 : (p + 1) * bs4, :].astype(jnp.int32)
            planes = [((pk >> (2 * q)) & 3) for q in range(4)]
            u = jnp.concatenate(planes, axis=0).astype(cdt)  # (BS, TN) {0,1}
            xb = xs[:, p * _BS : (p + 1) * _BS]
            acc += jnp.dot(xb, u, preferred_element_type=jnp.float32)
        o_ref[:] += acc

    return _kernel


def _prep(x: jax.Array, D: int):
    """Pad batch rows to the bf16 sublane tile and features to D.

    bf16 only on real TPU (MXU path; decode inputs are already bf16 so the
    cast is a no-op and the one-hot product stays exact). Interpret mode /
    CPU keeps f32 so the gather is bit-exact there too.
    """
    B, m = x.shape
    tb = min(max(16, -(-B // 16) * 16), 256)
    Bp = -(-B // tb) * tb
    pad_b = Bp - B
    pad_f = D - m
    if pad_b or pad_f:
        x = jnp.pad(x, ((0, pad_b), (0, pad_f)))
    if jax.default_backend() == "tpu":
        x = x.astype(jnp.bfloat16)
    return x, B, Bp, tb


@functools.partial(jax.jit, static_argnames=("tile_n", "blocks_per_step"))
def onehot_matmul_pallas(
    x: jax.Array,  # (B, m) activations, m <= D (zero-padded to D)
    packed: jax.Array,  # (D//4, K) int8 2-bit one-hot planes
    *,
    tile_n: int = 2048,
    blocks_per_step: int = 16,
) -> jax.Array:
    """out[b, k] = x[b, perm[k]] via packed one-hot matmul. Returns (B, K) f32."""
    D4, K = packed.shape
    D = D4 * 4
    if D % _BS != 0 or K % 128 != 0:
        raise ValueError(f"bad one-hot shapes: packed {packed.shape}")
    x, B, Bp, tb = _prep(x, D)
    nb = D // _BS
    tn, bps = _pick_tiles(K, nb, tb, tile_n, blocks_per_step)
    bs4 = _BS // 4

    grid = (Bp // tb, K // tn, nb // bps)
    out = pl.pallas_call(
        _make_kernel(bps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, bps * _BS), lambda b, i, j: (b, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bps * bs4, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * D * K,
            bytes_accessed=(Bp // tb) * D4 * K
            + Bp * D * 2 * (K // tn)
            + Bp * K * 4,
            transcendentals=0,
        ),
    )(x, packed)
    return out[:B]


def _make_iota_kernel(bps: int):
    """One-hot generated IN-KERNEL from the index vector: G_p[r, k] =
    (r == perm[k] - base_row). Replaces the 0.25 B/entry packed-plane stream
    (4 MB per 4096->4096 gather) with a (1, tn) int32 index tile (~4 KB per
    output tile) — the decode budget measured SSR gathers at 1.25 ms of a
    6.64 ms token (19%), the single largest non-projection term, and the
    packed kernel is partly DMA-bound. Per plane this costs one compare +
    one select-cast over (128, tn) (the row-iota hoists out of the p loop;
    the base-row shift is a (1, tn) subtract on the index side), vs
    shift+mask+concat+cast on the packed path. Exact: one-hot {0, 1} rows
    pass bf16 x through unchanged; pad lanes (perm == in_features >= D or a
    zero-padded x column) produce all-zero columns, matching
    apply_input_perm's zero-slot semantics."""

    def _kernel(x_ref, idx_ref, o_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        xs = x_ref[:].astype(cdt)  # (B, bps*BS)
        tn = idx_ref.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (_BS, tn), 0)
        base = j * (bps * _BS)
        acc = jnp.zeros_like(o_ref)
        for p in range(bps):  # static unroll
            idx_local = idx_ref[:] - (base + p * _BS)  # (1, tn)
            u = (rows == idx_local).astype(cdt)  # (BS, tn) {0,1}
            xb = xs[:, p * _BS : (p + 1) * _BS]
            acc += jnp.dot(xb, u, preferred_element_type=jnp.float32)
        o_ref[:] += acc

    return _kernel


def _iota_vmem_estimate(tn: int, bps: int, Bp: int) -> int:
    x2 = 2 * Bp * bps * _BS * 2
    out = 2 * Bp * tn * 4
    temps = 3 * _BS * tn * 4 + Bp * tn * 4  # iota + cmp + bf16 plane
    return x2 + out + temps + 2 * tn * 4


def _pick_tiles_iota(K: int, nb: int, Bp: int, want_tn: int, want_bps: int):
    budget = 12 * 1024 * 1024
    tn = _pick_tile_n(K, min(want_tn, K))
    tn_divisors = sorted(
        (d for d in range(128, K + 1, 128) if K % d == 0), reverse=True
    )
    bps_all = sorted(
        {b for b in range(8, nb + 1, 8) if nb % b == 0} | {nb}, reverse=True
    )
    bps = max((b for b in bps_all if b <= max(want_bps, 8)), default=nb)
    while _iota_vmem_estimate(tn, bps, Bp) > budget:
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


@functools.partial(jax.jit, static_argnames=("D", "tile_n", "blocks_per_step"))
def onehot_iota_pallas(
    x: jax.Array,  # (B, m) activations, m <= D (zero-padded to D)
    perm: jax.Array,  # (K,) int32 visit lane -> original feature
    *,
    D: int,  # padded feature count (multiple of 128)
    tile_n: int = 2048,
    blocks_per_step: int = 16,
) -> jax.Array:
    """out[b, k] = x[b, perm[k]] with the one-hot generated in-kernel."""
    (K,) = perm.shape
    if D % _BS != 0 or K % 128 != 0:
        raise ValueError(f"bad gather dims: D={D}, K={K}")
    x, B, Bp, tb = _prep(x, D)
    nb = D // _BS
    tn, bps = _pick_tiles_iota(K, nb, tb, tile_n, blocks_per_step)

    grid = (Bp // tb, K // tn, nb // bps)
    out = pl.pallas_call(
        _make_iota_kernel(bps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, bps * _BS), lambda b, i, j: (b, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tn), lambda b, i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
    )(x, perm.reshape(1, K).astype(jnp.int32))
    return out[:B]


@functools.partial(jax.jit, static_argnames=("D", "tile_n", "blocks_per_step"))
def onehot_iota_pallas_stacked(
    x: jax.Array,  # (B, m)
    perm: jax.Array,  # (L, K) int32 — ALL layers' perms, unsliced
    layer_idx: jax.Array,  # scalar int32
    *,
    D: int,
    tile_n: int = 2048,
    blocks_per_step: int = 16,
) -> jax.Array:
    """Layer-indexed iota gather for scan-over-layers decode loops."""
    L, K = perm.shape
    if D % _BS != 0 or K % 128 != 0:
        raise ValueError(f"bad gather dims: D={D}, K={K}")
    x, B, Bp, tb = _prep(x, D)
    nb = D // _BS
    tn, bps = _pick_tiles_iota(K, nb, tb, tile_n, blocks_per_step)

    inner = _make_iota_kernel(bps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, K // tn, nb // bps),
        in_specs=[
            pl.BlockSpec(
                (tb, bps * _BS),
                lambda b, i, j, li: (b, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tn),
                lambda b, i, j, li: (li[0], 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j, li: (b, i), memory_space=pltpu.VMEM
        ),
    )

    def kernel_wrap(idx_ref, x_ref, perm_ref, o_ref):
        del idx_ref
        inner(x_ref, perm_ref.at[0], o_ref)

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x,
        perm.reshape(L, 1, K).astype(jnp.int32),
    )
    return out[:B]


@functools.partial(jax.jit, static_argnames=("tile_n", "blocks_per_step"))
def onehot_matmul_pallas_stacked(
    x: jax.Array,  # (B, m)
    packed: jax.Array,  # (L, D//4, K) — ALL layers' planes, unsliced
    layer_idx: jax.Array,  # scalar int32
    *,
    tile_n: int = 2048,
    blocks_per_step: int = 16,
) -> jax.Array:
    """Layer-indexed variant for scan-over-layers decode loops (the stacked
    operand stays whole; scalar-prefetched index maps select the layer —
    same rationale as ``ternary_matmul_pallas_stacked``)."""
    L, D4, K = packed.shape
    D = D4 * 4
    if D % _BS != 0 or K % 128 != 0:
        raise ValueError(f"bad one-hot shapes: packed {packed.shape}")
    x, B, Bp, tb = _prep(x, D)
    nb = D // _BS
    tn, bps = _pick_tiles(K, nb, tb, tile_n, blocks_per_step)
    bs4 = _BS // 4

    inner = _make_kernel(bps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb, K // tn, nb // bps),
        in_specs=[
            pl.BlockSpec(
                (tb, bps * _BS), lambda b, i, j, li: (b, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bps * bs4, tn),
                lambda b, i, j, li: (li[0], j, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, tn), lambda b, i, j, li: (b, i), memory_space=pltpu.VMEM
        ),
    )

    def kernel_wrap(idx_ref, x_ref, packed_ref, o_ref):
        del idx_ref
        inner(x_ref, packed_ref.at[0], o_ref)

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, packed)
    return out[:B]
