"""Decode-attention kernel: one query token against the KV cache, in the
cache's NATIVE (B, M, Hkv, hd) layout, consuming int8 KV directly.

Why (RESULTS.md round 4, SURVEY.md §7 step 6): at the serving operating
points (batch 8 / prompt 512+) attention+KV is 28-40% of the decode step
and the KV stream is the dominant HBM traffic (5.4 GB/step at batch 8 —
3x the packed weights). The XLA path streams bf16 KV at ~440-520 GB/s,
but int8 KV only reaches ~250 GB/s of (half-sized) traffic — the
int8->bf16 convert + scale application materializes through HBM, wasting
the entire byte advantage. Here the convert/scales stay in VMEM.

Design (per batch row b, online softmax over M tiles of size bm):

  * K tile (bm, Hkv*hd) — the cache rows are read CONTIGUOUSLY (all
    heads per position), so the DMA bursts are full rows, not 128-byte
    per-head strides.
  * scores for ALL heads in ONE MXU dot: s = K2 @ Qbd, where Qbd
    (Hkv*hd, H) is the query laid out block-diagonally (head h's hd
    values in rows hkv(h)*hd..+hd of column h; zeros elsewhere). The
    extra MACs over per-head dots are free — the pass is HBM-bound.
  * per-position int8 scales fold into scores (k) and probs (v), both
    expanded to (B, M, H) host-side o(1)-sized ops.
  * ctx for all heads in ONE MXU dot: r = P^T @ V2 gives (H, Hkv*hd);
    the per-head block-diagonal (H, hd) slice is selected with a
    precomputed (H, Hkv) one-hot and a lane-blocked sum.
  * running (max, denom, acc) scratch carries across M tiles — flash
    style, f32.

Exactness: matches models.common.attention (f32 softmax) to f32
accumulation-order tolerance; pinned in tests/test_attention_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_pallas", "decode_attention_xla_ref"]

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, valid_ref, sel_ref,
            o_ref, m_run, l_run, acc, *, scale, n_tiles, quant):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)
        acc[...] = jnp.zeros_like(acc)

    k2 = k_ref[0]  # (bm, Hkv*hd) int8 or bf16
    qbd = q_ref[0]  # (Hkv*hd, H) bf16 block-diagonal
    s = jax.lax.dot_general(
        k2.astype(jnp.bfloat16), qbd,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bm, H)
    s = s * scale
    if quant:
        s = s * ks_ref[0]  # (bm, H) f32 per-position k scales
    ok = valid_ref[0] > 0.5  # (bm, H) f32 0/1 validity (Mosaic has no
    # sub-32-bit vector compares — int8 masks are rejected)
    s = jnp.where(ok, s, _NEG)

    m_prev = m_run[...]  # (1, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # (bm, H) f32
    corr = jnp.exp(m_prev - m_new)  # (1, H)
    l_run[...] = l_run[...] * corr + jnp.sum(p, axis=0, keepdims=True)
    m_run[...] = m_new

    pv = p * vs_ref[0] if quant else p  # v scales fold into probs
    r = jax.lax.dot_general(
        pv.astype(jnp.bfloat16).T, v_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, Hkv*hd)
    H, Khd = r.shape
    hd = Khd // sel_ref.shape[1]
    r3 = r.reshape(H, sel_ref.shape[1], hd)
    out = jnp.sum(r3 * sel_ref[...][:, :, None], axis=1)  # (H, hd)
    acc[...] = acc[...] * corr.T + out

    @pl.when(ti == n_tiles - 1)
    def _fin():
        o_ref[0] = (acc[...] / jnp.maximum(l_run[...].T, 1e-30)).astype(
            o_ref.dtype
        )


def _block_m(M: int, quant: bool) -> int:
    for bm in (512 if quant else 256, 256, 128):
        if M % bm == 0:
            return bm
    return 0


def supported(M: int, hd: int, quant: bool) -> bool:
    return hd % 128 == 0 and _block_m(M, quant) > 0


def decode_attention_pallas(
    q: jax.Array,  # (B, 1, H, hd)
    k: jax.Array,  # (B, M, Hkv, hd) int8 (quant) or bf16
    v: jax.Array,
    kv_valid: jax.Array,  # (B, M) bool
    scale: float,
    k_scale=None,  # (B, M, Hkv, 1) f32 for int8 KV
    v_scale=None,
) -> jax.Array:  # (B, 1, H, hd)
    B, Lq, H, hd = q.shape
    assert Lq == 1
    Bk, M, Hkv, hd2 = k.shape
    rep = H // Hkv
    quant = k_scale is not None
    bm = _block_m(M, quant)
    if bm == 0 or hd % 128:
        raise ValueError("unsupported shapes for the decode-attn kernel")
    n_tiles = M // bm

    # --- host-side (tiny) operand prep -------------------------------
    # block-diagonal Q: (B, Hkv*hd, H), column h = query head h in the
    # rows of its kv head's hd block
    qf = q[:, 0].astype(jnp.bfloat16)  # (B, H, hd)
    onehot = jax.nn.one_hot(
        jnp.arange(H) // rep, Hkv, dtype=jnp.bfloat16
    )  # (H, Hkv): 1 at [h, hkv(h)]
    # qbd[b, i*hd + d, h] = qf[b, h, d] iff hkv(h) == i
    qbd = jnp.einsum("bhd,hi->bidh", qf, onehot).reshape(B, Hkv * hd, H)

    k2 = k.reshape(B, M, Hkv * hd)
    v2 = v.reshape(B, M, Hkv * hd)
    validH = jnp.broadcast_to(
        kv_valid[:, :, None], (B, M, H)
    ).astype(jnp.float32)
    if quant:
        ksH = jnp.repeat(k_scale[..., 0], rep, axis=2).astype(jnp.float32)
        vsH = jnp.repeat(v_scale[..., 0], rep, axis=2).astype(jnp.float32)
    else:
        ksH = vsH = jnp.zeros((B, M, H), jnp.float32)
    sel = jnp.repeat(
        jnp.eye(Hkv, dtype=jnp.float32), rep, axis=0
    )  # (H, Hkv): query head -> its kv head

    grid = (B, n_tiles)
    kern = functools.partial(
        _kernel, scale=float(scale), n_tiles=n_tiles, quant=quant
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hkv * hd, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, H), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, H), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, H), lambda b, t: (b, t, 0)),
            pl.BlockSpec((H, Hkv), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, hd), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((H, hd), jnp.float32),
        ],
    )(qbd, k2, v2, ksH, vsH, validH, sel)
    return out[:, None].astype(q.dtype)


def decode_attention_xla_ref(q, k, v, kv_valid, scale,
                             k_scale=None, v_scale=None):
    """Reference semantics via models.common.attention."""
    from ...models.common import attention

    return attention(
        q, k, v, None, kv_valid, scale=scale,
        k_scale=k_scale, v_scale=v_scale,
    )
