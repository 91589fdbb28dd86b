"""Decode-attention kernel: one query token against the KV cache, in the
cache's NATIVE (B, M, Hkv, hd) layout, consuming int8 KV directly.

Why (RESULTS.md round 4, SURVEY.md §7 step 6): at the serving operating
points (batch 8 / prompt 512+) attention+KV is 28-40% of the decode step
and the KV stream is the dominant HBM traffic (5.4 GB/step at batch 8 —
3x the packed weights). The XLA path streams bf16 KV at ~440-520 GB/s,
but int8 KV only reaches ~250 GB/s of (half-sized) traffic — the
int8->bf16 convert + scale application materializes through HBM, wasting
the entire byte advantage.

Round-5 rework — the int8 path is now INTEGER-DOMAIN end-to-end on the
score side (VERDICT r4 item 3; the same Q/K-int8 structure as public
SageAttention, arXiv:2410.02367, re-derived for the TPU MXU):

  * q is quantized per (row, head) to int8 host-side (tiny), so the
    (bm, Hkv*hd) x (Hkv*hd, H) score dot runs s8 x s8 -> s32 on the MXU —
    the k tile is NEVER converted; the only full-volume VPU op left in
    the quant path is the v tile's int8->bf16 cast for the P.V dot
    (probs stay bf16 there: P-int8 costs real precision when attention
    is peaked, so only Q/K take the integer path).
  * per-position scales and cache-slot validity stream as ONE combined
    (B, M, Hkv) f32 operand per side (k: scale*q_scale*attn_scale with 0
    encoding "invalid slot"; v: plain scale) instead of round 4's three
    expanded (B, M, H) f32 arrays (advisor r4: 12*H B/pos of side
    traffic, comparable to the int8 payload itself). The (bm, Hkv) ->
    (bm, H) head expansion is a small one-hot MXU dot in-kernel.
  * the bf16 path streams only the (B, M, Hkv) validity operand — the
    zero-filled ks/vs streams are gone (in_specs vary by ``quant``).

Shared structure (per batch row b, online softmax over M tiles of bm):

  * K tile (bm, Hkv*hd) — the cache rows are read CONTIGUOUSLY (all
    heads per position), so the DMA bursts are full rows, not 128-byte
    per-head strides.
  * scores for ALL heads in ONE MXU dot: s = K2 @ Qbd, where Qbd
    (Hkv*hd, H) is the query laid out block-diagonally (head h's hd
    values in rows hkv(h)*hd..+hd of column h; zeros elsewhere). The
    extra MACs over per-head dots are free — the pass is HBM-bound.
  * ctx for all heads in ONE MXU dot: r = P^T @ V2 gives (H, Hkv*hd);
    the per-head block-diagonal (H, hd) slice is selected with a
    precomputed (H, Hkv) one-hot and a lane-blocked sum.
  * running (max, denom, acc) scratch carries across M tiles — flash
    style, f32.

Exactness: bf16 path matches models.common.attention (f32 softmax) to
f32 accumulation-order tolerance; the quant path additionally carries
the q-int8 quantization (~0.4% per-score RMS, same order as the int8 KV
noise it reads). Pinned in tests/test_attention_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_pallas", "decode_attention_xla_ref"]

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _online_update(s, ok, p_scale, v_bf, sel_ref, m_run, l_run, acc):
    """Shared flash-style tile update: s (bm, H) f32 scores (invalid
    already at _NEG), ok (bm, H) bool, p_scale (bm, H) f32 or None folded
    into the probs, v_bf (bm, Hkv*hd) bf16."""
    m_prev = m_run[...]  # (1, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # (bm, H) f32
    corr = jnp.exp(m_prev - m_new)  # (1, H)
    l_run[...] = l_run[...] * corr + jnp.sum(p, axis=0, keepdims=True)
    m_run[...] = m_new

    pv = p * p_scale if p_scale is not None else p
    r = jax.lax.dot_general(
        pv.astype(jnp.bfloat16).T, v_bf,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, Hkv*hd)
    H, Khd = r.shape
    hd = Khd // sel_ref.shape[1]
    r3 = r.reshape(H, sel_ref.shape[1], hd)
    out = jnp.sum(r3 * sel_ref[...][:, :, None], axis=1)  # (H, hd)
    acc[...] = acc[...] * corr.T + out


def _finalize(o_ref, m_run, l_run, acc):
    o_ref[0] = (acc[...] / jnp.maximum(l_run[...].T, 1e-30)).astype(
        o_ref.dtype
    )


def _kernel_bf16(q_ref, k_ref, v_ref, kaux_ref, selv_ref, sel_ref,
                 o_ref, m_run, l_run, acc, *, scale, n_tiles):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)
        acc[...] = jnp.zeros_like(acc)

    k2 = k_ref[0]  # (bm, Hkv*hd) bf16
    qbd = q_ref[0]  # (Hkv*hd, H) bf16 block-diagonal
    s = jax.lax.dot_general(
        k2.astype(jnp.bfloat16), qbd,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bm, H)
    s = s * scale
    # validity (bm, Hkv) -> (bm, H): one-hot MXU expansion (Mosaic has no
    # sub-32-bit vector compares and lane-broadcasting a (1, bm) row
    # needs a transpose — the tiny dot avoids both)
    okH = jnp.dot(
        kaux_ref[0], selv_ref[...], preferred_element_type=jnp.float32
    )
    ok = okH > 0.5
    s = jnp.where(ok, s, _NEG)
    _online_update(
        s, ok, None, v_ref[0].astype(jnp.bfloat16), sel_ref,
        m_run, l_run, acc,
    )

    @pl.when(ti == n_tiles - 1)
    def _fin():
        _finalize(o_ref, m_run, l_run, acc)


def _kernel_quant(q_ref, k_ref, v_ref, kaux_ref, vaux_ref, selq_ref,
                  selv_ref, sel_ref, o_ref, m_run, l_run, acc, *, n_tiles):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)
        acc[...] = jnp.zeros_like(acc)

    k2 = k_ref[0]  # (bm, Hkv*hd) int8 — consumed RAW by the MXU
    qbd = q_ref[0]  # (Hkv*hd, H) int8 block-diagonal
    s32 = jax.lax.dot_general(
        k2, qbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, H) exact integer scores
    # per-position k scales with q_scale*attn_scale pre-folded (selq);
    # 0 encodes an invalid cache slot -> -inf score
    ksH = jnp.dot(
        kaux_ref[0], selq_ref[0], preferred_element_type=jnp.float32
    )  # (bm, H)
    ok = ksH > 0.0
    s = jnp.where(ok, s32.astype(jnp.float32) * ksH, _NEG)
    vsH = jnp.dot(
        vaux_ref[0], selv_ref[...], preferred_element_type=jnp.float32
    )  # (bm, H) per-position v scales folded into the probs
    _online_update(
        s, ok, vsH, v_ref[0].astype(jnp.bfloat16), sel_ref,
        m_run, l_run, acc,
    )

    @pl.when(ti == n_tiles - 1)
    def _fin():
        _finalize(o_ref, m_run, l_run, acc)


def _kernel_quant_t(q_ref, k_ref, v_ref, kaux_ref, vaux_ref, selq_ref,
                    sel_ref, o_ref, m_run, l_run, acc, *, n_tiles):
    """Transposed-score quant kernel: scores live (H, bm) — M on LANES.

    The (bm, H) layout (``_kernel_quant``) leaves H of 128 output lanes
    active and gives the score dot zero operand reuse, so at batch 1 the
    MXU ingests the k tile at ~120 GB/s and the kernel is compute-bound
    (measured: int8 decode SLOWER than bf16 at batch 1 / ctx 4k, round
    5). Here both big dots put M (bm) or Khd on the output lanes with the
    k/v tile reused across all H output rows; the flash max/denom become
    (H, 1) LANE reductions over small (H, bm) tiles — cheap at these
    sizes. Aux scales stream TRANSPOSED (B, Hkv, M) so the head expansion
    stays a tiny MXU dot."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)
        acc[...] = jnp.zeros_like(acc)

    k2 = k_ref[0]  # (bm, Khd) int8
    qbdT = q_ref[0]  # (H, Khd) int8 block-diagonal (transposed layout)
    s32 = jax.lax.dot_general(
        qbdT, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (H, bm)
    ksT = jax.lax.dot_general(
        selq_ref[0], kaux_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, Hkv) @ (Hkv, bm) -> (H, bm); 0 marks invalid slots
    ok = ksT > 0.0
    s = jnp.where(ok, s32.astype(jnp.float32) * ksT, _NEG)

    m_prev = m_run[...]  # (H, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # (H, bm)
    corr = jnp.exp(m_prev - m_new)  # (H, 1)
    l_run[...] = l_run[...] * corr + jnp.sum(p, axis=1, keepdims=True)
    m_run[...] = m_new

    vsT = jax.lax.dot_general(
        sel_ref[...], vaux_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, bm)
    pv = p * vsT
    r = jax.lax.dot_general(
        pv.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, bm) @ (bm, Khd) -> (H, Khd)
    H, Khd = r.shape
    hd = Khd // sel_ref.shape[1]
    r3 = r.reshape(H, sel_ref.shape[1], hd)
    out = jnp.sum(r3 * sel_ref[...][:, :, None], axis=1)  # (H, hd)
    acc[...] = acc[...] * corr + out

    @pl.when(ti == n_tiles - 1)
    def _fin():
        o_ref[0] = (acc[...] / jnp.maximum(l_run[...], 1e-30)).astype(
            o_ref.dtype
        )


def _block_m(M: int, quant: bool) -> int:
    for bm in (512 if quant else 256, 256, 128):
        if M % bm == 0:
            return bm
    return 0


def supported(M: int, hd: int, quant: bool) -> bool:
    return hd % 128 == 0 and _block_m(M, quant) > 0


# int8-path score layout: "hb" = transposed scores (H, bm), M on lanes —
# k/v operands reused across head rows (batch-1 long-context fix, round
# 5); "bh" = round-4 layout (bm, H), kept for A/B.
QUANT_SCORE_LAYOUT = "hb"


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
    qf = q[:, 0].astype(jnp.float32)  # (B, H, hd)
    onehot = jnp.asarray(
        jnp.arange(H)[:, None] // rep == jnp.arange(Hkv)[None, :],
        jnp.float32,
    )  # (H, Hkv): 1 at [h, hkv(h)]
    sel = onehot  # (H, Hkv): query head -> its kv head (output select)
    selv = onehot.T  # (Hkv, H): head expansion for per-position scales

    k2 = k.reshape(B, M, Hkv * hd)
    v2 = v.reshape(B, M, Hkv * hd)
    if quant:
        # per-(row, head) q int8: the score dot runs s8 x s8 -> s32
        qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0  # (B,H,1)
        qs = jnp.maximum(qs, 1e-20)  # all-zero q head -> uniform attn
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127)
        # combined k-side per-position operand: scale * (qs*attn_scale
        # folded via selq); 0 marks invalid slots
        kaux = jnp.where(
            kv_valid[:, :, None], k_scale[..., 0].astype(jnp.float32), 0.0
        )  # (B, M, Hkv)
        vaux = v_scale[..., 0].astype(jnp.float32)  # (B, M, Hkv)
        if QUANT_SCORE_LAYOUT == "hb":
            qbdT = jnp.einsum("bhd,hi->bhid", q8, onehot).reshape(
                B, H, Hkv * hd
            ).astype(jnp.int8)
            kauxT = jnp.transpose(kaux, (0, 2, 1))  # (B, Hkv, M)
            vauxT = jnp.transpose(vaux, (0, 2, 1))
            selqT = (
                onehot[None] * (qs[:, :, 0] * float(scale))[:, :, None]
            )  # (B, H, Hkv)
            args = (qbdT, k2, v2, kauxT, vauxT, selqT, sel)
            in_specs = [
                pl.BlockSpec((1, H, Hkv * hd), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, Hkv, bm), lambda b, t: (b, 0, t)),
                pl.BlockSpec((1, Hkv, bm), lambda b, t: (b, 0, t)),
                pl.BlockSpec((1, H, Hkv), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((H, Hkv), lambda b, t: (0, 0)),
            ]
            out = pl.pallas_call(
                functools.partial(_kernel_quant_t, n_tiles=n_tiles),
                grid=(B, n_tiles),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, H, hd), lambda b, t: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((H, 1), jnp.float32),
                    pltpu.VMEM((H, 1), jnp.float32),
                    pltpu.VMEM((H, hd), jnp.float32),
                ],
            )(*args)
            return out[:, None].astype(q.dtype)
        qbd = jnp.einsum("bhd,hi->bidh", q8, onehot).reshape(
            B, Hkv * hd, H
        ).astype(jnp.int8)
        selq = (
            selv[None] * (qs[:, :, 0] * float(scale))[:, None, :]
        )  # (B, Hkv, H)
        args = (qbd, k2, v2, kaux, vaux, selq, selv, sel)
        in_specs = [
            pl.BlockSpec((1, Hkv * hd, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Hkv, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Hkv, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, Hkv), lambda b, t: (0, 0)),
        ]
        kern = functools.partial(_kernel_quant, n_tiles=n_tiles)
    else:
        qbd = jnp.einsum(
            "bhd,hi->bidh", qf, onehot
        ).reshape(B, Hkv * hd, H).astype(jnp.bfloat16)
        kaux = jnp.broadcast_to(
            kv_valid[:, :, None], (B, M, Hkv)
        ).astype(jnp.float32)
        args = (qbd, k2, v2, kaux, selv, sel)
        in_specs = [
            pl.BlockSpec((1, Hkv * hd, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv * hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, bm, Hkv), lambda b, t: (b, t, 0)),
            pl.BlockSpec((Hkv, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, Hkv), lambda b, t: (0, 0)),
        ]
        kern = functools.partial(
            _kernel_bf16, scale=float(scale), n_tiles=n_tiles
        )

    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, hd), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((H, hd), jnp.float32),
        ],
    )(*args)
    return out[:, None].astype(q.dtype)


def decode_attention_xla_ref(q, k, v, kv_valid, scale,
                             k_scale=None, v_scale=None):
    """Reference semantics via models.common.attention (XLA path)."""
    from ...models.common import attention

    return attention(
        q, k, v, None, kv_valid, scale=scale,
        k_scale=k_scale, v_scale=v_scale, attn_kernel=False,
    )
