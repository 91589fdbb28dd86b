"""Shared functional building blocks for the JAX model zoo.

The reference rides on HuggingFace ``transformers`` for the model runtime
(ref model.py:228-264) and discovers ``nn.Linear`` modules to hook/replace
(ref model.py:130-171). Here models are our own pure-functional JAX code, so
"layer discovery" is structural: every projection is a :class:`DenseLinear`
or :class:`TernaryLinear` pytree node and quantization is a pytree
transformation — no hooks, no monkey-patching (SURVEY.md §7 layer 4).

``TernaryLinear`` (the inference container) lives in ops/ternary_matmul as
``PackedTernaryLinear``; this module registers both containers as pytrees so
model params jit/shard transparently, with static metadata in aux_data.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ternary_matmul import (
    PackedTernaryLinear,
    ternary_linear_apply,
    ternary_linear_apply_stacked,
)

__all__ = [
    "DenseLinear",
    "apply_linear",
    "rms_norm",
    "layer_norm",
    "rope_tables",
    "apply_rope",
    "causal_mask",
    "attention",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseLinear:
    """Plain (out, in) linear weights. ``y = x @ w.T + b``."""

    w: jax.Array  # (out_features, in_features)
    b: Optional[jax.Array] = None  # (out_features,)

    def tree_flatten(self):
        return (self.w, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def in_features(self) -> int:
        return self.w.shape[1]

    @property
    def out_features(self) -> int:
        return self.w.shape[0]


def apply_linear(
    lin: Any, x: jax.Array, impl: str = "auto", layer_idx=None
) -> jax.Array:
    """Dispatch on the linear container type (static under jit).

    ``layer_idx``: when set and ``lin`` carries stacked (n_layers, ...)
    ternary arrays, use the scalar-prefetch layer-indexed kernel (avoids
    HBM weight copies inside scan-over-layers loops)."""
    if isinstance(lin, PackedTernaryLinear):
        if layer_idx is not None and lin.packed.ndim == 3:
            return ternary_linear_apply_stacked(lin, x, layer_idx, impl=impl)
        return ternary_linear_apply(lin, x, impl=impl)
    y = x @ lin.w.T.astype(x.dtype)
    if lin.b is not None:
        y = y + lin.b.astype(x.dtype)
    return y


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(dt) * weight.astype(dt)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(dt) * weight.astype(dt) + bias.astype(dt)


def rope_tables(
    head_dim: int,
    max_len: int,
    theta: float = 10000.0,
    scale: float = 1.0,
    llama3: Optional[Tuple[float, float, float, int]] = None,
):
    """Precompute RoPE cos/sin tables: (max_len, head_dim // 2) each, f32.

    ``scale`` > 1 is HF "linear" rope scaling (positions divided by the
    factor — gemma3's global layers use factor 8). ``llama3`` is HF's
    llama-3.1 frequency warping (factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings): long-wavelength components are
    divided by ``factor``, short ones kept, with a smooth ramp between the
    two wavelength cutoffs (the reference reaches this through HF
    transformers when loading llama3 checkpoints, ref model.py:141-142)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if llama3 is not None:
        factor, low_ff, high_ff, orig_len = llama3
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wl = orig_len / low_ff  # longest wavelength kept scaled
        high_wl = orig_len / high_ff  # shortest wavelength left alone
        smooth = (orig_len / wavelen - low_ff) / (high_ff - low_ff)
        mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > low_wl,
            inv_freq / factor,
            jnp.where(wavelen < high_wl, inv_freq, mid),
        )
    t = jnp.arange(max_len, dtype=jnp.float32) / scale
    freqs = jnp.outer(t, inv_freq)  # (max_len, hd/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, L, H, hd) queries/keys. cos/sin are (L, hd/2) — shared
    positions — or (B, L, hd/2) — per-row positions (continuous batching).
    Half-split convention (HF Llama)."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    if cos.ndim == 2:
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
    else:
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate((x1 * c - x2 * s, x2 * c + x1 * s), axis=-1)


def causal_mask(q_len: int, kv_len: int, q_offset: int = 0) -> jax.Array:
    """(q_len, kv_len) additive mask: 0 where kv position <= query position."""
    q_pos = q_offset + jnp.arange(q_len)[:, None]
    kv_pos = jnp.arange(kv_len)[None, :]
    return jnp.where(kv_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)


# Route single-query cache attention through the Pallas decode kernel on
# TPU (ops/kernels/pallas_attention.py). Default OFF for bf16 KV: the
# corrected interleaved A/B (scripts/attn_ab.py, M aligned to 128 so the
# kernel actually engages) measures it NEUTRAL vs the XLA path at the
# batch-8 serving point (12.264 vs 12.236 ms/step; token-identical) —
# XLA's aligned-M attention already streams at rate. int8 KV routes
# through the kernel by default (see attention()): its integer-domain
# scores/probs path beats the XLA int8 read, which wastes the byte
# advantage on convert/scale traffic.
#
# NOTE (advisor r4): this module global is read at TRACE time — flipping
# it after a caller compiled has no effect on cached programs. Callers
# that A/B the kernel must pass ``attn_kernel=`` explicitly (it is part
# of the traced structure) or clear jit caches between flips.
DECODE_ATTN_KERNEL = False

# int8-KV decode attention: route through the Pallas kernel (False since
# the round-5 A/B: the kernel's per-tile costs and block-diagonal MXU
# waste leave it 20-30% behind even the convert-based XLA path at long
# context — RESULTS r5). The integer-domain XLA path below is the
# production int8 route instead.
INT8_DECODE_ATTN_KERNEL = False

# Integer-domain int8-KV attention IN XLA: q absmax-quantized to int8 so
# the score einsum runs s8 x s8 -> s32, probs absmax-int8 for the context
# einsum (SageAttention-style P-int8, arXiv:2410.02367) — no bf16 cache
# convert in the graph. Default OFF: measured on-chip (round 5,
# scripts/attn_long_ab.py) XLA lowers these integer einsums far off the
# MXU fast path (B8/ctx1024: 44.1 ms/step vs 16.2 for the convert-based
# math; B8/ctx4096: 143.7 vs 34.7) — the convert-based XLA path is the
# production int8 route on this compiler generation. The path stays
# tested (tests/test_serve.py) for compilers where s8 einsums map well.
INT8_INTEGER_DOMAIN = False


def attention(
    q: jax.Array,  # (B, Lq, H, hd)
    k: jax.Array,  # (B, Lkv, Hkv, hd) — bf16, or int8 with k_scale given
    v: jax.Array,  # (B, Lkv, Hkv, hd)
    mask: Optional[jax.Array] = None,  # additive bias, see below
    kv_valid: Optional[jax.Array] = None,  # (B, Lkv) bool for cache slots
    scale: Optional[float] = None,  # None -> 1/sqrt(hd)
    softcap: float = 0.0,  # gemma2 attention logit soft-capping
    k_scale: Optional[jax.Array] = None,  # (B, Lkv, Hkv, 1) f32 int8-KV scales
    v_scale: Optional[jax.Array] = None,
    attn_kernel: Optional[bool] = None,  # explicit kernel choice (part of
    # the traced structure — unlike the ambient module flags, which are
    # only read at trace time); None = module-flag defaults
) -> jax.Array:
    """Grouped-query scaled dot-product attention; returns (B, Lq, H, hd).

    ``mask`` is an additive bias of shape (Lq, Lkv) — shared causal mask —
    or (H, Lq, Lkv) — per-head bias (ALiBi) — or (B, H, Lq, Lkv) — per-row
    per-head (continuous batching with ALiBi).

    ``scale`` overrides the 1/sqrt(hd) query scaling (gemma2/3's
    query_pre_attn_scalar); ``softcap`` > 0 applies
    ``softcap * tanh(scores / softcap)`` before masking (gemma2).

    ``k_scale``/``v_scale`` enable the NATIVE int8-KV path: k/v arrive as
    raw int8 and the per-(row, position, head) scales fold into the scores
    (k) and the softmax probs (v) — tiny VPU ops at decode shapes — so the
    dequantized bf16 cache is never materialized in HBM. (The read-side
    dequant path cost a full bf16 copy of the cache per step: 2x the int8
    KV bytes written + read back. The int8->bf16 convert here fuses into
    the dot operand stream.)

    f32 softmax accumulation; GQA expands kv heads by repetition (an einsum
    reshape, so XLA keeps it as one batched matmul on the MXU).
    """
    B, Lq, H, hd = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv

    # Decode-attention Pallas kernel (RESULTS round 4/5): the single-query
    # cache read in the cache's native layout, int8 KV consumed directly
    # in the INTEGER domain — s8xs8 MXU score/context dots, scales folded
    # into the online softmax (the XLA int8 path's convert/scale
    # round-trips waste the byte advantage — ~250 GB/s effective vs ~440
    # bf16). Falls through to the XLA path for every shape/feature it
    # does not cover. Both scales must be present or absent together
    # (advisor r4: the kernel prep assumes v_scale whenever k_scale).
    quant = k_scale is not None
    use_kernel = (
        attn_kernel
        if attn_kernel is not None
        else (DECODE_ATTN_KERNEL or (quant and INT8_DECODE_ATTN_KERNEL))
    )
    if (
        use_kernel
        and Lq == 1
        and mask is None
        and softcap == 0
        and (v_scale is not None) == quant
    ):
        from ..ops.kernels import pallas_attention as _pa

        if (
            jax.default_backend() == "tpu"
            and kv_valid is not None
            and _pa.supported(k.shape[1], hd, quant)
        ):
            s = float(scale) if scale is not None else 1.0 / float(hd) ** 0.5
            return _pa.decode_attention_pallas(
                q, k, v, kv_valid, s, k_scale=k_scale, v_scale=v_scale
            )
    qg = q.reshape(B, Lq, Hkv, rep, hd)

    s = jnp.float32(scale) if scale is not None else 1.0 / jnp.sqrt(jnp.float32(hd))
    int_domain = (
        k_scale is not None
        and INT8_INTEGER_DOMAIN
        and k.dtype == jnp.int8
    )
    if int_domain:
        # integer-domain scores: q absmax-int8 per (row, pos, head), one
        # s8 x s8 -> s32 MXU einsum — the int8 cache is NEVER converted
        qf32 = qg.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf32), axis=-1, keepdims=True) / 127.0
        qs = jnp.maximum(qs, 1e-20)  # all-zero q head -> uniform attn
        q8 = jnp.clip(jnp.round(qf32 / qs), -127, 127).astype(jnp.int8)
        s32 = jnp.einsum(
            "blhrd,bmhd->bhrlm", q8, k, preferred_element_type=jnp.int32
        )
        scores = (
            s32.astype(jnp.float32)
            * (s * jnp.transpose(qs, (0, 2, 3, 1, 4)))  # (B,Hkv,rep,Lq,1)
        )
    else:
        scores = jnp.einsum(
            "blhrd,bmhd->bhrlm", qg, k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * s
    if k_scale is not None:
        # (B, M, Hkv, 1) -> (B, Hkv, 1, 1, M) applied to f32 scores.
        scores = scores * jnp.transpose(k_scale, (0, 2, 3, 1))[:, :, :, None, :]
    if softcap:
        scores = jnp.float32(softcap) * jnp.tanh(scores / jnp.float32(softcap))
    if mask is not None:
        Lkv = k.shape[1]
        if mask.ndim == 2:
            scores = scores + mask[None, None, None, :, :]
        elif mask.ndim == 3:  # (H, Lq, Lkv)
            scores = scores + mask.reshape(Hkv, rep, Lq, Lkv)[None]
        elif mask.shape[1] == 1:  # (B, 1, Lq, Lkv): shared across heads
            scores = scores + mask[:, :, None]
        else:  # (B, H, Lq, Lkv)
            scores = scores + mask.reshape(B, Hkv, rep, Lq, Lkv)
    if kv_valid is not None:
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(kv_valid[:, None, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(v_scale, (0, 2, 3, 1))[:, :, :, None, :]
    if int_domain and v.dtype == jnp.int8:
        # integer-domain context: scale-folded probs absmax-int8 per
        # (row, head, position) — s8 x s8 -> s32 einsum, no v convert
        ps = jnp.max(probs, axis=-1, keepdims=True) / 127.0
        ps = jnp.maximum(ps, 1e-30)
        p8 = jnp.round(probs / ps).astype(jnp.int8)  # in [0, 127]
        c32 = jnp.einsum(
            "bhrlm,bmhd->blhrd", p8, v, preferred_element_type=jnp.int32
        )
        out = c32.astype(jnp.float32) * jnp.transpose(ps, (0, 3, 1, 2, 4))
        return out.reshape(B, Lq, H, hd).astype(q.dtype)
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhrlm,bmhd->blhrd", probs, v.astype(q.dtype))
    return out.reshape(B, Lq, H, hd)


def alibi_slopes(n_heads: int) -> jax.Array:
    """ALiBi per-head slopes (Press et al.; HF Bloom build_alibi_tensor
    semantics): geometric sequence based at 2^(-8/n) for the nearest power
    of two, interleaved extras for non-power-of-two head counts."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2_slopes(n_heads)
    else:
        base = 2 ** math.floor(math.log2(n_heads))
        s = pow2_slopes(base)
        extra = pow2_slopes(2 * base)[0::2][: n_heads - base]
        s = s + extra
    return jnp.asarray(s, jnp.float32)


def alibi_bias(
    n_heads: int, q_pos: jax.Array, kv_len: int
) -> jax.Array:
    """Additive ALiBi bias (H, Lq, kv_len): slope_h * (k_pos - q_pos),
    with k_pos > q_pos masked by the separate causal mask."""
    slopes = alibi_slopes(n_heads)  # (H,)
    k_pos = jnp.arange(kv_len, dtype=jnp.float32)
    rel = k_pos[None, :] - q_pos.astype(jnp.float32)[:, None]  # (Lq, kv)
    return slopes[:, None, None] * rel[None, :, :]
