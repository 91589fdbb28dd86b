"""Context parallelism: ring attention over a sequence-sharded mesh axis.

The reference has no attention internals at all (HF transformers runs its
forward — SURVEY.md §2.3 sequence/context-parallel row: absent). This is
the TPU-native long-context design:

  * the sequence dim shards over a 'context' mesh axis — every device
    holds L/C query positions AND only its own L/C KV block (unlike
    ``sharding.sp_forward``, which all-gathers full K/V per device);
  * attention runs as an online-softmax ring: C rounds, each consuming the
    currently-held KV block and ``ppermute``-ing it to the neighbor —
    compute overlaps the block transfer on ICI, peak attention memory is
    O(L/C) per device;
  * causality is applied per (query-block, key-block) pair from GLOBAL
    positions, so the result equals single-device causal attention to
    f32-softmax accuracy (streaming max/denominator renormalization).

``cp_forward`` runs the full decoder this way — the context-parallel
prefill/eval path for sequences whose KV does not fit one chip.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import decoder as dec

__all__ = ["ring_attention", "cp_forward", "make_cp_forward_fn"]

_NEG = -0.7 * jnp.finfo(jnp.float32).max  # finite -inf stand-in


def ring_attention(
    q: jax.Array,  # (B, Lc, H, hd) local query block
    k: jax.Array,  # (B, Lc, Hkv, hd) local key block
    v: jax.Array,
    axis: str,
    scale: Optional[float] = None,
    softcap: float = 0.0,
    window: int = 0,  # 0 = all-global; >0 = width for non-global layers
    is_global: Optional[jax.Array] = None,  # () bool: this layer is global
    alibi: bool = False,  # bloom: additive slope_h * (k_pos - q_pos) bias
) -> jax.Array:
    """Causal ring attention inside shard_map over ``axis``.

    Online softmax (flash-style m/l running stats) over C rounds; KV blocks
    rotate via ppermute. Equals models.common.attention over the gathered
    sequence (f32 accumulation; tests pin ~1e-5).

    ``window``/``is_global`` fold per-layer sliding-window semantics
    (gemma2/3) into the per-round global-position mask; ``alibi`` adds the
    per-head linear distance bias (bloom) from the same global positions —
    both exactly as models.decoder.build_mask/sliding_adjust do on the
    single-device path."""
    B, Lq, H, hd = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    C = jax.lax.axis_size(axis)  # static
    idx = jax.lax.axis_index(axis)
    s_scale = (
        jnp.float32(scale)
        if scale is not None
        else 1.0 / jnp.sqrt(jnp.float32(hd))
    )
    qg = idx * Lq + jnp.arange(Lq)  # global query positions (Lq,)
    q5 = q.reshape(B, Lq, Hkv, rep, hd)
    slopes = None
    if alibi:
        from ..models.common import alibi_slopes

        slopes = alibi_slopes(H).reshape(Hkv, rep)

    o0 = jnp.zeros((B, Hkv, rep, Lq, hd), jnp.float32)
    m0 = jnp.full((B, Hkv, rep, Lq, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((B, Hkv, rep, Lq, 1), jnp.float32)

    def body(r, carry):
        o, m, l, kb, vb = carry
        src = (idx - r) % C  # block id this device holds at round r
        kg = src * Lq + jnp.arange(Lq)  # global key positions (Lq,)
        s = (
            jnp.einsum(
                "blhrd,bmhd->bhrlm", q5, kb.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
            * s_scale
        )
        if softcap:
            s = jnp.float32(softcap) * jnp.tanh(s / jnp.float32(softcap))
        if slopes is not None:
            rel = kg[None, :].astype(jnp.float32) - qg[:, None].astype(
                jnp.float32
            )  # (Lq, M)
            s = s + slopes[None, :, :, None, None] * rel[None, None, None]
        ok = kg[None, None, None, None, :] <= qg[None, None, None, :, None]
        if window:
            win = (
                kg[None, None, None, None, :]
                > qg[None, None, None, :, None] - window
            )
            if is_global is None:
                ok = ok & win
            else:
                ok = ok & (is_global | win)
        s = jnp.where(ok, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # masked rows stay 0
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum(
            "bhrlm,bmhd->bhrld", p, vb.astype(jnp.float32)
        )
        perm = [(i, (i + 1) % C) for i in range(C)]
        kb = jax.lax.ppermute(kb, axis, perm=perm)
        vb = jax.lax.ppermute(vb, axis, perm=perm)
        return o, m_new, l, kb, vb

    o, _, l, _, _ = jax.lax.fori_loop(0, C, body, (o0, m0, l0, k, v))
    out = o / jnp.maximum(l, 1e-30)
    # (B, Hkv, rep, Lq, hd) -> (B, Lq, H, hd)
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(
        B, Lq, H, hd
    ).astype(q.dtype)


def make_cp_forward_fn(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    L: int,
    axis: str = "context",
    impl: str = "auto",
):
    """Compiled context-parallel causal forward:
    (params, tokens (B, L)) -> logits (B, L, V), L sharded over ``axis``.

    Weights replicate across the context axis (compose with 'model'
    sharding upstream if needed); activations and KV stay sequence-local.
    """
    C = mesh.shape[axis]
    if L % C:
        raise ValueError(f"sequence {L} % context axis {C} != 0")
    Lc = L // C
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, L)
    if cosl_all is None:
        # keep the shard_map arity fixed: pass the global tables twice
        cosl_all, sinl_all = cos_all, sin_all
    alibi = cfg.pos == "alibi"

    def run(params_, toks, cos, sin, cos_l, sin_l):
        idx = jax.lax.axis_index(axis)
        h = dec.embed_tokens(cfg, params_, toks, pos0=idx * Lc)

        def attn(qq, kk, vv, mask, scale=None, softcap=0.0,
                 is_global=None, window=0):
            return ring_attention(
                qq, kk, vv, axis, scale=scale, softcap=softcap,
                window=window, is_global=is_global, alibi=alibi,
            )

        def body(carry, li):
            lp = dec.layer_view(params_["layers"], li)
            y, _ = dec.layer_forward(
                cfg, lp, carry, cos, sin, None, impl=impl, layer_idx=li,
                attn_fn=attn, cos_loc=cos_l, sin_loc=sin_l,
            )
            return y, None

        h, _ = jax.lax.scan(body, h, jnp.arange(cfg.n_layers))
        return dec.unembed(cfg, params_, h)

    def rep_specs(p):
        return jax.tree_util.tree_map(
            lambda a: P(*([None] * a.ndim)), p
        )

    return jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(
                rep_specs(params),
                P(None, axis),
                P(axis, None),
                P(axis, None),
                P(axis, None),
                P(axis, None),
            ),
            out_specs=P(None, axis, None),
            check_vma=False,
        )
    ), (cos_all, sin_all, cosl_all, sinl_all)


def cp_forward(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    tokens: jax.Array,  # (B, L) int32
    axis: str = "context",
    impl: str = "auto",
) -> jax.Array:
    """One-shot context-parallel causal forward -> logits (B, L, V)."""
    fn, tables = make_cp_forward_fn(
        cfg, mesh, params, tokens.shape[1], axis, impl
    )
    return fn(params, tokens, *tables)
