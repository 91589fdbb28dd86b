"""Manual tensor parallelism: shard_map + explicit collectives.

The default multi-chip path is GSPMD (parallel/sharding.py): annotate
shardings, let XLA insert collectives. This module is the *manual* path the
scaling recipe calls for when the collective schedule must be explicit
(SURVEY.md §5 distributed row) — and it is the path that keeps the Pallas
kernels shard-local (an opaque custom call gives GSPMD nothing to partition,
so on a real mesh the XLA path would fall back to gathered operands).

Placement (Megatron with explicit activation collectives):

  * qkv / gateup — column-parallel. Output lanes are re-ordered
    *shard-major* at prepare time (``shard_major_qkv`` / ``shard_major_gateup``
    — free lane relabeling, same trick as quant/fold.permute_out) so each
    shard computes whole attention heads / matched gate-up pairs locally.
  * attention — fully local to the shard's heads.
  * o / down — row-parallel: contraction lanes (packed rows + scale blocks)
    sharded by contiguous 128-blocks. The shard's input lanes are carved
    from an ``all_gather``-ed activation (tiny at decode: <= a few 10s of
    KB/token) — this absorbs scale-block padding raggedness (e.g. down's
    11008 valid lanes inside 96 padded blocks) with zero layout constraints.
    Partial products psum per output chunk, so chunk c's reduction rides the
    ICI while chunk c+1's ternary matmul runs on the MXU.
  * SSR gathers: qkv/gateup gathers act on replicated activations
    (replicated, shard-local compute); o's gather shards its *output* lanes
    with o's rows and consumes the all-gathered ctx. down is input_folded
    by quant/fold.py, so it has no gather.

Everything inside shard_map calls the same single-chip Pallas kernels on
local shards — no kernel changes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import decoder as dec
from ..models.common import apply_linear, attention, causal_mask, rms_norm
from ..ops.gather import PackedGather
from ..ops.ternary_matmul import PackedTernaryLinear, ternary_matmul_xla

__all__ = [
    "tp_row_apply",
    "tp_layer_forward",
    "tp_layer_specs",
    "make_tp_layer_fn",
    "prepare_tp_layer",
    "prepare_tp_params",
    "tp_param_specs",
    "tp_generate",
    "make_tp_engine_fns",
]


# --------------------------------------------------------------- apply ----
def tp_row_apply(
    p: PackedTernaryLinear,  # this shard's row slice (inside shard_map)
    x_full: jax.Array,  # (..., m) FULL activation (replicated / all-gathered)
    axis: str = "model",
    chunks: int = 2,
    impl: str = "auto",
    layer_idx: Optional[jax.Array] = None,  # stacked (n_layers, ...) arrays
) -> jax.Array:
    """Row-parallel packed ternary matmul with chunked psum overlap.

    The shard's K_local visit lanes are carved from ``x_full`` — via the
    shard's slice of the one-hot gather (SSR) or a dynamic lane slice
    (identity/folded perms; handles pad blocks, which read zeros).
    Output features are computed in ``chunks`` groups, each followed
    immediately by its own psum so reductions overlap the next matmul.
    (Stacked weights force chunks=1: a column slice of the whole stack
    would materialize an HBM copy — the scan path takes one psum instead.)
    """
    lead = x_full.shape[:-1]
    x2 = x_full.reshape(-1, x_full.shape[-1])
    stacked = p.packed.ndim == 3
    K_local = p.packed.shape[-2] * 4
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    idx = jax.lax.axis_index(axis)
    if p.gather is not None:
        # gather packed local: (Dp/4, K_local) — output lanes follow the row
        # shard; input is the full activation.
        if use_pallas:
            if stacked:
                from ..ops.kernels.pallas_gather import (
                    onehot_matmul_pallas_stacked,
                )

                xk = onehot_matmul_pallas_stacked(
                    x2, p.gather.packed, layer_idx
                ).astype(x2.dtype)
            else:
                from ..ops.kernels.pallas_gather import onehot_matmul_pallas

                xk = onehot_matmul_pallas(x2, p.gather.packed).astype(x2.dtype)
        else:
            # index fallback: the shard's slice of the (replicated) perm
            from ..ops.gather import apply_input_perm

            perm = p.gather.perm[layer_idx] if stacked else p.gather.perm
            perm_local = jax.lax.dynamic_slice(
                perm, (idx * K_local,), (K_local,)
            )
            xk = apply_input_perm(x2, perm_local, p.gather.in_features)
    else:
        ways = jax.lax.psum(1, axis)
        pad = ways * K_local - x2.shape[-1]
        x_pad = jnp.pad(x2, ((0, 0), (0, pad))) if pad else x2
        xk = jax.lax.dynamic_slice(
            x_pad, (0, idx * K_local), (x_pad.shape[0], K_local)
        )

    n = p.out_features
    bs = p.block_size
    # Clamp to the largest feasible chunk count: chunks must divide n into
    # 128-aligned groups (kernel lane tiles); degrade to 1 (single psum).
    if stacked:
        chunks = 1
    chunks = next(
        (c for c in range(min(chunks, n // 128), 1, -1)
         if n % c == 0 and (n // c) % 128 == 0),
        1,
    )
    step = n // chunks
    outs = []
    for c in range(chunks):
        sl = slice(c * step, (c + 1) * step)
        if stacked:
            if use_pallas:
                from ..ops.kernels.pallas_ternary import (
                    ternary_matmul_pallas_stacked,
                )

                part = ternary_matmul_pallas_stacked(
                    xk, p.packed, p.alpha, p.mu, layer_idx, block_size=bs
                )
            else:
                part = ternary_matmul_xla(
                    xk, p.packed[layer_idx], p.alpha[layer_idx],
                    p.mu[layer_idx], block_size=bs,
                )
        elif use_pallas:
            from ..ops.kernels.pallas_ternary import ternary_matmul_pallas

            part = ternary_matmul_pallas(
                xk, p.packed[:, sl], p.alpha[:, sl], p.mu[:, sl], block_size=bs
            )
        else:
            part = ternary_matmul_xla(
                xk, p.packed[:, sl], p.alpha[:, sl], p.mu[:, sl], block_size=bs
            )
        outs.append(jax.lax.psum(part, axis))  # async; overlaps next chunk
    out = jnp.concatenate(outs, axis=-1)
    if p.bias is not None:
        bias = p.bias[layer_idx] if stacked else p.bias
        out = out + bias.astype(out.dtype)
    return out.astype(x_full.dtype).reshape(*lead, n)


# ------------------------------------------------------------- forward ----
def tp_layer_forward(
    cfg: dec.ModelConfig,
    lp: Dict[str, Any],  # shard-local layer params (prepare_tp_layer layout)
    x: jax.Array,  # (B, L, D) replicated hidden
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    cache: Optional[Any] = None,  # KVLayerView with LOCAL kv heads
    cache_pos: Optional[jax.Array] = None,
    kv_valid: Optional[jax.Array] = None,  # (B, M) bool cache validity
    axis: str = "model",
    chunks: int = 2,
    impl: str = "auto",
    layer_idx: Optional[jax.Array] = None,  # stacked-weight kernels
    cos_loc: Optional[jax.Array] = None,  # sliding-layer RoPE (gemma3)
    sin_loc: Optional[jax.Array] = None,
):
    """One decoder layer under manual TP. Call inside shard_map.

    Returns (hidden, updated KVLayerView or None). With ``cache`` given,
    this shard writes/reads only its own kv heads (head-sharded cache).
    Covers the full dense family surface: gated MLPs (llama/mistral/qwen/
    gemma/gemma2/gemma3 — norm_plus_one, act dispatch, qk-norm, sandwich
    norms, attention scaling/softcap, per-layer sliding windows + dual
    RoPE) AND non-gated MLPs (opt/gpt2/bloom — plain column-parallel fc1,
    layernorm biases, per-head alibi masks sliced to this shard's heads).
    Per-head norms and the (D,)-sized sandwich norms are replicated, so
    only the projections themselves are sharded.
    """
    ways = jax.lax.psum(1, axis)
    H = cfg.n_heads // ways
    Hkv = cfg.kv_heads // ways
    hd = cfg.hd
    B, L, D = x.shape

    cos, sin, mask, kv_valid = dec.sliding_adjust(
        cfg, layer_idx, cos, sin, cos_loc, sin_loc, mask, kv_valid,
        cache, cache_pos, B, L,
    )
    if mask is not None and mask.ndim == 3 and mask.shape[0] == cfg.n_heads:
        # per-head mask (alibi, dec.build_mask:373-377): this shard's heads
        mask = jax.lax.dynamic_slice_in_dim(
            mask, jax.lax.axis_index(axis) * H, H, axis=0
        )
    elif (
        mask is not None and mask.ndim == 4 and mask.shape[1] == cfg.n_heads
    ):
        # per-row per-head mask (continuous-batching alibi decode,
        # serve/engine.py:95-104 shape (B, H, Lw, M)): slice dim 1
        mask = jax.lax.dynamic_slice_in_dim(
            mask, jax.lax.axis_index(axis) * H, H, axis=1
        )

    h = dec._norm(cfg, x, lp["ln1_w"], lp.get("ln1_b"))
    qkv = apply_linear(lp["qkv"], h, impl, layer_idx)  # col: this shard's heads
    nq, nkv = H * hd, Hkv * hd
    q = qkv[..., :nq].reshape(B, L, H, hd)
    k = qkv[..., nq : nq + nkv].reshape(B, L, Hkv, hd)
    v = qkv[..., nq + nkv :].reshape(B, L, Hkv, hd)
    if cfg.qk_norm:
        q = dec._head_norm(cfg, q, lp["q_norm_w"])
        k = dec._head_norm(cfg, k, lp["k_norm_w"])
    if cfg.pos == "rope":
        q = dec.apply_rope(q, cos, sin)
        k = dec.apply_rope(k, cos, sin)
    if cache is not None:
        # scalar pos (prefill/lockstep) vs per-row positions (continuous
        # batching, L == 1) — mirrors models/decoder.layer_forward.
        if jnp.ndim(cache_pos) == 0:
            new_kv = cache.write(k, v, cache_pos)
        else:
            new_kv = cache.write_rows(k, v, cache_pos)
        ck, cv = new_kv.read(q.dtype)
        ctx = attention(q, ck, cv, mask, kv_valid,
                        scale=cfg.attn_scale, softcap=cfg.attn_softcap)
    else:
        ctx = attention(q, k, v, mask,
                        scale=cfg.attn_scale, softcap=cfg.attn_softcap)
        new_kv = None
    ctx = ctx.reshape(B, L, H * hd)
    # Megatron g-op: assemble the full ctx feature dim for the row-parallel
    # o projection (whose SSR gather, if any, permutes across all heads).
    ctx_full = jax.lax.all_gather(ctx, axis, axis=-1, tiled=True)
    ao = tp_row_apply(lp["o"], ctx_full, axis, chunks, impl, layer_idx)
    if cfg.sandwich_norm:
        ao = dec._norm(cfg, ao, lp["post_attn_w"], None)
    x = x + ao

    h = dec._norm(cfg, x, lp["ln2_w"], lp.get("ln2_b"))
    if lp.get("gateup") is not None:
        gu = apply_linear(lp["gateup"], h, impl, layer_idx)  # col: [gate_s|up_s]
        Iloc = gu.shape[-1] // 2
        mid = dec._act(cfg, gu[..., :Iloc]) * gu[..., Iloc:]
    else:  # non-gated (opt/gpt2/bloom): plain column-parallel fc1
        mid = dec._act(cfg, apply_linear(lp["up"], h, impl, layer_idx))
    mid_full = jax.lax.all_gather(mid, axis, axis=-1, tiled=True)
    mo = tp_row_apply(lp["down"], mid_full, axis, chunks, impl, layer_idx)
    if cfg.sandwich_norm:
        mo = dec._norm(cfg, mo, lp["post_mlp_w"], None)
    x = x + mo
    return x, new_kv


# ------------------------------------------------------------- prepare ----
def _permute_lanes(p: PackedTernaryLinear, sigma: np.ndarray) -> PackedTernaryLinear:
    return dataclasses.replace(
        p,
        packed=p.packed[:, sigma],
        alpha=p.alpha[:, sigma],
        mu=p.mu[:, sigma],
        bias=None if p.bias is None else p.bias[sigma],
    )


def shard_major_qkv(p, cfg: dec.ModelConfig, ways: int):
    """Reorder fused-qkv lanes [q|k|v] -> per-shard [q_s|k_s|v_s] so a plain
    contiguous lane shard gives each shard whole heads of q, k AND v."""
    H, Hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    nq, nkv = H * hd, Hkv * hd
    idx = []
    for s in range(ways):
        idx.append(np.arange(s * nq // ways, (s + 1) * nq // ways))
        idx.append(nq + np.arange(s * nkv // ways, (s + 1) * nkv // ways))
        idx.append(nq + nkv + np.arange(s * nkv // ways, (s + 1) * nkv // ways))
    return _permute_lanes(p, np.concatenate(idx))


def shard_major_gateup(p, intermediate: int, ways: int):
    """[gate|up] -> per-shard [gate_s|up_s] (matched silu(gate)*up pairs).

    Halves split at the STORED width, not cfg.intermediate:
    quant/fold.pad_gateup_blocks may have padded each half with zero-scale
    columns (round-3 fused-MLP wide grid), and mismatched pairing there
    silently scrambles silu(gate)*up. Pad lanes pair with pad lanes
    (both halves pad at their end), contributing exact zeros."""
    I = p.out_features // 2
    if I % ways:
        raise ValueError(
            f"stored gate half {I} not divisible by ways={ways}"
        )
    idx = []
    for s in range(ways):
        idx.append(np.arange(s * I // ways, (s + 1) * I // ways))
        idx.append(I + np.arange(s * I // ways, (s + 1) * I // ways))
    return _permute_lanes(p, np.concatenate(idx))


def prepare_tp_layer(cfg: dec.ModelConfig, lp: Dict[str, Any], ways: int):
    """Host-side lane reordering for the manual-TP layout (pure relabeling).

    Requires the fused (qkv/gateup) quantized layout, ways | heads and
    ways | intermediate, and row-parallel scale blocks divisible by ways.
    """
    if cfg.n_heads % ways or cfg.kv_heads % ways or cfg.intermediate % ways:
        raise ValueError(f"ways={ways} must divide heads and intermediate")
    for name in ("o", "down"):
        nbp = lp[name].alpha.shape[-2]
        if nbp % ways:
            raise ValueError(f"{name}: padded blocks {nbp} not divisible by {ways}")
    out = dict(lp)
    out["qkv"] = shard_major_qkv(lp["qkv"], cfg, ways)
    if cfg.gated_mlp:
        out["gateup"] = shard_major_gateup(lp["gateup"], cfg.intermediate, ways)
    # non-gated (opt/gpt2/bloom): ``up`` is plain column-parallel — any
    # contiguous lane shard works, no matched-pair reordering needed
    return out


# --------------------------------------------------------------- specs ----
def tp_layer_specs(lp: Dict[str, Any]) -> Dict[str, Any]:
    """shard_map in_specs for one prepared (pre-stack) decoder layer."""

    def tern(kind: str, p: PackedTernaryLinear) -> PackedTernaryLinear:
        if kind == "col":
            packed = scales = P(None, "model")
            bias = P("model")
            gspec = P(None, None)  # replicated-input gather, replicated
        else:
            packed = scales = P("model", None)
            bias = P(None)
            gspec = P(None, "model")  # output lanes follow the row shard
        gather = None
        if p.gather is not None:
            gather = PackedGather(
                packed=gspec, perm=P(None), in_features=p.gather.in_features
            )
        return PackedTernaryLinear(
            packed=packed,
            alpha=scales,
            mu=scales,
            perm=P(None),
            bias=None if p.bias is None else bias,
            gather=gather,
            in_features=p.in_features,
            identity_perm=p.identity_perm,
            input_folded=p.input_folded,
            out_folded=p.out_folded,
        )

    specs: Dict[str, Any] = {}
    for name, leaf in lp.items():
        if leaf is None:
            specs[name] = None
        elif name in ("qkv", "gateup", "up"):
            specs[name] = tern("col", leaf)
        elif name in ("o", "down"):
            specs[name] = tern("row", leaf)
        else:
            specs[name] = P(None)
    return specs


def make_tp_layer_fn(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    lp: Dict[str, Any],  # prepared via prepare_tp_layer
    L: int,
    chunks: int = 2,
    impl: str = "auto",
    layer_idx: Optional[int] = None,  # required for sliding-window configs
):
    """Jitted shard_map layer step: (lp, x replicated) -> x replicated."""
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    mask = dec.build_mask(cfg, L, L)  # per-head for alibi (bloom)
    li = None if layer_idx is None else jnp.int32(layer_idx)
    fn = functools.partial(
        tp_layer_forward, cfg, axis="model", chunks=chunks, impl=impl,
        layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
    )

    def step(lp_, x):
        return fn(lp_, x, cos, sin, mask)[0]

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(tp_layer_specs(lp), P(None, None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    )


# ------------------------------------------------------ full-model TP ----
def prepare_tp_params(cfg: dec.ModelConfig, params: Dict[str, Any], ways: int):
    """Shard-major lane layout for every stacked decoder layer (host-side)."""
    lps = [
        prepare_tp_layer(cfg, dec.layer_slice(params["layers"], i), ways)
        for i in range(cfg.n_layers)
    ]
    out = dict(params)
    out["layers"] = dec.stack_layers(lps)
    return out


def _lift(spec_tree):
    """Prepend a stacked-layers None dim to every PartitionSpec leaf."""

    def go(t):
        if t is None:
            return None
        if isinstance(t, P):
            return P(*((None,) + tuple(t)))
        if isinstance(t, PackedGather):
            return PackedGather(
                packed=go(t.packed), perm=go(t.perm), in_features=t.in_features
            )
        if isinstance(t, PackedTernaryLinear):
            return PackedTernaryLinear(
                packed=go(t.packed),
                alpha=go(t.alpha),
                mu=go(t.mu),
                perm=go(t.perm),
                bias=go(t.bias),
                gather=go(t.gather),
                in_features=t.in_features,
                identity_perm=t.identity_perm,
                input_folded=t.input_folded,
                out_folded=t.out_folded,
            )
        if isinstance(t, dict):
            return {k: go(v) for k, v in t.items()}
        raise TypeError(f"unexpected spec node {type(t).__name__}")

    return go(spec_tree)


def _replicated_like(leaf):
    """All-None specs matching a non-layer param leaf (embed/lm_head/...)."""
    from ..models.common import DenseLinear

    if leaf is None:
        return None
    if isinstance(leaf, DenseLinear):
        return DenseLinear(
            w=P(*([None] * leaf.w.ndim)),
            b=None if leaf.b is None else P(*([None] * leaf.b.ndim)),
        )
    if isinstance(leaf, PackedTernaryLinear):
        return PackedTernaryLinear(
            packed=P(*([None] * leaf.packed.ndim)),
            alpha=P(*([None] * leaf.alpha.ndim)),
            mu=P(*([None] * leaf.mu.ndim)),
            perm=P(*([None] * leaf.perm.ndim)),
            bias=None if leaf.bias is None else P(*([None] * leaf.bias.ndim)),
            gather=None
            if leaf.gather is None
            else PackedGather(
                packed=P(*([None] * leaf.gather.packed.ndim)),
                perm=P(*([None] * leaf.gather.perm.ndim)),
                in_features=leaf.gather.in_features,
            ),
            in_features=leaf.in_features,
            identity_perm=leaf.identity_perm,
            input_folded=leaf.input_folded,
            out_folded=leaf.out_folded,
        )
    return P(*([None] * leaf.ndim))


def tp_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """shard_map in_specs for a full prepared params pytree."""
    specs = {
        k: _replicated_like(v) for k, v in params.items() if k != "layers"
    }
    specs["layers"] = _lift(tp_layer_specs(params["layers"]))
    return specs


def tp_generate(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],  # prepared via prepare_tp_params
    prompt: jax.Array,  # (B, Lp) int32
    max_new: int,
    max_len: Optional[int] = None,
    chunks: int = 2,
    impl: str = "auto",
) -> jax.Array:
    """Greedy decode with the whole prefill+scan loop inside ONE shard_map:
    column/row-parallel ternary matmuls, head-sharded KV cache, explicit
    psum/all_gather — the manual-TP serving path (cf. serve/generate.py for
    the single-device/GSPMD path)."""
    from ..serve.kvcache import KVCache, KVStackedView

    ways = mesh.shape["model"]
    B, Lp = prompt.shape
    M = max_len or min(cfg.max_seq_len, Lp + max_new)
    if Lp + max_new > M:
        raise ValueError(f"prompt {Lp} + max_new {max_new} exceeds max_len {M}")
    Hkv_local = cfg.kv_heads // ways
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)

    def fwd(params_, toks, cache: KVCache, pos0):
        L = toks.shape[1]
        h = dec.embed_tokens(cfg, params_, toks, pos0=pos0)
        cos = jax.lax.dynamic_slice_in_dim(cos_all, pos0, L)
        sin = jax.lax.dynamic_slice_in_dim(sin_all, pos0, L)
        cos_l = sin_l = None
        if cosl_all is not None:
            cos_l = jax.lax.dynamic_slice_in_dim(cosl_all, pos0, L)
            sin_l = jax.lax.dynamic_slice_in_dim(sinl_all, pos0, L)
        mask = dec.build_mask(cfg, L, M, q_offset=pos0)

        # In-place KV carry (see serve.kvcache.KVStackedView): per-layer
        # views through xs/ys copied the whole shard-local cache per step.
        def body(carry, li):
            x, kvt = carry
            kvl = KVStackedView(*kvt, li)
            lp = dec.layer_view(params_["layers"], li)
            y, kv = tp_layer_forward(
                cfg, lp, x, cos, sin, mask, cache=kvl, cache_pos=pos0,
                axis="model", chunks=chunks, impl=impl, layer_idx=li,
                cos_loc=cos_l, sin_loc=sin_l,
            )
            return (y, kv.carry()), None

        (h, kvt), _ = jax.lax.scan(
            body,
            (h, KVStackedView.of(cache, 0).carry()),
            jnp.arange(cfg.n_layers),
        )
        logits = dec.unembed(cfg, params_, h[:, -1:, :])[:, 0]
        return logits, KVCache(*kvt, length=jnp.asarray(pos0 + L, jnp.int32))

    def run(params_, prompt_):
        shape = (cfg.n_layers, B, M, Hkv_local, cfg.hd)
        cache = KVCache(
            k=jnp.zeros(shape, jnp.bfloat16),
            v=jnp.zeros(shape, jnp.bfloat16),
            k_scale=None,
            v_scale=None,
            length=jnp.int32(0),
        )
        logits, cache = fwd(params_, prompt_, cache, 0)
        tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def step(carry, _):
            cache, tok, pos = carry
            logits, cache = fwd(params_, tok[:, None], cache, pos)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache, nxt, pos + 1), nxt

        (_, _, _), rest = jax.lax.scan(
            step, (cache, tok0, jnp.int32(Lp)), None, length=max_new - 1
        )
        return jnp.concatenate([tok0[:, None], rest.T], axis=1)

    fn = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(tp_param_specs(params), P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )
    return fn(params, prompt)


# ---------------------------------------------------- engine TP hooks ----
def make_tp_engine_fns(cfg: dec.ModelConfig, mesh: Mesh, params, chunks: int = 1,
                       impl: str = "auto"):
    """(prefill_fn, decode_fn) for serve.ServeEngine under manual TP.

    Same contracts as the engine's default jitted programs, but the whole
    step runs inside shard_map: column/row-parallel ternary kernels stay
    shard-local and the slot-pool KV cache is head-sharded on 'model'.
    ``params`` must be prepared with prepare_tp_params. Unquantized KV only
    (INT8 pool scales are a per-shard layout question left for the GSPMD
    path). All position kinds: rope/learned, and alibi (bloom) via the
    per-row (B, H, 1, M) bias of serve/engine.py:95-104 with this shard's
    head slice taken inside tp_layer_forward.
    """
    from ..serve.kvcache import KVCache, KVStackedView

    pspecs = tp_param_specs(params)
    kv_spec = P(None, None, None, "model", None)
    cache_spec = KVCache(k=kv_spec, v=kv_spec, k_scale=None, v_scale=None,
                         length=P())

    def _rope(M):
        return dec.pos_tables(cfg, M)

    def _decode_body(params_, tokens, cache, positions, active, samp=None):
        B = tokens.shape[0]
        M = cache.max_len
        x = dec.embed_tokens_per_row(cfg, params_, tokens, positions)
        cos_all, sin_all, cosl_all, sinl_all = _rope(M)
        cos = jnp.take(cos_all, positions, axis=0)[:, None]
        sin = jnp.take(sin_all, positions, axis=0)[:, None]
        cos_l = sin_l = None
        if cosl_all is not None:
            cos_l = jnp.take(cosl_all, positions, axis=0)[:, None]
            sin_l = jnp.take(sinl_all, positions, axis=0)[:, None]
        kv_valid = jnp.arange(M)[None, :] <= positions[:, None]
        mask = None
        if cfg.pos == "alibi":
            from ..models.common import alibi_slopes

            slopes = alibi_slopes(cfg.n_heads)  # (H,)
            rel = (
                jnp.arange(M, dtype=jnp.float32)[None, :]
                - positions.astype(jnp.float32)[:, None]
            )  # (B, M)
            mask = slopes[None, :, None, None] * rel[:, None, None, :]

        def body(carry, li):
            h, kvt = carry
            kvl = KVStackedView(*kvt, li)
            lp = dec.layer_view(params_["layers"], li)
            y, kv = tp_layer_forward(
                cfg, lp, h, cos, sin, mask, cache=kvl, cache_pos=positions,
                kv_valid=kv_valid, axis="model", chunks=chunks, impl=impl,
                layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
            )
            return (y, kv.carry()), None

        (h, kvt), _ = jax.lax.scan(
            body, (x, KVStackedView.of(cache, 0).carry()),
            jnp.arange(cfg.n_layers),
        )
        logits = dec.unembed(cfg, params_, h)[:, 0]
        if samp is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            from ..serve.sampling import sample_per_row

            base_key, uids, temps, top_ks, top_ps = samp
            nxt = sample_per_row(
                logits, base_key, uids, positions, temps, top_ks, top_ps
            )
        nxt = jnp.where(active, nxt, 0)
        return nxt, KVCache(*kvt, length=cache.length)

    _base_in_specs = (pspecs, P(None), cache_spec, P(None), P(None))
    _samp_spec = (P(), P(None), P(None), P(None), P(None))
    decode_sms = {}

    def _decode_sm(with_samp: bool):
        if with_samp not in decode_sms:
            decode_sms[with_samp] = jax.jit(
                jax.shard_map(
                    _decode_body,
                    mesh=mesh,
                    in_specs=(
                        _base_in_specs + (_samp_spec,)
                        if with_samp
                        else _base_in_specs
                    ),
                    out_specs=(P(None), cache_spec),
                    check_vma=False,
                )
            )
        return decode_sms[with_samp]

    def _prefill_body(with_samp=False):
        def run(params_, prompt, true_len, cache, slot, samp=None):
            M = cache.max_len
            Lb = prompt.shape[1]
            ways = jax.lax.psum(1, "model")
            Hkv_local = cfg.kv_heads // ways
            tshape = (cfg.n_layers, 1, M, Hkv_local, cfg.hd)
            tmp0 = (
                jnp.zeros(tshape, cache.k.dtype),
                jnp.zeros(tshape, cache.v.dtype),
                None, None,
            )
            h = dec.embed_tokens(cfg, params_, prompt)
            cos_all, sin_all, cosl_all, sinl_all = _rope(M)
            cos, sin = cos_all[:Lb], sin_all[:Lb]
            cos_l = None if cosl_all is None else cosl_all[:Lb]
            sin_l = None if sinl_all is None else sinl_all[:Lb]
            mask = dec.build_mask(cfg, Lb, M)

            def body(carry, li):
                x, kvt = carry
                kvl = KVStackedView(*kvt, li)
                lp = dec.layer_view(params_["layers"], li)
                y, kv = tp_layer_forward(
                    cfg, lp, x, cos, sin, mask, cache=kvl, cache_pos=0,
                    axis="model", chunks=chunks, impl=impl, layer_idx=li,
                    cos_loc=cos_l, sin_loc=sin_l,
                )
                return (y, kv.carry()), None

            (h, kvt), _ = jax.lax.scan(
                body, (h, tmp0), jnp.arange(cfg.n_layers)
            )
            h_last = jax.lax.dynamic_slice_in_dim(h, true_len - 1, 1, axis=1)
            logits = dec.unembed(cfg, params_, h_last)[:, 0]

            def put(pool, row):
                return pool.at[:, slot].set(row[:, 0])

            tk, tv, _, _ = kvt
            new_cache = KVCache(
                k=put(cache.k, tk),
                v=put(cache.v, tv),
                k_scale=None, v_scale=None,
                length=cache.length,
            )
            if samp is None:
                tok = jnp.argmax(logits[0]).astype(jnp.int32)
            else:
                from ..serve.sampling import sample_per_row

                base_key, uid, temp, top_k, top_p = samp
                tok = sample_per_row(
                    logits, base_key, uid[None], (true_len - 1)[None],
                    temp[None], top_k[None], top_p[None],
                )[0]
            return tok, new_cache

        return run

    prefill_cache = {}

    def prefill_fn(cfg_, params_, prompt, true_len, cache, slot, impl_="auto",
                   samp=None):
        with_samp = samp is not None
        # slot is a traced scalar (the pool scatter is a dynamic slice), so
        # only the prompt bucket causes compiles — slot-static cost
        # max_batch program variants per bucket (see _prefill_into_slot).
        key = (prompt.shape[1], with_samp)
        if key not in prefill_cache:
            in_specs = (pspecs, P(None, None), P(), cache_spec, P())
            if with_samp:
                in_specs = in_specs + ((P(), P(), P(), P(), P()),)
            prefill_cache[key] = jax.jit(
                jax.shard_map(
                    _prefill_body(with_samp),
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=(P(), cache_spec),
                    check_vma=False,
                )
            )
        args = (params_, prompt, jnp.int32(true_len), cache, jnp.int32(slot))
        if with_samp:
            args = args + (samp,)
        return prefill_cache[key](*args)

    def decode_fn(cfg_, params_, tokens, cache, positions, active,
                  impl_="auto", samp=None):
        if samp is None:
            return _decode_sm(False)(params_, tokens, cache, positions, active)
        return _decode_sm(True)(
            params_, tokens, cache, positions, active, samp
        )

    return prefill_fn, decode_fn
