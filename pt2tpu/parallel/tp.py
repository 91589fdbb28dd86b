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
from ..ops.gather import PackedGather, gather_apply
from ..ops.ternary_matmul import PackedTernaryLinear, ternary_matmul_xla

__all__ = [
    "tp_row_apply",
    "tp_layer_forward",
    "tp_layer_specs",
    "make_tp_layer_fn",
    "prepare_tp_layer",
]


# --------------------------------------------------------------- apply ----
def tp_row_apply(
    p: PackedTernaryLinear,  # this shard's row slice (inside shard_map)
    x_full: jax.Array,  # (..., m) FULL activation (replicated / all-gathered)
    axis: str = "model",
    chunks: int = 2,
    impl: str = "auto",
) -> jax.Array:
    """Row-parallel packed ternary matmul with chunked psum overlap.

    The shard's K_local visit lanes are carved from ``x_full`` — via the
    shard's slice of the one-hot gather (SSR) or a dynamic lane slice
    (identity/folded perms; handles pad blocks, which read zeros).
    Output features are computed in ``chunks`` groups, each followed
    immediately by its own psum so reductions overlap the next matmul.
    """
    lead = x_full.shape[:-1]
    x2 = x_full.reshape(-1, x_full.shape[-1])
    K_local = p.packed.shape[-2] * 4
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    idx = jax.lax.axis_index(axis)
    if p.gather is not None:
        # gather packed local: (Dp/4, K_local) — output lanes follow the row
        # shard; input is the full activation.
        if use_pallas:
            from ..ops.kernels.pallas_gather import onehot_matmul_pallas

            xk = onehot_matmul_pallas(x2, p.gather.packed).astype(x2.dtype)
        else:
            # index fallback: the shard's slice of the (replicated) perm
            from ..ops.gather import apply_input_perm

            perm_local = jax.lax.dynamic_slice(
                p.gather.perm, (idx * K_local,), (K_local,)
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
    chunks = next(
        (c for c in range(min(chunks, n // 128), 1, -1)
         if n % c == 0 and (n // c) % 128 == 0),
        1,
    )
    step = n // chunks
    outs = []
    for c in range(chunks):
        sl = slice(c * step, (c + 1) * step)
        if use_pallas:
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
        out = out + p.bias.astype(out.dtype)
    return out.astype(x_full.dtype).reshape(*lead, n)


# ------------------------------------------------------------- forward ----
def tp_layer_forward(
    cfg: dec.ModelConfig,
    lp: Dict[str, Any],  # shard-local layer params (prepare_tp_layer layout)
    x: jax.Array,  # (B, L, D) replicated hidden
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    axis: str = "model",
    chunks: int = 2,
    impl: str = "auto",
) -> jax.Array:
    """One decoder layer under manual TP. Call inside shard_map."""
    ways = jax.lax.psum(1, axis)
    H = cfg.n_heads // ways
    Hkv = cfg.kv_heads // ways
    hd = cfg.hd
    B, L, D = x.shape

    h = rms_norm(x, lp["ln1_w"], cfg.norm_eps)
    qkv = apply_linear(lp["qkv"], h, impl)  # col-parallel: this shard's heads
    nq, nkv = H * hd, Hkv * hd
    q = qkv[..., :nq].reshape(B, L, H, hd)
    k = qkv[..., nq : nq + nkv].reshape(B, L, Hkv, hd)
    v = qkv[..., nq + nkv :].reshape(B, L, Hkv, hd)
    if cfg.pos == "rope":
        q = dec.apply_rope(q, cos, sin)
        k = dec.apply_rope(k, cos, sin)
    ctx = attention(q, k, v, mask).reshape(B, L, H * hd)
    # Megatron g-op: assemble the full ctx feature dim for the row-parallel
    # o projection (whose SSR gather, if any, permutes across all heads).
    ctx_full = jax.lax.all_gather(ctx, axis, axis=-1, tiled=True)
    x = x + tp_row_apply(lp["o"], ctx_full, axis, chunks, impl)

    h = rms_norm(x, lp["ln2_w"], cfg.norm_eps)
    gu = apply_linear(lp["gateup"], h, impl)  # col: [gate_s | up_s] lanes
    Iloc = gu.shape[-1] // 2
    mid = jax.nn.silu(gu[..., :Iloc]) * gu[..., Iloc:]
    mid_full = jax.lax.all_gather(mid, axis, axis=-1, tiled=True)
    x = x + tp_row_apply(lp["down"], mid_full, axis, chunks, impl)
    return x


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
    """[gate|up] -> per-shard [gate_s|up_s] (matched silu(gate)*up pairs)."""
    I = intermediate
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
    out["gateup"] = shard_major_gateup(lp["gateup"], cfg.intermediate, ways)
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
        elif name in ("qkv", "gateup"):
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
):
    """Jitted shard_map layer step: (lp, x replicated) -> x replicated."""
    if cfg.pos == "rope":
        cos, sin = dec.rope_tables(cfg.hd, L, cfg.rope_theta)
    else:
        cos = sin = jnp.zeros((L, 1), jnp.float32)
    mask = causal_mask(L, L)
    fn = functools.partial(
        tp_layer_forward, cfg, axis="model", chunks=chunks, impl=impl
    )

    def step(lp_, x):
        return fn(lp_, x, cos, sin, mask)

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(tp_layer_specs(lp), P(None, None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    )
