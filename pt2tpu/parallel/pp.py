"""Pipeline parallelism: stage-partitioned layers + microbatch rotation.

The reference has no pipeline execution of any kind (SURVEY.md §2.3 — its
closest analogue is HF ``device_map="auto"`` weight spreading, ref
model.py:254-260, which runs stages *sequentially*). This is the TPU-native
design: a ``shard_map`` over a 'stage' mesh axis where

  * the stacked decoder layers are sharded on their leading (n_layers)
    axis — each stage holds ``n_layers / S`` contiguous layers and scans
    them locally (the same stacked-weight Pallas kernels as single-chip);
  * the batch is split into microbatches that rotate through the stages
    via ``lax.ppermute`` — the classic GPipe schedule, expressed as SPMD:
    every stage runs every step, bubbles compute on don't-care data
    instead of idling (identical wall-clock, trivially compilable);
  * embeddings are computed redundantly on every stage (one table lookup —
    cheaper than a scatter) and logits materialize on the last stage, then
    broadcast with a psum-style masked sum.

Use for throughput-bound full forwards (perplexity eval, prefill) when the
model does not fit one chip even ternarized — and, via
:func:`pp_generate`, for staged DECODE: stage-local KV caches, the same
wave schedule per token, bubble fraction (S-1)/(n_micro+S-1) amortized by
keeping more microbatches in flight. Latency-bound small-batch decode
still wants tensor parallelism (parallel/tp.py) — a pipeline bubble per
token is the wrong trade there.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import decoder as dec

__all__ = [
    "pp_forward", "pp_stage_specs", "make_pp_forward_fn", "pp_generate",
    "make_pp_generate_fn",
]


def pp_stage_specs(params: Dict[str, Any], axis: str = "stage"):
    """shard_map in_specs: layers stage-sharded on dim 0, rest replicated."""

    def rep(a):
        return P(*([None] * a.ndim))

    def staged(a):
        return P(*([axis] + [None] * (a.ndim - 1)))

    specs = {
        k: (None if v is None else jax.tree_util.tree_map(rep, v))
        for k, v in params.items()
        if k != "layers"
    }
    specs["layers"] = jax.tree_util.tree_map(staged, params["layers"])
    return specs


def make_pp_forward_fn(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    n_micro: int,
    L: int,
    axis: str = "stage",
    impl: str = "auto",
):
    """Compiled pipeline forward: (params, tokens (B, L)) -> logits (B, L, V).

    ``B`` must be divisible by ``n_micro`` and ``cfg.n_layers`` by the
    stage count. The returned fn is jitted; tokens are replicated in and
    logits replicated out (callers shard the batch upstream if they are
    also data-parallel).
    """
    S = mesh.shape[axis]
    if cfg.n_layers % S:
        raise ValueError(f"n_layers {cfg.n_layers} % stages {S} != 0")
    Ls = cfg.n_layers // S
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    mask = dec.build_mask(cfg, L, L)

    def run(params_, tokens):
        B = tokens.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} % n_micro {n_micro} != 0")
        mb = B // n_micro
        sid = jax.lax.axis_index(axis)

        h_all = dec.embed_tokens(cfg, params_, tokens)  # replicated compute
        micro = h_all.reshape(n_micro, mb, L, -1)
        local_layers = params_["layers"]  # this stage's (Ls, ...) slice

        def local_stack(x):
            def body(x, i):
                lp = dec.layer_view(local_layers, i)
                y, _ = dec.layer_forward(
                    cfg, lp, x, cos, sin, mask, impl=impl, layer_idx=i,
                    cos_loc=cos_l, sin_loc=sin_l,
                    global_layer_idx=sid * Ls + i,
                )
                return y, None

            return jax.lax.scan(body, x, jnp.arange(Ls))[0]

        T = n_micro + S - 1
        buf = jnp.zeros_like(micro[0])  # activation received from prev stage
        outs = jnp.zeros_like(micro)  # last stage's finished hidden states

        def step(t, carry):
            buf, outs = carry
            x0 = micro[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(sid == 0, x0, buf)
            y = local_stack(x_in)
            buf = jax.lax.ppermute(
                y, axis, perm=[(i, i + 1) for i in range(S - 1)]
            )
            oi = t - (S - 1)
            oc = jnp.maximum(oi, 0)
            take = (sid == S - 1) & (oi >= 0)
            outs = outs.at[oc].set(jnp.where(take, y, outs[oc]))
            return buf, outs

        _, outs = jax.lax.fori_loop(0, T, step, (buf, outs))
        h = outs.reshape(B, L, -1)
        # Broadcast the last stage's HIDDEN states (masked psum of (B,L,D)),
        # then unembed the same broadcast h on every stage — vocab/dim
        # (~50x for real checkpoints) less interconnect traffic than
        # all-reducing the logits.
        h = jax.lax.psum(
            jnp.where(sid == S - 1, h, jnp.zeros_like(h)), axis
        )
        return dec.unembed(cfg, params_, h)

    return jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(pp_stage_specs(params, axis), P(None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _MicroKV:
    """KV-cache view for ONE pipeline microbatch over the stage's local
    layer stack (Ls, B, M, Hkv, hd): reads/writes the mb-row block at
    ``row0`` of layer ``li``. ``valid`` is False on pipeline-bubble waves —
    the write then preserves the old cache (the bubble computes don't-care
    data on a REAL row block, which must not be corrupted).

    Duck-typed to models.decoder.layer_forward's cache contract
    (write/read; no k_scale attr -> bf16 path)."""

    k: jax.Array
    v: jax.Array
    li: jax.Array  # local layer index (scalar)
    row0: jax.Array  # first row of the microbatch block (scalar)
    valid: jax.Array  # () bool
    mb: int  # static rows per microbatch

    def tree_flatten(self):
        return (self.k, self.v, self.li, self.row0, self.valid), (self.mb,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mb=aux[0])

    def write(self, k_new: jax.Array, v_new: jax.Array, pos) -> "_MicroKV":
        mb, L = k_new.shape[:2]
        idx = (self.li, self.row0, pos, 0, 0)
        shape = (1, mb, L) + k_new.shape[2:]
        old_k = jax.lax.dynamic_slice(self.k, idx, shape)
        old_v = jax.lax.dynamic_slice(self.v, idx, shape)
        nk = jnp.where(self.valid, k_new[None].astype(self.k.dtype), old_k)
        nv = jnp.where(self.valid, v_new[None].astype(self.v.dtype), old_v)
        return _MicroKV(
            k=jax.lax.dynamic_update_slice(self.k, nk, idx),
            v=jax.lax.dynamic_update_slice(self.v, nv, idx),
            li=self.li, row0=self.row0, valid=self.valid, mb=self.mb,
        )

    def read(self, dtype=jnp.bfloat16):
        k_li = jax.lax.dynamic_index_in_dim(self.k, self.li, 0, keepdims=False)
        v_li = jax.lax.dynamic_index_in_dim(self.v, self.li, 0, keepdims=False)
        k = jax.lax.dynamic_slice_in_dim(k_li, self.row0, self.mb, axis=0)
        v = jax.lax.dynamic_slice_in_dim(v_li, self.row0, self.mb, axis=0)
        return k.astype(dtype), v.astype(dtype)


def make_pp_generate_fn(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    B: int,
    Lp: int,
    max_new: int,
    n_micro: int,
    max_len: Optional[int] = None,
    axis: str = "stage",
    impl: str = "auto",
):
    """Compiled STAGED PIPELINE DECODE: (params, prompt (B, Lp)) ->
    tokens (B, max_new), greedy.

    Each stage holds n_layers/S contiguous layers AND their KV cache
    (Ls, B, M, Hkv, hd); both prefill and every decoded token flow through
    the classic GPipe wave schedule (n_micro + S - 1 waves per step), with
    per-wave masked KV block writes so bubbles never corrupt cache rows.
    Per-token bubble fraction is (S-1)/(n_micro + S - 1) — raise n_micro
    (more rows in flight) to amortize it. Token-exact vs the single-device
    greedy path (tests/test_pp.py).

    The reference runs stages sequentially via HF device_map (ref
    model.py:254-260) and has no decode loop at all; this is the TPU-SPMD
    redesign (one jitted program, ppermute rotation, no host round-trips
    per stage).
    """
    S = mesh.shape[axis]
    if cfg.n_layers % S:
        raise ValueError(f"n_layers {cfg.n_layers} % stages {S} != 0")
    if B % n_micro:
        raise ValueError(f"batch {B} % n_micro {n_micro} != 0")
    Ls = cfg.n_layers // S
    mb = B // n_micro
    M = max_len or min(cfg.max_seq_len, Lp + max_new)
    if Lp + max_new > M:
        raise ValueError(f"prompt {Lp} + max_new {max_new} > max_len {M}")
    T = n_micro + S - 1
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
    prefill_mask = dec.build_mask(cfg, Lp, M)
    rot = [(i, i + 1) for i in range(S - 1)]

    def _loc_slice(pos, L):
        """Sliding-layer RoPE tables for positions [pos, pos+L) (gemma3's
        distinct local base); None for single-table configs."""
        if cosl_all is None:
            return None, None
        return (
            jax.lax.dynamic_slice_in_dim(cosl_all, pos, L, 0),
            jax.lax.dynamic_slice_in_dim(sinl_all, pos, L, 0),
        )

    def run(params_, prompt):
        sid = jax.lax.axis_index(axis)
        local_layers = params_["layers"]  # this stage's (Ls, ...) slice

        def local_stack(x, kk, vv, row0, valid, cos, sin, mask, kv_valid,
                        pos, cos_l=None, sin_l=None):
            def body(carry, i):
                x, kk, vv = carry
                view = _MicroKV(kk, vv, i, row0, valid, mb=mb)
                lp = dec.layer_view(local_layers, i)
                y, io = dec.layer_forward(
                    cfg, lp, x, cos, sin, mask, cache=view, cache_pos=pos,
                    kv_valid=kv_valid, impl=impl, layer_idx=i,
                    global_layer_idx=sid * Ls + i,
                    cos_loc=cos_l, sin_loc=sin_l,
                )
                return (y, io.kv.k, io.kv.v), None

            (y, kk, vv), _ = jax.lax.scan(body, (x, kk, vv), jnp.arange(Ls))
            return y, kk, vv

        def pipeline_pass(x_all, kk, vv, cos, sin, mask, kv_valid, pos,
                          cos_l=None, sin_l=None):
            """Run (B, L, D) through the local stages via the wave
            schedule; returns (last-stage hidden (B, L, D), kk, vv)."""
            L = x_all.shape[1]
            micro = x_all.reshape(n_micro, mb, L, -1)
            buf = jnp.zeros_like(micro[0])
            outs = jnp.zeros_like(micro)

            def wave(t, carry):
                buf, kk, vv, outs = carry
                mi = t - sid
                x_in = jnp.where(sid == 0, micro[jnp.clip(t, 0, n_micro - 1)], buf)
                row0 = jnp.clip(mi, 0, n_micro - 1) * mb
                valid = (mi >= 0) & (mi < n_micro)
                y, kk, vv = local_stack(
                    x_in, kk, vv, row0, valid, cos, sin, mask, kv_valid,
                    pos, cos_l, sin_l,
                )
                buf = jax.lax.ppermute(y, axis, perm=rot)
                oi = t - (S - 1)
                oc = jnp.maximum(oi, 0)
                take = (sid == S - 1) & (oi >= 0)
                outs = outs.at[oc].set(jnp.where(take, y, outs[oc]))
                return buf, kk, vv, outs

            _, kk, vv, outs = jax.lax.fori_loop(
                0, T, wave, (buf, kk, vv, outs)
            )
            h = outs.reshape(B, L, -1)
            h = jax.lax.psum(
                jnp.where(sid == S - 1, h, jnp.zeros_like(h)), axis
            )
            return h, kk, vv

        x0 = dec.embed_tokens(cfg, params_, prompt)
        kk = jnp.zeros((Ls, B, M, cfg.kv_heads, cfg.hd), x0.dtype)
        vv = jnp.zeros_like(kk)

        # --- prefill (all rows share Lp: lockstep contract) --------------
        cosl_p, sinl_p = _loc_slice(jnp.int32(0), Lp)
        h, kk, vv = pipeline_pass(
            x0, kk, vv, cos_all[:Lp], sin_all[:Lp], prefill_mask, None,
            jnp.int32(0), cosl_p, sinl_p,
        )
        logits0 = dec.unembed(cfg, params_, h[:, Lp - 1 :])[:, 0]
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

        # --- staged decode -----------------------------------------------
        def macro(carry, _):
            kk, vv, toks, pos = carry
            x = dec.embed_tokens(cfg, params_, toks[:, None], pos0=pos)
            cos = jax.lax.dynamic_slice_in_dim(cos_all, pos, 1, 0)
            sin = jax.lax.dynamic_slice_in_dim(sin_all, pos, 1, 0)
            kv_valid = jnp.broadcast_to(
                jnp.arange(M)[None, :] <= pos, (mb, M)
            )
            cos_l, sin_l = _loc_slice(pos, 1)
            h, kk, vv = pipeline_pass(
                x, kk, vv, cos, sin, None, kv_valid, pos, cos_l, sin_l
            )
            logits = dec.unembed(cfg, params_, h)[:, 0]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (kk, vv, nxt, pos + 1), nxt

        (_, _, _, _), rest = jax.lax.scan(
            macro, (kk, vv, tok0, jnp.int32(Lp)), None, length=max_new - 1
        )
        return jnp.concatenate([tok0[:, None], rest.T], axis=1)

    return jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(pp_stage_specs(params, axis), P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )


def pp_generate(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    prompt: jax.Array,  # (B, Lp) int32
    max_new: int,
    n_micro: Optional[int] = None,
    max_len: Optional[int] = None,
    axis: str = "stage",
    impl: str = "auto",
) -> jax.Array:
    """One-shot staged pipeline-parallel greedy decode -> (B, max_new)."""
    B, Lp = prompt.shape
    S = mesh.shape[axis]
    n_micro = n_micro or min(S, B)
    fn = make_pp_generate_fn(
        cfg, mesh, params, B, Lp, max_new, n_micro, max_len, axis, impl
    )
    return fn(params, prompt)


def pp_forward(
    cfg: dec.ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    tokens: jax.Array,  # (B, L) int32
    n_micro: Optional[int] = None,
    axis: str = "stage",
    impl: str = "auto",
) -> jax.Array:
    """One-shot pipeline-parallel causal forward to logits (B, L, V).

    ``n_micro`` defaults to the stage count (the smallest count that fills
    the pipeline). For repeated calls build the fn once with
    :func:`make_pp_forward_fn`.
    """
    S = mesh.shape[axis]
    n_micro = n_micro or min(S, tokens.shape[0])
    fn = make_pp_forward_fn(
        cfg, mesh, params, n_micro, tokens.shape[1], axis, impl
    )
    return fn(params, tokens)
