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
model does not fit one chip even ternarized. Latency-bound decode wants
tensor parallelism (parallel/tp.py) instead — a pipeline bubble per token
is the wrong trade.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import decoder as dec

__all__ = ["pp_forward", "pp_stage_specs", "make_pp_forward_fn"]


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
