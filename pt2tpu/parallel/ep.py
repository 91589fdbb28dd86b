"""Expert parallelism: shard_map MoE execution over an 'expert' mesh axis.

The reference has no MoE and no parallelism of any kind (SURVEY.md §2.3 EP
row: absent — ref model.py:162-171 discovers dense nn.Linear only). This
module is the TPU-native EP design:

  * expert-stacked weights (models.decoder MoE layout: leading E dim on
    gateup/down leaves) are sharded on the 'expert' axis — each device
    holds n_experts / ways experts and NEVER sees the others' weights;
  * activations are replicated across the expert axis; every device runs
    the (tiny) router, computes its LOCAL experts' contributions weighted
    by the routing weights, and a single ``psum`` over the expert axis
    combines them. Unrouted experts contribute exact zeros (weight 0), so
    the combine is exact — no token dropping, no capacity factor.

This is the dense-dispatch EP scheme (right for decode and modest expert
counts: the all-to-all token-dispatch scheme only wins when tokens-per-
expert is large and experts are huge). Collectives ride ICI via the mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import decoder as dec
from ..models.common import DenseLinear
from ..ops.ternary_matmul import PackedTernaryLinear

__all__ = ["ep_param_specs", "shard_moe_layer", "ep_moe_mlp"]


def _expert_leaf_spec(axis: str):
    """PartitionSpec for an expert-stacked leaf: expert dim sharded, rest
    replicated. Leaves are (E, ...) per layer or (L, E, ...) stacked."""

    def spec(a):
        if a is None:
            return None
        if a.ndim >= 3:  # (E, out, in) / (E, K4, n) / (L, E, ...)
            return P(*([None] * (a.ndim - 3)), axis, None, None)
        if a.ndim == 2:  # (E, K) perms / (E, n) bias
            return P(axis, None)
        return P()

    return spec


def ep_param_specs(lp: Dict[str, Any], axis: str = "expert"):
    """PartitionSpecs for one MoE layer dict: expert leaves sharded on
    ``axis``, everything else replicated."""
    spec_of = _expert_leaf_spec(axis)

    def walk(name, leaf):
        if leaf is None:
            return None
        if name in ("gateup", "gate", "up", "down") and isinstance(
            leaf, (PackedTernaryLinear, DenseLinear)
        ):
            return jax.tree_util.tree_map(spec_of, leaf)
        return jax.tree_util.tree_map(lambda a: P(), leaf)

    return {k: walk(k, v) for k, v in lp.items()}


def shard_moe_layer(lp: Dict[str, Any], mesh: Mesh, axis: str = "expert"):
    """device_put one MoE layer's params with expert leaves sharded."""
    specs = ep_param_specs(lp, axis)

    def put(x, s):
        return x if s is None else jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(
        put, lp, specs, is_leaf=lambda x: x is None
    )


def ep_moe_mlp(
    cfg,
    lp: Dict[str, Any],
    h: jax.Array,  # (B, L, D) post-ln2 hidden, replicated
    mesh: Mesh,
    axis: str = "expert",
    impl: str = "auto",
):
    """Expert-parallel MoE MLP: each device computes its local experts'
    weighted contributions; one psum combines. Exact vs the single-device
    ``models.decoder._moe_mlp`` (same combine math, same expert kernels).

    ``lp`` must hold expert-stacked gateup/down (ternary or dense) sharded
    via :func:`shard_moe_layer`; the router and h are replicated.
    """
    ways = mesh.shape[axis]
    E = cfg.n_experts
    if E % ways != 0:
        raise ValueError(f"n_experts {E} not divisible by {axis} axis {ways}")
    E_local = E // ways
    specs = ep_param_specs(lp, axis)

    def body(lp_, h_):
        wfull, _, _ = dec.moe_router_weights(cfg, lp_["router"], h_)
        shard = jax.lax.axis_index(axis)
        B, L, D = h_.shape
        acc = jnp.zeros((B, L, D), jnp.float32)
        for el in range(E_local):  # local experts: static unroll
            e_global = shard * E_local + el
            w_e = jnp.take(wfull, e_global, axis=-1)[..., None]  # (B, L, 1)
            if lp_.get("gateup") is not None:
                gu = dec._moe_expert_apply(
                    lp_["gateup"], h_, el, 0, E_local, impl
                )
                Ie = cfg.expert_inter
                mid = dec._act(cfg, gu[..., :Ie]) * gu[..., Ie:]
            else:
                g = dec._moe_expert_apply(lp_["gate"], h_, el, 0, E_local, impl)
                u = dec._moe_expert_apply(lp_["up"], h_, el, 0, E_local, impl)
                mid = dec._act(cfg, g) * u
            ye = dec._moe_expert_apply(lp_["down"], mid, el, 0, E_local, impl)
            acc = acc + w_e * ye.astype(jnp.float32)
        return jax.lax.psum(acc, axis)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(lp, h).astype(h.dtype)
