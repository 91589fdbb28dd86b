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

__all__ = [
    "ep_param_specs", "shard_moe_layer", "ep_moe_mlp", "ep_forward",
    "shard_moe_params",
]


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
        return _local_moe(cfg, lp_, h_, axis, impl, 0)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(lp, h).astype(h.dtype)


def _local_moe(cfg, lp, h, axis, impl, layer_idx, taps=None):
    """Inside shard_map over ``axis``: this shard's local experts' weighted
    contributions, psum-combined. Exact vs models.decoder._moe_mlp."""
    del taps  # calibration never runs under EP
    ways = jax.lax.axis_size(axis)
    E = cfg.n_experts
    E_local = E // ways
    wfull, _, _ = dec.moe_router_weights(cfg, lp["router"], h)
    shard = jax.lax.axis_index(axis)
    B, L, D = h.shape
    acc = jnp.zeros((B, L, D), jnp.float32)
    for el in range(E_local):  # local experts: static unroll
        e_global = shard * E_local + el
        w_e = jnp.take(wfull, e_global, axis=-1)[..., None]  # (B, L, 1)
        if lp.get("gateup") is not None:
            gu = dec._moe_expert_apply(
                lp["gateup"], h, el, layer_idx, E_local, impl
            )
            Ie = cfg.expert_inter
            mid = dec._act(cfg, gu[..., :Ie]) * gu[..., Ie:]
        else:
            g = dec._moe_expert_apply(lp["gate"], h, el, layer_idx, E_local, impl)
            u = dec._moe_expert_apply(lp["up"], h, el, layer_idx, E_local, impl)
            mid = dec._act(cfg, g) * u
        ye = dec._moe_expert_apply(lp["down"], mid, el, layer_idx, E_local, impl)
        acc = acc + w_e * ye.astype(jnp.float32)
    return jax.lax.psum(acc, axis).astype(h.dtype)


def shard_moe_params(params: Dict[str, Any], mesh: Mesh,
                     axis: str = "expert"):
    """device_put a FULL model's params with stacked expert leaves sharded
    on ``axis`` (dim 1 of (L, E, ...) leaves), all else replicated.
    Returns (sharded params, in_specs pytree for shard_map)."""

    def spec_of(a):
        # stacked MoE leaves are (n_layers, E, ...): expert dim is always 1
        if a is None:
            return None
        if a.ndim >= 2:
            return P(None, axis, *([None] * (a.ndim - 2)))
        return P()

    moe_keys = ("gateup", "gate", "up", "down")

    def layer_specs(name, leaf):
        if leaf is None:
            return None
        if name in moe_keys and isinstance(
            leaf, (PackedTernaryLinear, DenseLinear)
        ):
            return jax.tree_util.tree_map(spec_of, leaf)
        return jax.tree_util.tree_map(lambda a: P(), leaf)

    specs = {
        k: (
            {n: layer_specs(n, v) for n, v in params["layers"].items()}
            if k == "layers"
            else (
                None
                if params[k] is None
                else jax.tree_util.tree_map(lambda a: P(), params[k])
            )
        )
        for k in params
    }

    def put(x, s):
        return x if s is None else jax.device_put(x, NamedSharding(mesh, s))

    sharded = jax.tree_util.tree_map(
        put, params, specs, is_leaf=lambda x: x is None
    )
    return sharded, specs


def ep_forward(
    cfg,
    params: Dict[str, Any],
    tokens: jax.Array,  # (B, L) int32
    mesh: Mesh,
    axis: str = "expert",
    impl: str = "auto",
) -> jax.Array:
    """Full expert-parallel causal forward -> logits (B, L, V).

    Attention/norm/embed weights replicate; expert-stacked MLP leaves stay
    sharded on ``axis`` and every layer's MoE block runs as local-expert
    compute + one psum (models.decoder.layer_forward's ``moe_fn`` hook).
    Exact vs the single-device forward (tests/test_moe.py)."""
    if not cfg.is_moe:
        raise ValueError("ep_forward is for MoE configs")
    if cfg.n_experts % mesh.shape[axis]:
        raise ValueError(
            f"n_experts {cfg.n_experts} % {axis} axis {mesh.shape[axis]}"
        )
    sharded, specs = shard_moe_params(params, mesh, axis)
    L = tokens.shape[1]
    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    mask = dec.build_mask(cfg, L, L)

    def run(params_, toks):
        h = dec.embed_tokens(cfg, params_, toks)

        def moe_fn(cfg_, lp_, h_, impl_, layer_idx, taps=None):
            return _local_moe(cfg_, lp_, h_, axis, impl_, layer_idx, taps)

        def body(carry, li):
            lp = dec.layer_view(params_["layers"], li)
            y, _ = dec.layer_forward(
                cfg, lp, carry, cos, sin, mask, impl=impl, layer_idx=li,
                cos_loc=cos_l, sin_loc=sin_l, moe_fn=moe_fn,
            )
            return y, None

        h, _ = jax.lax.scan(body, h, jnp.arange(cfg.n_layers))
        return dec.unembed(cfg, params_, h)

    fn = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(specs, P(None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    )
    return fn(sharded, tokens)
