"""GSPMD sharding rules for dense + packed-ternary model parameters.

Megatron-style tensor parallelism expressed as NamedShardings; XLA inserts
the collectives (scaling-book recipe: pick a mesh, annotate, let GSPMD do
the rest):

  * q/k/v/gate/up — column-parallel: output features on the 'model' axis.
    Packed planes are (K/4, n) with n = out features in the *lanes* dim,
    so they shard on their last axis; per-block scales (nb, n) likewise.
  * o/down — row-parallel: contraction features on 'model'. Packed planes
    shard on their first (K/4) axis, scales on their block axis; GSPMD
    psums the partial products.
  * embeddings / lm_head shard the hidden or vocab dim; norms replicate.
  * the SSR ``perm`` vector is replicated: it indexes activation features,
    and the activation gather happens pre-shard.

Everything handles the stacked-layer leading axis transparently (specs are
padded with None for any extra leading dims).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import DenseLinear
from ..ops.gather import PackedGather
from ..ops.ternary_matmul import PackedTernaryLinear

__all__ = ["param_shardings", "shard_params", "batch_sharding", "seq_sharding", "sp_forward"]

_COL = {"q", "k", "v", "gate", "up", "qkv", "gateup"}  # column-parallel
_ROW = {"o", "down"}  # row-parallel (in features sharded)
_MOE_EXPERT = {"gate", "up", "gateup", "down"}  # carry an expert dim in MoE


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _pad(spec_tail, ndim: int):
    """Left-pad a spec with None for stacked leading dims."""
    return tuple([None] * (ndim - len(spec_tail)) + list(spec_tail))


def _fit(mesh: Mesh, arr, spec_tail):
    """Drop axis names absent from the mesh or whose size doesn't divide
    the array dim (tiny test models can have fewer scale blocks than
    'model' shards — replicate those dims instead of failing; a
    ('data','expert') mesh simply replicates 'model'-tagged dims)."""
    nd = arr.ndim
    spec = list(_pad(spec_tail, nd))
    for i, ax in enumerate(spec):
        if ax is not None and (
            ax not in mesh.shape or arr.shape[i] % mesh.shape[ax] != 0
        ):
            spec[i] = None
    return _ns(mesh, *spec)


def _dense_spec(
    lin: DenseLinear, mesh: Mesh, kind: str, expert: bool = False
) -> DenseLinear:
    tail = {"col": ["model", None], "row": [None, "model"]}.get(kind, [None, None])
    btail = {"col": ["model"]}.get(kind, [None])
    if expert:
        # MoE leaves carry an expert dim left of the usual shape; shard it
        # on the 'expert' mesh axis (expert parallelism — SURVEY.md §2.3 EP
        # row, absent in the reference).
        tail = ["expert"] + tail
        btail = ["expert"] + btail
    w = _fit(mesh, lin.w, tail)
    b = None if lin.b is None else _fit(mesh, lin.b, btail)
    return DenseLinear(w=w, b=b)


def _ternary_spec(
    lin: PackedTernaryLinear, mesh: Mesh, kind: str, expert: bool = False
) -> PackedTernaryLinear:
    if kind == "col":
        ptail, stail, btail = [None, "model"], [None, "model"], ["model"]
        # Column-parallel: contraction lanes (K) replicated, so the one-hot
        # gather matrix replicates too.
        gtail = [None, None]
    else:  # row
        ptail, stail, btail = ["model", None], ["model", None], [None]
        # Row-parallel: contraction lanes sharded on 'model' -> each shard
        # only needs its K-range of the gather's output columns.
        gtail = [None, "model"]
    permtail = [None]  # indexes activation features: replicated
    if expert:
        # MoE leaves carry an expert dim left of the usual shape; shard it
        # on the 'expert' mesh axis (expert parallelism — SURVEY.md §2.3 EP
        # row, absent in the reference). _pad then left-pads any stacked
        # n_layers dim with None.
        ptail = ["expert"] + ptail
        stail = ["expert"] + stail
        btail = ["expert"] + btail
        gtail = ["expert"] + gtail
        permtail = ["expert"] + permtail
    packed = _fit(mesh, lin.packed, ptail)
    alpha = _fit(mesh, lin.alpha, stail)
    mu = _fit(mesh, lin.mu, stail)
    bias = None if lin.bias is None else _fit(mesh, lin.bias, btail)
    perm = _fit(mesh, lin.perm, permtail)
    gather = None
    if lin.gather is not None:
        gather = PackedGather(
            packed=_fit(mesh, lin.gather.packed, gtail),
            perm=_fit(mesh, lin.gather.perm, permtail),
            in_features=lin.gather.in_features,
        )
    return PackedTernaryLinear(
        packed=packed,
        alpha=alpha,
        mu=mu,
        perm=perm,
        bias=bias,
        gather=gather,
        in_features=lin.in_features,
        identity_perm=lin.identity_perm,  # aux data must match the params tree
        input_folded=lin.input_folded,
        out_folded=lin.out_folded,
    )


def _linear_spec(lin, mesh, kind, expert: bool = False):
    if isinstance(lin, PackedTernaryLinear):
        return _ternary_spec(lin, mesh, kind, expert=expert)
    return _dense_spec(lin, mesh, kind, expert=expert)


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Sharding pytree congruent with a models/decoder params dict."""
    repl1 = _ns(mesh, None)

    layers = params["layers"]
    is_moe = layers.get("router") is not None
    layer_specs = {}
    for name, leaf in layers.items():
        if leaf is None:
            layer_specs[name] = None
        elif name == "router":  # tiny per-layer (E, D) matrix: replicate
            layer_specs[name] = _dense_spec(leaf, mesh, "replicate")
        elif name in _COL:
            layer_specs[name] = _linear_spec(
                leaf, mesh, "col", expert=is_moe and name in _MOE_EXPERT
            )
        elif name in _ROW:
            layer_specs[name] = _linear_spec(
                leaf, mesh, "row", expert=is_moe and name in _MOE_EXPERT
            )
        else:  # norm weights/biases: replicated (stacked)
            layer_specs[name] = _ns(mesh, *_pad([None], leaf.ndim))

    out = {
        "embed": _ns(mesh, None, "model"),
        "pos_embed": (
            None if params["pos_embed"] is None else _ns(mesh, None, "model")
        ),
        "layers": layer_specs,
        "lnf_w": repl1,
        "lnf_b": None if params["lnf_b"] is None else repl1,
        "lm_head": (
            None
            if params["lm_head"] is None
            else _linear_spec(params["lm_head"], mesh, "col")
        ),
    }
    # Optional keys (embedding layernorm etc.): replicate any extra 1-D
    # array entries so new param fields never break sharding.
    for k, v in params.items():
        if k not in out:
            out[k] = None if v is None else _ns(mesh, *([None] * v.ndim))
    return out


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the params pytree onto the mesh per the standard rules."""
    specs = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: x if s is None else jax.device_put(x, s),
        params,
        specs,
        is_leaf=lambda x: x is None,
    )


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Tokens/activations: batch on 'data', rest replicated."""
    return _ns(mesh, *(["data"] + [None] * (ndim - 1)))


def seq_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Sequence/context parallelism: the L dim of (B, L, ...) tokens or
    activations sharded over ``axis``.

    The reference processes its fixed 2048-token windows on one device
    (SURVEY.md §2.3 SP row: absent); here long-context prefill/eval shards
    the sequence and lets GSPMD partition the forward — Q and the residual
    stream stay sequence-sharded, K/V all-gather inside attention (the
    scaling-book context-parallel recipe, collective inserted by XLA)."""
    return _ns(mesh, None, axis, *([None] * (ndim - 2)))


def sp_forward(cfg, params, tokens: jax.Array, mesh: Mesh, impl: str = "xla"):
    """Context-parallel full causal forward to logits (B, L, V).

    ``tokens``' L dim must be divisible by the mesh's 'data' axis size.
    Combine with
    model-sharded params (``shard_params``) for 2-D (sequence x tensor)
    parallel prefill."""
    import functools

    from ..models import decoder as dec

    toks = jax.device_put(tokens, seq_sharding(mesh))
    fn = jax.jit(functools.partial(dec.forward, cfg, impl=impl))
    return fn(params, toks)
