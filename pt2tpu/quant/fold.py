"""Offline SSR-permutation folding — zero-gather inference layouts.

SSR (quant/gptq.py) reorders each projection's input columns, so at
inference the activations must be presented in visit-lane order. The
reference pays for this on every forward with an activation gather AND a
weight inverse-permutation (ref model.py:84-90). This module removes the
runtime cost at pack time, per projection:

  * ``down`` — its input ``mid = act(gate(h)) * up(h)`` is elementwise in
    the feature dim, so permuting the *output lanes* of gate/up (free: lane
    relabeling of packed planes + scales + bias) makes ``mid`` arrive
    already in down's visit order. Exact, zero runtime cost, zero quality
    change. Requires down's valid lanes to be a contiguous prefix
    (always true when in_features % block_size == 0 — all production dims).

  * ``qkv`` / ``o`` / ``gateup`` (and unfused q/k/v/gate/up) — their inputs
    are attention/norm outputs on the residual stream, which must stay in
    one global feature order, so a runtime reorder is unavoidable. It is
    attached as a :class:`~pt2tpu.ops.gather.PackedGather`: a packed
    one-hot MXU matmul at ~HBM rate instead of a VPU lane gather.

    (o's permutation could in principle fold into v's output lanes, but
    only when it is head-preserving — attention applies per-head weights —
    which SSR's free column clustering essentially never is; we keep SSR's
    full quality and pay the one MXU gather.)

Why not fold qkv's permutation into the residual stream: each layer wants a
*different* order, and the residual add forces one consistent order per
stream position; any transition between orders is itself a gather.

Folding happens per layer inside the quantization pipeline (before
journaling), so artifacts are stored pre-folded and resume/serve see the
folded layout transparently.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np

from ..models.common import DenseLinear
from ..ops.gather import make_packed_gather
from ..ops.ternary_matmul import PackedTernaryLinear

__all__ = ["fold_layer_perms", "foldable_prefix_perm", "permute_out",
           "pad_gateup_blocks"]

# Projections whose input permutation can only be realized at runtime.
_GATHER_TARGETS = ("qkv", "q", "k", "v", "o", "gateup", "gate", "up")


def foldable_prefix_perm(p: PackedTernaryLinear) -> Optional[np.ndarray]:
    """Return sigma = perm[:m] if the valid lanes form a contiguous prefix
    covering every original column exactly once; else None.

    With SSR and m % block_size == 0 every lane is valid, so this always
    holds for production dims; ragged layers (m % bs != 0) interleave pad
    lanes and cannot be realized by relabeling a producer's m outputs.
    """
    perm_np = np.asarray(p.perm)
    m = p.in_features
    if perm_np.ndim != 1 or perm_np.shape[0] < m:
        return None
    if not (perm_np[m:] == m).all():
        return None
    sigma = perm_np[:m].astype(np.int64)
    seen = np.zeros(m, dtype=bool)
    seen[sigma] = True
    if not seen.all():
        return None
    return sigma


def permute_out(lin: Any, sigma: np.ndarray) -> Any:
    """Relabel a projection's output features: new output j = old sigma[j].

    Free at pack time: packed planes / scales / bias permute along the lane
    (output-feature) axis; a DenseLinear permutes weight rows.
    """
    idx = np.asarray(sigma, dtype=np.int64)
    if isinstance(lin, DenseLinear):
        return DenseLinear(
            w=lin.w[idx, :], b=None if lin.b is None else lin.b[idx]
        )
    if isinstance(lin, PackedTernaryLinear):
        if lin.packed.ndim != 2:
            raise ValueError("permute_out operates on pre-stack (2-D) layers")
        return dataclasses.replace(
            lin,
            packed=lin.packed[:, idx],
            alpha=lin.alpha[:, idx],
            mu=lin.mu[:, idx],
            bias=None if lin.bias is None else lin.bias[idx],
            out_folded=True,
        )
    raise TypeError(f"cannot permute outputs of {type(lin).__name__}")


def _attach_gather(p: PackedTernaryLinear) -> PackedTernaryLinear:
    g = make_packed_gather(p.perm, p.in_features)
    # identity_perm is cleared so every layer of a stacked model carries the
    # same static structure (a true-identity SSR perm is measure-zero, but
    # stacking requires uniform aux data); the one-hot of an identity perm
    # is still exact.
    return dataclasses.replace(p, gather=g, identity_perm=False)


def fold_layer_perms(
    cfg: Any,  # models.decoder.ModelConfig (duck-typed: gated_mlp)
    lp: Dict[str, Any],
) -> Dict[str, Any]:
    """Fold/realize every SSR permutation of one (pre-stack) decoder layer.

    Identity-perm projections (SSR off, or per-projection ``ssr_skip``) are
    left untouched — they already take the zero-cost path. Structure across
    a model's layers stays uniform because SSR-ness is configured per
    projection, not per layer.
    """
    lp = dict(lp)

    down = lp.get("down")
    if isinstance(down, PackedTernaryLinear) and down.packed.ndim != 2:
        # Expert-stacked MoE entries are folded per expert BEFORE stacking
        # (fold_moe_expert_perms); nothing to do at the layer level.
        down = None
    if isinstance(down, PackedTernaryLinear) and not (
        down.identity_perm or down.input_folded
    ):
        sigma = foldable_prefix_perm(down)
        I = down.in_features
        producer_ok = False
        if sigma is not None:
            gu = lp.get("gateup")
            gate, up = lp.get("gate"), lp.get("up")
            if gu is not None and getattr(gu, "out_features", None) == 2 * I:
                lp["gateup"] = permute_out(gu, np.concatenate([sigma, I + sigma]))
                producer_ok = True
            elif cfg.gated_mlp and gate is not None and up is not None:
                lp["gate"] = permute_out(gate, sigma)
                lp["up"] = permute_out(up, sigma)
                producer_ok = True
            elif not cfg.gated_mlp and up is not None:
                lp["up"] = permute_out(up, sigma)
                producer_ok = True
        if producer_ok:
            lp["down"] = dataclasses.replace(down, input_folded=True)
        else:
            lp["down"] = _attach_gather(down)

    for name in _GATHER_TARGETS:
        p = lp.get(name)
        if not isinstance(p, PackedTernaryLinear) or p.gather is not None:
            continue
        if p.identity_perm or p.input_folded or p.packed.ndim != 2:
            continue
        lp[name] = _attach_gather(p)

    return lp


def fold_moe_expert_perms(cfg: Any, expert_lps):
    """Fold each expert's {gateup, down} perms independently, keeping the
    STATIC structure uniform across experts so the per-expert pytrees can
    stack into one (E, ...) leaf set.

    ``fold_layer_perms`` per expert normally folds down's perm into
    gateup's output lanes for free. If the fold succeeds for some experts
    but not others (e.g. a pad-lane perm on one expert), the static flags
    would differ and the stack would be illegal — in that case every
    expert uniformly falls back to packed one-hot gathers.
    """
    folded = [fold_layer_perms(cfg, dict(lp)) for lp in expert_lps]

    def sig(lp):
        out = []
        for k in sorted(lp):
            v = lp[k]
            if isinstance(v, PackedTernaryLinear):
                out.append(
                    (k, v.identity_perm, v.input_folded, v.out_folded,
                     v.gather is not None)
                )
        return tuple(out)

    if len({sig(f) for f in folded}) == 1:
        return folded
    out = []
    for lp in expert_lps:
        lp = dict(lp)
        for k, v in list(lp.items()):
            if (
                isinstance(v, PackedTernaryLinear)
                and not v.identity_perm
                and not v.input_folded
                and v.gather is None
            ):
                lp[k] = _attach_gather(v)
        out.append(lp)
    return out


def fold_head_perm(packed: PackedTernaryLinear) -> PackedTernaryLinear:
    """Realize a quantized lm_head's SSR perm as a packed one-hot gather
    (the head has no downstream projection to fold into, so the gather is
    the terminal realization — same rule as qkv/o/gateup)."""
    if packed.identity_perm or packed.input_folded or packed.gather is not None:
        return packed
    return _attach_gather(packed)


def pad_gateup_blocks(lp: Dict[str, Any], multiple: int = 8) -> Dict[str, Any]:
    """Inference-prep transform: pad a folded gateup's gate/up halves with
    zero-scale columns to a ``multiple``-of-128-column block count.

    The fused MLP megakernel sweeps down's k-blocks in groups of
    ``blocks_per_step``; Mosaic's sublane-block rule plus VMEM budgets want
    steps of 8 blocks (tn_g = 1024), but llama-class intermediates
    (11008 -> 86 blocks) only divide by {1, 2, 43, 86}. Padding each half
    86 -> 88 blocks costs 2.3% extra MLP stream and unlocks the wide grid.

    Exact: pad columns carry alpha = mu = 0, so gate = up = 0 there and the
    down blocks they feed are the zero-scaled pad blocks. Artifacts stay
    canonical (unpadded) — this runs where layers are stacked for serving
    (randmodel / checkpoint.load_model / quant pipeline). The decoder's
    two-call fallback splits gate/up at ``out_features // 2`` so both paths
    agree on the padded layout.
    """
    gu, dn = lp.get("gateup"), lp.get("down")
    if lp.get("router") is not None:
        # MoE expert-stacked leaves: _moe_expert_apply splits at
        # cfg.expert_inter — keep experts unpadded.
        return lp
    if not (
        isinstance(gu, PackedTernaryLinear)
        and isinstance(dn, PackedTernaryLinear)
    ):
        return lp
    # ndim 2: per-layer (pipeline/randmodel); ndim 3: layer-stacked
    # (checkpoint.load_model). Padding acts on the last axis either way.
    if gu.packed.ndim not in (2, 3) or not dn.input_folded:
        return lp
    I = dn.in_features
    if gu.out_features != 2 * I or I % 128 != 0:
        return lp
    nv = I // 128
    nv8 = -(-nv // multiple) * multiple
    if nv8 == nv:
        return lp
    # Compare LANES, not scale-block counts: nv8 counts 128-lane blocks
    # while down's alpha axis counts block_size-lane blocks — at
    # block_size 32 the old count comparison padded gateup with no
    # matching down rows (caught by the manual-TP dryrun).
    if nv8 * 128 > dn.packed.shape[-2] * 4:
        return lp  # down lacks the pad rows; keep the narrow layout
    pad = (nv8 - nv) * 128
    import jax.numpy as jnp

    def padded(a):
        gate, up = a[..., :I], a[..., I:]
        z = ((0, 0),) * (a.ndim - 1) + ((0, pad),)
        return jnp.concatenate(
            [jnp.pad(gate, z), jnp.pad(up, z)], axis=-1
        )

    lp = dict(lp)
    lp["gateup"] = dataclasses.replace(
        gu,
        packed=padded(gu.packed),
        alpha=padded(gu.alpha),
        mu=padded(gu.mu),
        bias=None if gu.bias is None else padded(gu.bias),
    )
    return lp
