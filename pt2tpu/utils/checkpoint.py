"""Quantized-model artifacts: save/load packed params + configs.

Replaces the reference's ``torch.save`` blob (ref utils.py:288-304 — which
saves the *dequantized fp16* state dict alongside the quantized params dict,
so its artifact is as large as the original model; SURVEY.md §2.4-6). Here
the artifact stores exactly the packed representation:

  artifact_dir/
    manifest.json   — model config, quant provenance, per-projection kinds
    arrays.npz      — every tensor, flat dotted keys (packed planes int8,
                      bf16 scales saved as uint16 bit patterns, dense parts)

Per-layer incremental saves (``save_layer`` / ``load_layers``) journal each
decoder layer as it is quantized, which is what makes the quantization
pipeline resumable after preemption (SURVEY.md §5 failure handling).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models.common import DenseLinear
from ..ops.gather import PackedGather
from ..ops.ternary_matmul import PackedTernaryLinear

__all__ = ["save_model", "load_model", "save_layer", "load_layers"]

_FORMAT_VERSION = 1


def _np(x):
    """Device array -> numpy; bf16 stored as uint16 bit pattern."""
    a = np.asarray(x)
    if a.dtype == jnp.bfloat16:
        return {"__bf16__": a.view(np.uint16)}
    return a


def _flatten(prefix: str, tree, out: Dict[str, Any], manifest: Dict[str, Any]):
    if tree is None:
        manifest[prefix] = {"kind": "none"}
    elif isinstance(tree, PackedTernaryLinear):
        manifest[prefix] = {
            "kind": "ternary",
            "in_features": tree.in_features,
            "identity_perm": bool(tree.identity_perm),
            "has_bias": tree.bias is not None,
            "input_folded": bool(tree.input_folded),
            "out_folded": bool(tree.out_folded),
            "gather_in_features": (
                None if tree.gather is None else tree.gather.in_features
            ),
        }
        out[f"{prefix}.packed"] = tree.packed
        out[f"{prefix}.alpha"] = tree.alpha
        out[f"{prefix}.mu"] = tree.mu
        out[f"{prefix}.perm"] = tree.perm
        if tree.bias is not None:
            out[f"{prefix}.bias"] = tree.bias
        if tree.gather is not None:
            out[f"{prefix}.gather.packed"] = tree.gather.packed
            out[f"{prefix}.gather.perm"] = tree.gather.perm
    elif isinstance(tree, DenseLinear):
        manifest[prefix] = {"kind": "dense", "has_bias": tree.b is not None}
        out[f"{prefix}.w"] = tree.w
        if tree.b is not None:
            out[f"{prefix}.b"] = tree.b
    elif isinstance(tree, dict):
        manifest[prefix] = {"kind": "dict", "keys": sorted(tree.keys())}
        for k in sorted(tree.keys()):
            _flatten(f"{prefix}.{k}" if prefix else k, tree[k], out, manifest)
    else:
        manifest[prefix] = {"kind": "array"}
        out[prefix] = tree


def _unflatten(prefix: str, manifest, arrays) -> Any:
    info = manifest[prefix]
    kind = info["kind"]
    if kind == "none":
        return None
    if kind == "ternary":
        gather = None
        if info.get("gather_in_features") is not None:
            gather = PackedGather(
                packed=arrays[f"{prefix}.gather.packed"],
                perm=arrays[f"{prefix}.gather.perm"],
                in_features=info["gather_in_features"],
            )
        return PackedTernaryLinear(
            packed=arrays[f"{prefix}.packed"],
            alpha=arrays[f"{prefix}.alpha"],
            mu=arrays[f"{prefix}.mu"],
            perm=arrays[f"{prefix}.perm"],
            bias=arrays.get(f"{prefix}.bias"),
            gather=gather,
            in_features=info["in_features"],
            identity_perm=bool(info.get("identity_perm", False)),
            input_folded=bool(info.get("input_folded", False)),
            out_folded=bool(info.get("out_folded", False)),
        )
    if kind == "dense":
        return DenseLinear(w=arrays[f"{prefix}.w"], b=arrays.get(f"{prefix}.b"))
    if kind == "dict":
        return {
            k: _unflatten(f"{prefix}.{k}" if prefix else k, manifest, arrays)
            for k in info["keys"]
        }
    return arrays[prefix]


def _write_npz(path: str, flat: Dict[str, Any]):
    store = {}
    bf16_keys = []
    for k, v in flat.items():
        enc = _np(v)
        if isinstance(enc, dict):
            store[k] = enc["__bf16__"]
            bf16_keys.append(k)
        else:
            store[k] = enc
    np.savez(path, __bf16_keys__=np.asarray(bf16_keys, dtype=object), **store)


def _read_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=True) as z:
        bf16 = set(z["__bf16_keys__"].tolist())
        out = {}
        for k in z.files:
            if k == "__bf16_keys__":
                continue
            a = z[k]
            if k in bf16:
                a = a.view(jnp.bfloat16)
            out[k] = jnp.asarray(a)
    return out


def save_model(
    path: str,
    cfg: dec.ModelConfig,
    params: Dict[str, Any],
    quant_config: Optional[Any] = None,
    report: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a model artifact directory (packed or dense params)."""
    os.makedirs(path, exist_ok=True)
    flat: Dict[str, Any] = {}
    structure: Dict[str, Any] = {}
    _flatten("", params, flat, structure)
    _write_npz(os.path.join(path, "arrays.npz"), flat)

    def _jsonable(x):
        if dataclasses.is_dataclass(x):
            return {
                k: _jsonable(v) for k, v in dataclasses.asdict(x).items()
            }
        if isinstance(x, (np.generic,)):
            return x.item()
        if hasattr(x, "dtype") and hasattr(x, "shape"):  # stray array
            return repr(x)
        if isinstance(x, type):
            return str(x)
        if isinstance(x, dict):
            return {k: _jsonable(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_jsonable(v) for v in x]
        return x

    manifest = {
        "format_version": _FORMAT_VERSION,
        "model_config": _jsonable(cfg),
        "quant_config": _jsonable(quant_config) if quant_config else None,
        "report": _jsonable(report) if report else None,
        "structure": structure,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_model(
    path: str, mesh=None
) -> Tuple[dec.ModelConfig, Dict[str, Any]]:
    """Load an artifact directory -> (ModelConfig, params pytree).

    ``mesh``: optional jax.sharding.Mesh — parameters are placed with the
    framework's tensor/data-parallel rules directly at load (no replicated
    intermediate copy on device 0).
    """
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported artifact version {manifest['format_version']}")
    cfg = dec.ModelConfig(**manifest["model_config"])
    arrays = _read_npz(os.path.join(path, "arrays.npz"))
    params = _unflatten("", manifest["structure"], arrays)
    if isinstance(params.get("layers"), dict):
        from ..quant.fold import pad_gateup_blocks

        params["layers"] = pad_gateup_blocks(params["layers"])
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)
    return cfg, params


# ------------------------------------------------- incremental layers ----
def save_layer(path: str, layer_idx: int, layer_params: Dict[str, Any]) -> None:
    """Journal one quantized decoder layer (resume support)."""
    os.makedirs(os.path.join(path, "layers"), exist_ok=True)
    flat: Dict[str, Any] = {}
    structure: Dict[str, Any] = {}
    _flatten("", layer_params, flat, structure)
    _write_npz(os.path.join(path, "layers", f"{layer_idx:04d}.npz"), flat)
    with open(os.path.join(path, "layers", f"{layer_idx:04d}.json"), "w") as f:
        json.dump(structure, f)


def load_layers(path: str) -> List[Dict[str, Any]]:
    """Load the contiguous prefix of journaled layers (0..k)."""
    ldir = os.path.join(path, "layers")
    out: List[Dict[str, Any]] = []
    i = 0
    while os.path.exists(os.path.join(ldir, f"{i:04d}.npz")):
        with open(os.path.join(ldir, f"{i:04d}.json")) as f:
            structure = json.load(f)
        arrays = _read_npz(os.path.join(ldir, f"{i:04d}.npz"))
        out.append(_unflatten("", structure, arrays))
        i += 1
    return out
