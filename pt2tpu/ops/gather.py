"""PackedGather — a feature permutation stored as 2-bit one-hot planes.

Inference-side companion of SSR (quant/gptq.py): activations must be
presented to a packed ternary layer in visit-lane order. This container
freezes the permutation as a packed one-hot matrix so the gather runs on
the MXU at packed-weight stream rates (ops/kernels/pallas_gather.py); on
non-TPU backends it falls back to the index form (``jnp.take`` with the
retained ``perm`` vector), which is bit-identical.

The reference performs this gather lane-wise on every forward *and* also
permutes the weight matrix (ref model.py:84-90 — the double-permutation
quirk, SURVEY.md §2.4-2). Here the weight side is baked at pack time and
the activation side is this single MXU op — or nothing at all when
quant/fold.py can fold the permutation into the producing projection.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.packing import pack_ternary

__all__ = ["PackedGather", "make_packed_gather", "gather_apply", "apply_input_perm"]

GATHER_KERNEL = os.environ.get("PT2TPU_GATHER", "iota")
"""TPU gather kernel: "iota" (default — one-hot generated in-kernel from the
index vector; bit-equal, 9.9 vs 13.8 us/call at 4096x4096/B16, no G planes
in HBM) or "packed" (stream 2-bit one-hot planes)."""


def apply_input_perm(x: jax.Array, perm: jax.Array, in_features: int) -> jax.Array:
    """Index-form gather: (..., m) -> (..., K), pad lanes (perm == m) read 0.

    A zero column is appended at index m so the per-block mu * sum(x_block)
    term stays exact on ragged layers.
    """
    pad = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
    x_pad = jnp.pad(x, pad)
    return jnp.take(x_pad, perm, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedGather:
    """One feature permutation, packed for the MXU.

    Shapes (optionally with a leading stacked n_layers dim):
      packed: (D//4, K) int8 one-hot planes, D = in_features padded to 128.
              Column k is one-hot at row perm[k]; all-zero for pad lanes.
      perm:   (K,) int32 visit lane -> original feature; pad lanes -> m.
              Retained for the XLA fallback and for artifact inspection.
    """

    packed: jax.Array
    perm: jax.Array
    in_features: int  # static: original m (pre-padding)

    def tree_flatten(self):
        return (self.packed, self.perm), (self.in_features,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, in_features=aux[0])

    @property
    def out_lanes(self) -> int:
        return self.packed.shape[-1]


def make_packed_gather(perm: jax.Array, in_features: int) -> PackedGather:
    """Freeze a visit-lane permutation into the packed one-hot layout.

    Host-side (numpy): runs once at pack/fold time.
    """
    perm_np = np.asarray(perm, dtype=np.int64)
    K = perm_np.shape[0]
    if K % 128 != 0:
        raise ValueError(f"lane count {K} must be a multiple of 128")
    D = -(-in_features // 128) * 128
    # codes in {-1, 0}: the pack layout stores T+1, so unpacked values are
    # exactly the one-hot {0, 1} entries — no scale/offset correction needed.
    codes = np.full((K, D), -1, dtype=np.int8)
    valid = perm_np < in_features
    codes[np.nonzero(valid)[0], perm_np[valid]] = 0
    packed = pack_ternary(jnp.asarray(codes), block_size=128)  # (D//4, K)
    return PackedGather(
        packed=packed,
        perm=jnp.asarray(perm_np, jnp.int32),
        in_features=in_features,
    )


def gather_apply(
    g: PackedGather,
    x: jax.Array,  # (..., m)
    impl: str = "auto",
    layer_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Permute activation features into visit-lane order: (..., m) -> (..., K).

    ``layer_idx``: required when ``g`` carries stacked (n_layers, ...) arrays
    (scan-over-layers decode); selects the layer inside the kernel.
    """
    lead = x.shape[:-1]
    m = x.shape[-1]
    if m != g.in_features:
        raise ValueError(f"input features {m} != gather in_features {g.in_features}")
    x2 = x.reshape(-1, m)
    stacked = g.packed.ndim == 3
    # a8 forces pallas only on TPU; on other backends the index-gather
    # fallback is exact (a gather has no a8-specific numerics).
    use_pallas = impl == "pallas" or (
        impl in ("a8", "auto") and jax.default_backend() == "tpu"
    )
    if use_pallas:
        D = g.packed.shape[-2] * 4
        if GATHER_KERNEL == "iota":
            # In-kernel one-hot generation from the index vector: bit-equal
            # to the packed-plane kernel and measured 9.9 vs 13.8 us/call at
            # the 7B decode shape (zero HBM for G vs 0.25 B/entry).
            from .kernels.pallas_gather import (
                onehot_iota_pallas,
                onehot_iota_pallas_stacked,
            )

            if stacked:
                out = onehot_iota_pallas_stacked(x2, g.perm, layer_idx, D=D)
            else:
                out = onehot_iota_pallas(x2, g.perm, D=D)
        elif stacked:
            from .kernels.pallas_gather import onehot_matmul_pallas_stacked

            out = onehot_matmul_pallas_stacked(x2, g.packed, layer_idx)
        else:
            from .kernels.pallas_gather import onehot_matmul_pallas

            out = onehot_matmul_pallas(x2, g.packed)
        out = out.astype(x.dtype)
    else:
        perm = g.perm[layer_idx] if stacked else g.perm
        out = apply_input_perm(x2, perm, m)
    return out.reshape(*lead, out.shape[-1])
