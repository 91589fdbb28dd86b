"""Packed ternary matmul — XLA reference implementation + dispatch wrapper.

This is the inference primitive the reference lacks entirely: its
``TernaryLinear.forward`` re-materializes the full fp16 weight matrix on
every call and then runs a dense matmul (ref model.py:75-110 — SURVEY.md
§3.5 flags it as the #1 perf sin). Here the weights stay packed as 2-bit
planes in HBM and the matmul consumes them directly:

    out[b, j] = sum_k  alpha[blk(k), j] * T[k, j] * x[b, perm[k]]
              + sum_blk mu[blk, j] * sum_{k in blk} x[b, perm[k]]

i.e. per 128-column scale block: one (B,128)x(128,N) MXU matmul against the
unpacked codes plus a rank-1 offset term — the full dequantized matrix is
never formed. Two implementations share this contract:

  * ``ternary_matmul_xla``   — pure jnp (einsum) reference; runs anywhere.
  * ``ternary_matmul_pallas``— fused Pallas TPU kernel
    (ops/kernels/pallas_ternary.py) that unpacks 2-bit planes in VMEM and
    streams only 0.25 B/weight + bf16 scales from HBM.

Input-permutation contract: GPTQ emits codes in SSR visit order with
``perm[k]`` = original column (quant/gptq.py). The activation reordering
happens once per layer on the (small) activation, never on the weights —
pad lanes point at a zero slot (index m), so the mu-offset term is exact
even for ragged layers. Three mechanisms, fastest applicable wins:

  * ``input_folded`` — the producing projection's output lanes were
    permuted at pack time (quant/fold.py), so the input already arrives in
    visit order: zero runtime cost.
  * ``gather`` — a :class:`~pt2tpu.ops.gather.PackedGather`: the
    permutation runs as a packed one-hot MXU matmul (~HBM-rate).
  * ``perm`` index gather — the fallback ``jnp.take`` form.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.packing import unpack_ternary
from ..quant.gptq import TernaryLayerQuant
from .gather import PackedGather, apply_input_perm, gather_apply

__all__ = [
    "PackedTernaryLinear",
    "make_packed_linear",
    "pack_layer",
    "apply_input_perm",
    "ternary_matmul_xla",
    "ternary_linear_apply",
    "ternary_linear_apply_stacked",
    "verify_fused_gather",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedTernaryLinear:
    """Inference-time packed parameters for one ternarized linear layer.

    Registered as a pytree (``in_features`` is static aux data) so model
    params containing these jit/vmap/shard transparently and quantization is
    a pure pytree transformation — the TPU-native replacement for the
    reference's ``TernaryLinear`` nn.Module (ref model.py:17-127).

    Shapes (K = num_blocks * block_size lanes in visit order):
      packed: (K // 4, n) int8 2-bit planes (core/packing.py layout)
      alpha:  (nb, n) scale per (block, out_feature)  — note transposed vs
              the quant-time (n, nb) so the kernel reads (1, N) rows
      mu:     (nb, n) offset per (block, out_feature)
      perm:   (K,) int32 visit-lane -> original in_feature; pad lanes -> m
      bias:   (n,) or None
      gather: optional PackedGather realizing ``perm`` as a packed one-hot
              MXU matmul (ops/gather.py); ``perm`` is retained regardless
              for fallback paths and artifact inspection.

    Static fold flags (set by quant/fold.py):
      input_folded — the producer's output lanes were permuted offline, so
              inputs arrive pre-gathered in visit order (perm still records
              the mapping for dequantization).
      out_folded — this layer's OUTPUT lanes were permuted to feed a
              downstream ``input_folded`` consumer; its dequantized weight
              rows are in the consumer's visit order (recover the order
              from the consumer's perm).
    """

    packed: jax.Array
    alpha: jax.Array
    mu: jax.Array
    perm: jax.Array
    bias: Optional[jax.Array]
    in_features: int  # static: original m (pre-padding)
    identity_perm: bool = False  # static: perm is [0..K) with pad->m tail
    gather: Optional[PackedGather] = None
    input_folded: bool = False  # static
    out_folded: bool = False  # static

    def tree_flatten(self):
        return (
            self.packed,
            self.alpha,
            self.mu,
            self.perm,
            self.bias,
            self.gather,
        ), (self.in_features, self.identity_perm, self.input_folded, self.out_folded)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            *children[:5],
            gather=children[5],
            in_features=aux[0],
            identity_perm=aux[1],
            input_folded=aux[2],
            out_folded=aux[3],
        )

    @property
    def block_size(self) -> int:
        # shape[-2]/[-1]: robust to a leading stacked-layers dim
        return (self.packed.shape[-2] * 4) // self.alpha.shape[-2]

    @property
    def out_features(self) -> int:
        return self.packed.shape[-1]

    def memory_footprint(self) -> dict:
        """Actual storage bytes by component (the reference's
        ``TernaryLinear.memory_footprint``, ref model.py:112-127 — except
        here the planes really are 2-bit packed, so the numbers reflect
        deployable HBM residency, not int8 staging)."""
        out = {
            "packed": self.packed.size * self.packed.dtype.itemsize,
            "scales": (self.alpha.size + self.mu.size) * self.alpha.dtype.itemsize,
            "perm": self.perm.size * self.perm.dtype.itemsize,
            "bias": 0 if self.bias is None else self.bias.size * self.bias.dtype.itemsize,
            "gather": 0
            if self.gather is None
            else self.gather.packed.size * self.gather.packed.dtype.itemsize,
        }
        out["total"] = sum(out.values())
        return out


def make_packed_linear(
    codes: jax.Array,  # (n, K) int8 in {-1,0,1}, visit order
    alpha: jax.Array,  # (nb, n)
    mu: jax.Array,  # (nb, n)
    perm: jax.Array,  # (K,)
    bias: Optional[jax.Array],
    in_features: int,
    block_size: int,
    scale_dtype=jnp.bfloat16,
    block_multiple: int = 16,
) -> PackedTernaryLinear:
    """Pack codes + scales into the inference layout.

    The scale-block count is padded to a multiple of ``block_multiple``:
    Mosaic requires scale-tile sublane dims divisible by 8, and 16 gives the
    kernel a 16-block step size even for awkward counts (nb=86 -> 96 instead
    of 88, halving the k-grid). Pad blocks get zero alpha/mu — which
    neutralizes whatever their codes decode to — and their perm lanes point
    at the zero activation slot (index m).
    """
    from ..core.packing import pack_ternary

    nb = alpha.shape[0]
    nbp = -(-nb // block_multiple) * block_multiple
    pad_blocks = nbp - nb
    if pad_blocks:
        n, K = codes.shape
        codes = jnp.pad(codes, ((0, 0), (0, pad_blocks * block_size)))
        alpha = jnp.pad(alpha, ((0, pad_blocks), (0, 0)))
        mu = jnp.pad(mu, ((0, pad_blocks), (0, 0)))
        perm = jnp.pad(
            perm, (0, pad_blocks * block_size), constant_values=in_features
        )
    packed = pack_ternary(codes, block_size=block_size)
    # Static fast-path flag: a pure [0..m) + pad-slot permutation lets the
    # apply skip the runtime activation gather (a zero pad to lane count
    # suffices). Checked on the host at pack time.
    K = int(perm.shape[0])
    perm_np = np.asarray(perm)
    identity = bool(
        (perm_np[: in_features] == np.arange(in_features)).all()
        and (perm_np[in_features:] == in_features).all()
    )
    return PackedTernaryLinear(
        packed=packed,
        alpha=alpha.astype(scale_dtype),
        mu=mu.astype(scale_dtype),
        perm=perm.astype(jnp.int32),
        bias=bias,
        in_features=in_features,
        identity_perm=identity,
    )


def pack_layer(
    q: TernaryLayerQuant,
    in_features: int,
    bias: Optional[jax.Array] = None,
    scale_dtype=jnp.bfloat16,
) -> PackedTernaryLinear:
    """Freeze a quant-engine result into the packed inference layout.

    Invalid lanes already carry T == 0 and perm == m (quant/gptq.py), so no
    masking is needed here: T=0 kills the alpha term and perm==m routes the
    mu-offset gather to the zero-padded activation slot.
    """
    return make_packed_linear(
        codes=q.T,
        alpha=q.alpha.T,
        mu=q.mu.T,
        perm=q.perm,
        bias=bias,
        in_features=in_features,
        block_size=q.block_size,
        scale_dtype=scale_dtype,
    )


FUSED_GATHER = os.environ.get("PT2TPU_FUSED_GATHER", "0") == "1"
"""Use the fused SSR-gather + matmul kernel when a packed gather is
attached (one pallas call instead of two). Off by default: once its
reduction was made hardware-correct (per-i-tile accumulator scratch — see
pallas_ternary._make_gather_kernel), the fused path measured 120.7 tok/s
batch-1 vs 149.1 for the two-step path on the 7B SSR layout (the scratch
read-modify-write per k-step eats the saved gather-kernel launch + xg HBM
round trip). Kept opt-in (PT2TPU_FUSED_GATHER=1) for future kernels;
:func:`verify_fused_gather` probes the real backend once and flips this
off on compile failure or mismatch (bench.py calls it before measuring)."""


def verify_fused_gather(verbose: bool = True) -> bool:
    """On-accelerator self-check of the fused gather+matmul kernel vs the
    two-step path; disables FUSED_GATHER on failure. Returns the flag."""
    global FUSED_GATHER
    import sys

    import numpy as np

    if jax.default_backend() == "cpu" or not FUSED_GATHER:
        return FUSED_GATHER
    try:
        from ..utils.randmodel import random_ternary_linear
        from .kernels.pallas_ternary import (
            ternary_matmul_pallas,
            ternary_matmul_pallas_gathered,
        )

        # tile_n=128 / blocks_per_step=8 force a 4-output-tile x 2-k-step
        # grid: the reduction must survive NON-consecutive output revisits
        # (the on-chip failure mode hidden by single-tile shapes — a
        # single-tile probe here passed while 7B qkv/gateup were broken).
        p = random_ternary_linear(
            jax.random.PRNGKey(0), 512, 2048, perm_mode="ssr"
        )
        x = jax.random.normal(
            jax.random.PRNGKey(1), (4, 2048), jnp.bfloat16
        )
        xg = gather_apply(p.gather, x, impl="pallas")
        want = np.asarray(ternary_matmul_pallas(
            jnp.asarray(xg, jnp.bfloat16), p.packed, p.alpha, p.mu,
            block_size=128,
        ))
        got = np.asarray(ternary_matmul_pallas_gathered(
            x, p.gather.packed, p.packed, p.alpha, p.mu, block_size=128,
            tile_n=128, blocks_per_step=8,
        ))
        rel = float(
            np.linalg.norm(got - want)
            / max(float(np.linalg.norm(want)), 1e-9)
        )
        if rel > 1e-4:
            raise AssertionError(f"fused gather mismatch: rel {rel:.2e}")
    except Exception as e:  # compile failure or mismatch: fall back
        FUSED_GATHER = False
        if verbose:
            print(
                f"fused gather+matmul disabled ({type(e).__name__}: {e}); "
                "falling back to the two-step path",
                file=sys.stderr,
            )
    return FUSED_GATHER


IGATHER_FUSED = os.environ.get("PT2TPU_IGATHER_FUSED", "1") == "1"
"""Fuse the SSR input gather into the projection matmul as an in-kernel
iota one-hot prologue (`ternary_matmul_pallas_igathered*`) on decode-size
row counts — one pallas call instead of two and no gathered-x HBM round
trip. Unlike the retired packed-G fused kernel (FUSED_GATHER, default off)
this keeps the safe consecutive-revisit accumulation order and streams no
one-hot planes. `verify_igather_fused` probes the real backend once and
flips this off on compile failure or mismatch."""


def verify_igather_fused(verbose: bool = True) -> bool:
    """On-accelerator self-check of the fused iota-gather matmul vs the
    two-step path; disables IGATHER_FUSED on failure. Returns the flag."""
    global IGATHER_FUSED
    import sys

    if jax.default_backend() == "cpu" or not IGATHER_FUSED:
        return IGATHER_FUSED
    try:
        from ..utils.randmodel import random_ternary_linear
        from .kernels.pallas_ternary import (
            ternary_matmul_pallas,
            ternary_matmul_pallas_igathered,
        )

        # Force a multi-output-tile, multi-j grid (tile_n=128, bps=8):
        # accumulation must survive the revisit pattern.
        p = random_ternary_linear(
            jax.random.PRNGKey(0), 2048, 512, perm_mode="ssr"
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.bfloat16)
        xg = gather_apply(p.gather, x, impl="pallas")
        for a8 in (False, True):
            want = np.asarray(ternary_matmul_pallas(
                jnp.asarray(xg, jnp.bfloat16), p.packed, p.alpha, p.mu,
                block_size=128, a8=a8,
            ))
            got = np.asarray(ternary_matmul_pallas_igathered(
                x, p.perm, p.packed, p.alpha, p.mu, block_size=128,
                tile_n=128, blocks_per_step=8, a8=a8,
            ))
            rel = float(
                np.linalg.norm(got - want)
                / max(float(np.linalg.norm(want)), 1e-9)
            )
            if rel > 1e-4:
                raise AssertionError(
                    f"igather fused mismatch (a8={a8}): rel {rel:.2e}"
                )
    except Exception as e:  # compile failure or mismatch: fall back
        IGATHER_FUSED = False
        if verbose:
            print(
                f"fused iota-gather matmul disabled ({type(e).__name__}: "
                f"{e}); falling back to the two-step path",
                file=sys.stderr,
            )
    return IGATHER_FUSED


FUSED_MLP = os.environ.get("PT2TPU_FUSED_MLP", "1") == "1"
"""Run the whole MLP (SSR gather -> gateup -> act*mul -> down) as ONE pallas
call (`ops.kernels.pallas_ternary.ternary_mlp_pallas*`) on decode-size row
counts. The (B, 2I) gateup output and (B, I) mid never touch HBM and two of
the per-layer kernel launches disappear. `verify_fused_mlp` probes the real
backend once and flips this off on compile failure or mismatch."""


def fused_mlp_ok(gu, dn, impl: str, rows: int) -> bool:
    """Static routing predicate for the fused MLP kernel (decoder MLP
    section). All conditions are trace-time static."""
    if not FUSED_MLP or impl not in ("auto",):
        return False
    if jax.default_backend() != "tpu":
        return False
    if not isinstance(gu, PackedTernaryLinear) or not isinstance(
        dn, PackedTernaryLinear
    ):
        return False
    if rows > 64:  # prefill rows: MXU-bound, keep the wide two-call path
        return False
    if gu.bias is not None or dn.bias is not None:
        return False
    if not dn.input_folded:
        return False
    if not (gu.gather is not None or gu.identity_perm or gu.input_folded):
        return False
    I = dn.in_features
    bs = 128
    if I % bs != 0 or dn.out_features % 128 != 0:
        return False
    if gu.out_features not in (2 * I, I):
        return False
    if gu.block_size != bs or dn.block_size != bs:
        return False
    if gu.identity_perm or gu.input_folded:
        # identity path requires x's padded width == gather lane count
        K = gu.packed.shape[-2] * 4
        if -(-gu.in_features // 128) * 128 != K:
            return False
    return True


def fused_mlp_apply(
    gu: PackedTernaryLinear,
    dn: PackedTernaryLinear,
    x: jax.Array,
    act: str,
    layer_idx=None,
    out_dtype=None,
    impl: str = "auto",
) -> jax.Array:
    """One-call MLP: (..., m) -> (..., n). Caller must have checked
    :func:`fused_mlp_ok`. ``impl`` only distinguishes the floor8 probe —
    the production W2A8 mode keeps the megakernel's bf16 telescoped dots
    (activation re-quantization between gateup and down would compound)."""
    from .kernels.pallas_ternary import (
        ternary_mlp_pallas,
        ternary_mlp_pallas_stacked,
    )

    a8 = "floor" if impl == "floor8" else False
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    I = dn.in_features
    has_gather = not (gu.identity_perm or gu.input_folded)
    if layer_idx is not None and gu.packed.ndim == 3:
        perm = gu.perm if has_gather else None
        out = ternary_mlp_pallas_stacked(
            x2, perm, gu.packed, gu.alpha, gu.mu,
            dn.packed, dn.alpha, dn.mu, layer_idx,
            act=act, intermediate=I, a8=a8,
        )
    else:
        perm = gu.perm if has_gather else None
        out = ternary_mlp_pallas(
            x2, perm, gu.packed, gu.alpha, gu.mu,
            dn.packed, dn.alpha, dn.mu,
            act=act, intermediate=I, a8=a8,
        )
    return out.astype(out_dtype).reshape(*lead, dn.out_features)


def verify_fused_mlp(verbose: bool = True) -> bool:
    """On-accelerator self-check of the fused MLP kernel vs the two-call
    path; disables FUSED_MLP on failure. Returns the flag."""
    global FUSED_MLP
    import sys

    if jax.default_backend() == "cpu" or not FUSED_MLP:
        return FUSED_MLP
    try:
        from ..quant import fold as foldmod
        from ..utils.randmodel import random_ternary_linear

        class _Cfg:
            gated_mlp = True

        D, I, n = 512, 1408, 512  # I -> 11 valid blocks inside 16 padded
        lp = foldmod.fold_layer_perms(_Cfg(), {
            "gateup": random_ternary_linear(
                jax.random.PRNGKey(0), 2 * I, D, perm_mode="ssr"
            ),
            "down": random_ternary_linear(
                jax.random.PRNGKey(1), n, I, perm_mode="ssr"
            ),
        })
        gu, dn = lp["gateup"], lp["down"]
        if not fused_mlp_ok(gu, dn, "auto", 4):
            raise AssertionError("fused_mlp_ok rejected the probe layer")
        x = jax.random.normal(jax.random.PRNGKey(2), (4, D), jnp.bfloat16)
        guo = ternary_linear_apply(gu, x, out_dtype=jnp.float32)
        mid = (jax.nn.silu(guo[..., :I]) * guo[..., I:]).astype(jnp.bfloat16)
        want = np.asarray(ternary_linear_apply(dn, mid, out_dtype=jnp.float32))
        got = np.asarray(
            fused_mlp_apply(gu, dn, x, "silu", out_dtype=jnp.float32)
        )
        rel = float(
            np.linalg.norm(got - want)
            / max(float(np.linalg.norm(want)), 1e-9)
        )
        if rel > 5e-3:  # two-call rounds mid through bf16; fused keeps f32
            raise AssertionError(f"fused MLP mismatch: rel {rel:.2e}")
    except Exception as e:  # compile failure or mismatch: fall back
        FUSED_MLP = False
        if verbose:
            print(
                f"fused MLP disabled ({type(e).__name__}: {e}); "
                "falling back to the two-call path",
                file=sys.stderr,
            )
    return FUSED_MLP


def _input_lanes(
    p: PackedTernaryLinear,
    x2: jax.Array,  # (B, m)
    K: int,
    impl: str,
    layer_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Present activations in visit-lane order (B, K) — fold / MXU gather /
    index gather, in that preference order (see class docstring)."""
    m = x2.shape[-1]
    if p.identity_perm or p.input_folded:
        return x2 if K == m else jnp.pad(x2, ((0, 0), (0, K - m)))
    if p.gather is not None:
        return gather_apply(p.gather, x2, impl, layer_idx)
    perm = p.perm if layer_idx is None else p.perm[layer_idx]
    return apply_input_perm(x2, perm, m)


@functools.partial(jax.jit, static_argnames=("block_size",))
def ternary_matmul_xla(
    x: jax.Array,
    packed: jax.Array,
    alpha: jax.Array,
    mu: jax.Array,
    *,
    block_size: int = 128,
) -> jax.Array:
    """XLA reference: out = x @ (alpha ∘ T + mu broadcast), blockwise.

    Args:
      x:      (B, K) activations already in visit-lane order.
      packed: (K//4, n) int8 planes.
      alpha/mu: (nb, n).

    Returns (B, n) in float32.
    """
    K4, n = packed.shape
    K = K4 * 4
    nb = K // block_size
    B = x.shape[0]

    # bf16 feeds the MXU on TPU; CPU XLA lacks bf16xbf16->f32 dots, so fall
    # back to f32 there (tests run on the virtual CPU mesh).
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    T = unpack_ternary(packed, block_size=block_size)  # (K, n) int8
    Tb = T.reshape(nb, block_size, n).astype(cdt)
    xb = x.reshape(B, nb, block_size).astype(cdt)

    # Per-block code matmul on the MXU, then scale application.
    t = jnp.einsum("bkc,kcn->bkn", xb, Tb, preferred_element_type=jnp.float32)
    s = jnp.sum(xb.astype(jnp.float32), axis=2)  # (B, nb)
    out = jnp.einsum("bkn,kn->bn", t, alpha.astype(jnp.float32))
    out = out + jnp.einsum("bk,kn->bn", s, mu.astype(jnp.float32))
    return out


def ternary_matmul_xla_a8(
    x: jax.Array,
    packed: jax.Array,
    alpha: jax.Array,
    mu: jax.Array,
    *,
    block_size: int = 128,
) -> jax.Array:
    """XLA emulation of the pallas kernel's W2A8 semantics for non-TPU
    backends (the CLI ``--a8`` quality gate must run on the CPU backend —
    pallas has no compiled CPU path). Matches the kernel's quantization
    exactly: per-row absmax bf16 normalization, round-to-int8 activations,
    integer dots (a 4096-term dot of |v|<=254 integers stays below 2^24, so
    f32 accumulation is exact), output rescale by the row scale.
    """
    from .kernels.pallas_ternary import normalize_rows_a8

    xn, sx = normalize_rows_a8(x)  # bf16 x_norm (kernel operand), f32 sx
    xq = jnp.clip(jnp.round(xn.astype(jnp.float32)), -127, 127)
    return ternary_matmul_xla(xq, packed, alpha, mu, block_size=block_size) * sx



def _a8_flag(impl: str):
    """Kernel a8 mode from the impl string: True (W2A8), False (bf16), or
    the WRONG-MATH "floor" sentinel (impl="floor8": skip the in-kernel
    unpack and dot the raw packed planes — the end-to-end DMA+dots floor
    probe of scripts/floor_ab.py; outputs are garbage by design)."""
    return "floor" if impl == "floor8" else impl == "a8"

def ternary_linear_apply_stacked(
    p: PackedTernaryLinear,
    x: jax.Array,
    layer_idx: jax.Array,
    impl: str = "auto",
    out_dtype=None,
) -> jax.Array:
    """Layer-indexed apply for scan-over-layers loops: ``p``'s arrays carry a
    leading ``n_layers`` dim and stay UNSLICED — the pallas kernel selects
    layer ``layer_idx``'s blocks via scalar prefetch (slicing a stacked
    array for an opaque pallas operand inside scan materializes an HBM copy
    of the whole layer's weights every step)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    m = x.shape[-1]
    if m != p.in_features:
        raise ValueError(f"input features {m} != layer in_features {p.in_features}")
    x2 = x.reshape(-1, m)
    L, K4, n = p.packed.shape
    K = K4 * 4
    bs = K4 * 4 // p.alpha.shape[-2]
    on_tpu = jax.default_backend() == "tpu"
    # "a8" forces the pallas kernel only on TPU; elsewhere it routes to the
    # XLA emulation below (same quantization semantics, no pallas CPU path).
    use_pallas = impl == "pallas" or (impl in ("a8", "floor8") and on_tpu) or (
        impl == "auto" and on_tpu and bs % 128 == 0 and n % 128 == 0
    )
    if (use_pallas and p.gather is not None and x2.shape[0] <= 64
            and not (p.identity_perm or p.input_folded)):
        # Fused SSR gather: one pallas call instead of two, no gathered-x
        # HBM round trip. Decode-size rows only (prefill is MXU-bound and
        # takes the wide two-step path). Preferred kernel: the iota
        # prologue + safe-grid variant; the retired packed-G variant stays
        # reachable via PT2TPU_FUSED_GATHER=1 for comparison runs.
        if IGATHER_FUSED:
            from .kernels.pallas_ternary import (
                ternary_matmul_pallas_igathered_stacked,
            )

            out = ternary_matmul_pallas_igathered_stacked(
                x2, p.perm, p.packed, p.alpha, p.mu, layer_idx,
                block_size=bs, a8=_a8_flag(impl),
            )
            if p.bias is not None:
                out = out + p.bias[layer_idx].astype(out.dtype)
            return out.astype(out_dtype).reshape(*lead, n)
        if FUSED_GATHER:
            from .kernels.pallas_ternary import (
                ternary_matmul_pallas_gathered_stacked,
            )

            out = ternary_matmul_pallas_gathered_stacked(
                x2, p.gather.packed, p.packed, p.alpha, p.mu, layer_idx,
                block_size=bs, a8=_a8_flag(impl),
            )
            if p.bias is not None:
                out = out + p.bias[layer_idx].astype(out.dtype)
            return out.astype(out_dtype).reshape(*lead, n)
    xk = _input_lanes(p, x2, K, impl, layer_idx)
    if use_pallas:
        from .kernels.pallas_ternary import ternary_matmul_pallas_stacked

        out = ternary_matmul_pallas_stacked(
            xk, p.packed, p.alpha, p.mu, layer_idx, block_size=bs,
            a8=_a8_flag(impl),
        )
    else:
        xla_fn = ternary_matmul_xla_a8 if impl == "a8" else ternary_matmul_xla
        out = xla_fn(
            xk, p.packed[layer_idx], p.alpha[layer_idx], p.mu[layer_idx],
            block_size=bs,
        )
    if p.bias is not None:
        out = out + p.bias[layer_idx].astype(out.dtype)
    return out.astype(out_dtype).reshape(*lead, n)


def ternary_linear_apply(
    p: PackedTernaryLinear,
    x: jax.Array,
    impl: str = "auto",
    out_dtype=None,
) -> jax.Array:
    """Full layer: perm gather -> packed matmul -> bias. (..., m) -> (..., n).

    impl: "xla", "pallas", or "auto" (pallas on TPU when shapes qualify).
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    m = x.shape[-1]
    if m != p.in_features:
        raise ValueError(f"input features {m} != layer in_features {p.in_features}")
    x2 = x.reshape(-1, m)
    K = p.packed.shape[0] * 4

    bs = p.block_size
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = impl == "pallas" or (impl in ("a8", "floor8") and on_tpu) or (
        impl == "auto"
        and on_tpu
        and bs % 128 == 0
        and p.out_features % 128 == 0
    )
    if (use_pallas and p.gather is not None and x2.shape[0] <= 64
            and not (p.identity_perm or p.input_folded)):
        # Decode-size rows only — see ternary_linear_apply_stacked.
        if IGATHER_FUSED:
            from .kernels.pallas_ternary import (
                ternary_matmul_pallas_igathered,
            )

            out = ternary_matmul_pallas_igathered(
                x2, p.perm, p.packed, p.alpha, p.mu, block_size=bs,
                a8=_a8_flag(impl),
            )
            if p.bias is not None:
                out = out + p.bias.astype(out.dtype)
            return out.astype(out_dtype).reshape(*lead, p.out_features)
        if FUSED_GATHER:
            from .kernels.pallas_ternary import ternary_matmul_pallas_gathered

            out = ternary_matmul_pallas_gathered(
                x2, p.gather.packed, p.packed, p.alpha, p.mu, block_size=bs,
                a8=_a8_flag(impl),
            )
            if p.bias is not None:
                out = out + p.bias.astype(out.dtype)
            return out.astype(out_dtype).reshape(*lead, p.out_features)
    xk = _input_lanes(p, x2, K, impl)  # (B, K)
    if use_pallas:
        from .kernels.pallas_ternary import ternary_matmul_pallas

        out = ternary_matmul_pallas(
            xk, p.packed, p.alpha, p.mu, block_size=bs, a8=_a8_flag(impl)
        )
    elif impl == "a8":
        out = ternary_matmul_xla_a8(xk, p.packed, p.alpha, p.mu, block_size=bs)
    else:
        out = ternary_matmul_xla(xk, p.packed, p.alpha, p.mu, block_size=bs)

    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.astype(out_dtype).reshape(*lead, p.out_features)
