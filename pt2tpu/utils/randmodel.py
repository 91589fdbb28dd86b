"""Construct random ternary-quantized model params directly (no GPTQ pass).

Used by benchmarks, the graft entry point, and sharding tests: builds
``PackedTernaryLinear`` leaves with random packed codes and plausible
scales, exactly the storage/compute shape of a real quantized model without
paying for calibration.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models.common import DenseLinear
from ..ops.ternary_matmul import PackedTernaryLinear

__all__ = ["random_ternary_linear", "random_ternary_params"]


def random_ternary_linear(
    key,
    out_features: int,
    in_features: int,
    block_size: int = 128,
    bias: bool = False,
    scale_dtype=jnp.bfloat16,
    perm_mode: str = "identity",  # "identity" | "ssr" | "folded"
) -> PackedTernaryLinear:
    """``perm_mode`` mimics the inference cost profile of a real model:
    "ssr" draws a random permutation and attaches the packed one-hot MXU
    gather (what quant/fold.py emits for qkv/o/gateup); "folded" marks the
    layer input_folded (what fold emits for down — producer lanes permuted
    offline, zero runtime cost)."""
    bs = min(block_size, in_features)
    while in_features % bs != 0 and bs > 4:
        bs //= 2
    nb = in_features // bs
    K = nb * bs
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codes = jax.random.randint(k1, (out_features, K), -1, 2, dtype=jnp.int8)
    scale = 1.0 / math.sqrt(in_features)
    alpha = scale * (0.8 + 0.4 * jax.random.uniform(k2, (nb, out_features)))
    mu = 0.02 * scale * jax.random.normal(k3, (nb, out_features))
    from ..ops.ternary_matmul import make_packed_linear

    if perm_mode == "ssr":
        perm = jax.random.permutation(k4, in_features).astype(jnp.int32)
        perm = jnp.pad(perm, (0, K - in_features), constant_values=in_features)
    else:
        perm = jnp.arange(K, dtype=jnp.int32)
    p = make_packed_linear(
        codes=codes,
        alpha=alpha,
        mu=mu,
        perm=perm,
        bias=jnp.zeros((out_features,), jnp.float32) if bias else None,
        in_features=in_features,
        block_size=bs,
        scale_dtype=scale_dtype,
    )
    if perm_mode == "ssr":
        import dataclasses

        from ..ops.gather import make_packed_gather

        p = dataclasses.replace(
            p, gather=make_packed_gather(p.perm, in_features), identity_perm=False
        )
    elif perm_mode == "folded":
        import dataclasses

        p = dataclasses.replace(p, input_folded=True)
    return p


def default_perm_mode(cfg) -> str:
    """The perm layout quant.pipeline's default ssr_scope='auto' emits for
    this model width (mirrors resolve_ssr_skip's dim-640 threshold)."""
    return "down" if cfg.dim >= 640 else "ssr"


def random_ternary_params(
    cfg: dec.ModelConfig,
    key,
    dtype=jnp.bfloat16,
    block_size: int = 128,
    scale_dtype=jnp.bfloat16,
    fused: bool = True,
    perm_mode: str = "identity",  # "identity" | "ssr" | "down"
    ternary_lm_head: bool = False,
):
    """Full decoder params with every projection pre-ternarized.

    ``fused=True`` emits the production layout (fused qkv / gate+up
    containers — 4 kernel calls per layer); ``fused=False`` the
    per-projection layout.

    ``perm_mode="ssr"`` reproduces the post-fold layout of a real
    full-SSR-quantized model (quant/fold.py): qkv/o/gateup carry packed
    one-hot MXU gathers, down is input_folded. ``perm_mode="down"``
    reproduces what the pipeline's default ssr_scope="auto" emits at
    dim >= 640 (RESULTS round 5: quality-free there): SSR only on down
    (input_folded, zero runtime cost), identity perms elsewhere — the
    gather-free serving layout.

    Builds the non-projection parts directly instead of going through
    ``init_params`` — a 7B dense init would materialize ~13.4 GB of bf16
    projection weights on device just to throw them away (OOMs next to the
    packed model on a 16 GB chip).
    """
    H, Hkv, hd, D, I = cfg.n_heads, cfg.kv_heads, cfg.hd, cfg.dim, cfg.intermediate
    k_emb, k_pos, k_head, key = jax.random.split(key, 4)
    ln_b = jnp.zeros((D,), dtype) if cfg.norm == "layernorm" else None
    params = {
        "embed": jax.random.normal(k_emb, (cfg.vocab_size, D)).astype(dtype) * 0.02,
        "emb_ln_w": jnp.ones((D,), dtype) if cfg.embed_norm else None,
        "emb_ln_b": (
            jnp.zeros((D,), dtype)
            if (cfg.embed_norm and cfg.norm == "layernorm")
            else None
        ),
        "pos_embed": (
            jax.random.normal(
                k_pos, (cfg.max_seq_len + cfg.pos_offset, D)
            ).astype(dtype) * 0.02
            if cfg.pos == "learned"
            else None
        ),
        "lnf_w": jnp.ones((D,), dtype),
        "lnf_b": ln_b,
        "lm_head": (
            None
            if cfg.tie_embeddings
            else (
                random_ternary_linear(
                    k_head,
                    cfg.vocab_size,
                    D,
                    block_size,
                    False,
                    scale_dtype,
                    perm_mode="ssr" if perm_mode == "ssr" else "identity",
                )
                if ternary_lm_head and cfg.vocab_size % 128 == 0
                else DenseLinear(
                    w=(jax.random.normal(k_head, (cfg.vocab_size, D)) / D**0.5).astype(dtype),
                    b=None,
                )
            )
        ),
    }

    def base_layer():
        lp = {
            "ln1_w": jnp.ones((D,), dtype),
            "ln1_b": ln_b,
            "ln2_w": jnp.ones((D,), dtype),
            "ln2_b": ln_b,
        }
        lp["q_norm_w"] = jnp.ones((hd,), dtype) if cfg.qk_norm else None
        lp["k_norm_w"] = jnp.ones((hd,), dtype) if cfg.qk_norm else None
        lp["post_attn_w"] = jnp.ones((D,), dtype) if cfg.sandwich_norm else None
        lp["post_mlp_w"] = jnp.ones((D,), dtype) if cfg.sandwich_norm else None
        return lp
    qbias = cfg.linear_bias or cfg.qkv_bias
    if fused:
        shapes = {
            "qkv": ((H + 2 * Hkv) * hd, D, qbias),
            "o": (D, H * hd, cfg.linear_bias),
            "down": (D, I, cfg.linear_bias),
        }
        if cfg.gated_mlp:
            shapes["gateup"] = (2 * I, D, cfg.linear_bias)
        else:
            shapes["up"] = (I, D, cfg.linear_bias)
    else:
        shapes = {
            "q": (H * hd, D, qbias),
            "k": (Hkv * hd, D, qbias),
            "v": (Hkv * hd, D, qbias),
            "o": (D, H * hd, cfg.linear_bias),
            "up": (I, D, cfg.linear_bias),
            "down": (D, I, cfg.linear_bias),
        }
        if cfg.gated_mlp:
            shapes["gate"] = (I, D, cfg.linear_bias)

    layers = []
    keys = jax.random.split(key, cfg.n_layers)
    for li in range(cfg.n_layers):
        lkeys = jax.random.split(keys[li], len(shapes))
        lp = base_layer()
        for (name, (o, i, has_bias)), lk in zip(sorted(shapes.items()), lkeys):
            pm = "identity"
            if perm_mode == "ssr":
                pm = "folded" if name == "down" else "ssr"
            elif perm_mode == "down":
                pm = "folded" if name == "down" else "identity"
            lp[name] = random_ternary_linear(
                lk, o, i, block_size, has_bias, scale_dtype, perm_mode=pm
            )
        if not fused and not cfg.gated_mlp:
            lp["gate"] = None
        layers.append(lp)
    from ..quant.fold import pad_gateup_blocks

    layers = [pad_gateup_blocks(lp) for lp in layers]
    params["layers"] = dec.stack_layers(layers)
    return params
