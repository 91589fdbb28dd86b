"""Unified functional decoder-only transformer (Llama / Qwen / OPT / GPT-2…).

One parameterized implementation replaces the reference's per-architecture
HuggingFace dispatch (ref model.py:139-159 walks ``model.model.layers`` /
``model.model.decoder.layers`` / ``transformer.h`` by family). Family
differences are config switches (norm type, position encoding, gated vs
plain MLP, biases, activation), so every family shares one quantization
recipe, one serving path, one sharding rule set.

Design points (TPU-first):

  * Layer parameters are **stacked** along a leading ``n_layers`` axis and
    the forward is a ``lax.scan`` over them — one compiled layer body
    regardless of depth (compile time through the axon tunnel is ~30 s per
    program; a 32-layer unrolled graph would be minutes).
  * Activation taps (the inputs the reference captures with forward hooks,
    ref main.py:261-287) are explicit outputs of ``layer_forward`` — the
    calibration driver slices one layer's params and asks for taps, no
    mutation or hooks anywhere.
  * Quantization is a pytree transformation: any :class:`DenseLinear` leaf
    can be replaced by a :class:`PackedTernaryLinear`; the forward dispatches
    structurally (models/common.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ternary_matmul import (
    PackedTernaryLinear,
    ternary_linear_apply_stacked,
)
from .common import (
    DenseLinear,
    alibi_bias,
    apply_linear,
    apply_rope,
    attention,
    causal_mask,
    layer_norm,
    rms_norm,
    rope_tables,
)

__all__ = [
    "ModelConfig",
    "build_mask",
    "pos_tables",
    "sliding_adjust",
    "layer_view",
    "init_params",
    "forward",
    "layer_forward",
    "layer_slice",
    "stack_layers",
    "num_layer_linears",
    "LINEAR_NAMES",
    "TAP_OF_LINEAR",
]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters spanning the supported families."""

    family: str  # "llama" | "llama2" | "llama3" | "qwen" | "opt" | "gpt2" | ...
    vocab_size: int
    dim: int
    n_layers: int
    n_heads: int
    intermediate: int
    n_kv_heads: Optional[int] = None  # None -> n_heads (MHA)
    head_dim: Optional[int] = None  # None -> dim // n_heads
    max_seq_len: int = 2048
    norm: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    norm_eps: float = 1e-5
    pos: str = "rope"  # "rope" | "learned" | "alibi"
    rope_theta: float = 10000.0
    pos_offset: int = 0  # OPT's learned-position offset (2)
    act: str = "silu"  # "silu" | "gelu" | "relu"
    gated_mlp: bool = True  # SwiGLU-style gate*up vs plain fc
    linear_bias: bool = False  # biases on q/k/v/o/mlp projections
    qkv_bias: bool = False  # qwen-style: bias on q/k/v only
    tie_embeddings: bool = False
    embed_scale: float = 1.0  # gemma multiplies embeddings by sqrt(dim)
    norm_plus_one: bool = False  # gemma rmsnorm uses (1 + weight)
    embed_norm: bool = False  # bloom layernorms the embeddings
    # --- gemma2 / gemma3 / qwen3 extensions -----------------------------
    qk_norm: bool = False  # per-head RMSNorm on q/k before RoPE (qwen3, gemma3)
    sandwich_norm: bool = False  # gemma2/3 post-attn / post-mlp norms
    sliding_window: int = 0  # 0 = all-global attention
    # per-layer attention kind when sliding_window > 0: True = full/global,
    # False = sliding. Hashable tuple (cfg is a static jit argument).
    layer_globals: Optional[Tuple[bool, ...]] = None
    rope_local_theta: Optional[float] = None  # RoPE base for sliding layers
    rope_scale: float = 1.0  # linear rope scaling on the global tables
    # llama-3.1 rope warping (factor, low_ff, high_ff, original_max_len)
    rope_llama3: Optional[Tuple[float, float, float, int]] = None
    attn_scale: Optional[float] = None  # query scaling override
    attn_softcap: float = 0.0  # gemma2 attention logit softcap
    final_softcap: float = 0.0  # gemma2 final logit softcap
    # --- mixture-of-experts (mixtral / qwen3-moe) ------------------------
    # The reference supports dense linears only (ref model.py:162-171
    # discovers nn.Linear); MoE is new-framework scope (SURVEY.md §2.3 EP
    # row). n_experts > 0 replaces the MLP with top-k routed experts:
    # softmax router over n_experts, experts_per_token selected, their
    # outputs combined with (optionally re-normalized) router weights.
    n_experts: int = 0
    experts_per_token: int = 2
    moe_inter: Optional[int] = None  # expert FFN width; None -> intermediate
    norm_topk: bool = True  # renormalize top-k router probs (mixtral/qwen3)

    @property
    def is_moe(self) -> bool:
        return self.n_experts > 0

    @property
    def expert_inter(self) -> int:
        return self.moe_inter or self.intermediate

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def has_sliding(self) -> bool:
        return self.sliding_window > 0 and (
            self.layer_globals is None or not all(self.layer_globals)
        )

    def globals_list(self) -> Tuple[bool, ...]:
        """Per-layer is-global-attention flags (all True when no sliding)."""
        if not self.has_sliding:
            return (True,) * self.n_layers
        lg = self.layer_globals or (False,) * self.n_layers
        if len(lg) != self.n_layers:
            raise ValueError(
                f"layer_globals has {len(lg)} entries for {self.n_layers} layers"
            )
        return tuple(bool(g) for g in lg)

    @property
    def hd(self) -> int:
        return self.head_dim or self.dim // self.n_heads

    def with_(self, **kw) -> "ModelConfig":
        # Keep the per-layer attention-kind pattern congruent when a config
        # is shrunk/grown (tests cut models to 1-2 layers): cycle it.
        if (
            "n_layers" in kw
            and "layer_globals" not in kw
            and self.layer_globals is not None
        ):
            n = kw["n_layers"]
            lg = self.layer_globals
            kw["layer_globals"] = tuple(lg[i % len(lg)] for i in range(n))
        return dataclasses.replace(self, **kw)


# The seven quantizable projections per decoder layer (reference layer set:
# find_linear_layers over one transformer layer yields q/k/v/o + mlp projs,
# ref main.py:272). Maps linear name -> tap name whose activations feed it.
LINEAR_NAMES = ("q", "k", "v", "o", "gate", "up", "down")
TAP_OF_LINEAR = {
    "q": "attn_in",
    "k": "attn_in",
    "v": "attn_in",
    "o": "o_in",
    "gate": "mlp_in",
    "up": "mlp_in",
    "down": "down_in",
}


def num_layer_linears(cfg: ModelConfig) -> int:
    return 7 if cfg.gated_mlp else 6


def _act(cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if cfg.act == "silu":
        return jax.nn.silu(x)
    if cfg.act == "gelu":
        return jax.nn.gelu(x)
    if cfg.act == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation {cfg.act}")


def _norm(cfg: ModelConfig, x, w, b):
    if cfg.norm == "rmsnorm":
        if cfg.norm_plus_one:
            w = 1.0 + w.astype(jnp.float32)
        return rms_norm(x, w, cfg.norm_eps)
    return layer_norm(x, w, b, cfg.norm_eps)


def _head_norm(cfg: ModelConfig, x, w):
    """qk-norm: RMSNorm over head_dim of (B, L, H, hd) q/k (qwen3/gemma3)."""
    if cfg.norm_plus_one:
        w = 1.0 + w.astype(jnp.float32)
    return rms_norm(x, w, cfg.norm_eps)


def pos_tables(cfg: ModelConfig, max_len: int):
    """RoPE tables for all layer kinds: (cos, sin, cos_loc, sin_loc).

    The local pair is None unless the config uses a distinct RoPE base on
    sliding layers (gemma3: theta 1e6 + linear scaling globally, 1e4
    locally). All call sites (eval forward, generate, engine, calibration)
    share this so per-layer table selection stays consistent.
    """
    if cfg.pos != "rope":
        z = jnp.zeros((max_len, 1), jnp.float32)
        return z, z, None, None
    cos, sin = rope_tables(
        cfg.hd, max_len, cfg.rope_theta, cfg.rope_scale, cfg.rope_llama3
    )
    if cfg.rope_local_theta is None or not cfg.has_sliding:
        return cos, sin, None, None
    cos_l, sin_l = rope_tables(cfg.hd, max_len, cfg.rope_local_theta)
    return cos, sin, cos_l, sin_l


# ------------------------------------------------------------ params ----
def _init_linear(key, n_out, n_in, bias, dtype, scale=None):
    scale = scale if scale is not None else 1.0 / math.sqrt(n_in)
    w = jax.random.normal(key, (n_out, n_in), dtype=jnp.float32) * scale
    b = jnp.zeros((n_out,), jnp.float32) if bias else None
    return DenseLinear(
        w=w.astype(dtype), b=None if b is None else b.astype(dtype)
    )


def _init_layer(cfg: ModelConfig, key, dtype):
    D, I = cfg.dim, cfg.intermediate
    H, Hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    keys = jax.random.split(key, 8)
    ln_b = jnp.zeros((D,), dtype) if cfg.norm == "layernorm" else None
    qb = cfg.linear_bias or cfg.qkv_bias
    layer = {
        "ln1_w": jnp.ones((D,), dtype),
        "ln1_b": ln_b,
        "q": _init_linear(keys[0], H * hd, D, qb, dtype),
        "k": _init_linear(keys[1], Hkv * hd, D, qb, dtype),
        "v": _init_linear(keys[2], Hkv * hd, D, qb, dtype),
        "o": _init_linear(keys[3], D, H * hd, cfg.linear_bias, dtype),
        "ln2_w": jnp.ones((D,), dtype),
        "ln2_b": ln_b,
    }
    if cfg.is_moe:
        # Routed experts: stacked (E, out, in) dense weights + a router.
        # Experts carry no bias (mixtral / qwen3-moe convention).
        E, Ie = cfg.n_experts, cfg.expert_inter
        ek = jax.random.split(keys[7], 4)
        scale = 1.0 / math.sqrt(D)
        layer["router"] = _init_linear(ek[0], E, D, False, dtype)
        layer["gate"] = DenseLinear(
            w=(jax.random.normal(ek[1], (E, Ie, D)) * scale).astype(dtype)
        )
        layer["up"] = DenseLinear(
            w=(jax.random.normal(ek[2], (E, Ie, D)) * scale).astype(dtype)
        )
        layer["down"] = DenseLinear(
            w=(
                jax.random.normal(ek[3], (E, D, Ie)) / math.sqrt(Ie)
            ).astype(dtype)
        )
    else:
        layer["router"] = None
        layer["up"] = _init_linear(keys[5], I, D, cfg.linear_bias, dtype)
        layer["down"] = _init_linear(keys[6], D, I, cfg.linear_bias, dtype)
        layer["gate"] = (
            _init_linear(keys[4], I, D, cfg.linear_bias, dtype)
            if cfg.gated_mlp
            else None
        )
    if cfg.qk_norm:
        layer["q_norm_w"] = jnp.ones((hd,), dtype)
        layer["k_norm_w"] = jnp.ones((hd,), dtype)
    else:
        layer["q_norm_w"] = layer["k_norm_w"] = None
    if cfg.sandwich_norm:
        layer["post_attn_w"] = jnp.ones((D,), dtype)
        layer["post_mlp_w"] = jnp.ones((D,), dtype)
    else:
        layer["post_attn_w"] = layer["post_mlp_w"] = None
    return layer


def stack_layers(layers):
    """List of per-layer pytrees -> one pytree with leading n_layers axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def layer_slice(stacked, i: int):
    """Extract layer i's pytree from the stacked representation."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def layer_view(stacked, li):
    """Per-layer view for scan bodies: slice small leaves (norms, dense
    weights, biases) but keep stacked PackedTernaryLinear leaves WHOLE —
    their layer is selected inside the pallas kernel via scalar prefetch,
    avoiding an HBM copy of the packed planes every scan step."""
    from ..ops.ternary_matmul import PackedTernaryLinear

    out = {}
    for k, v in stacked.items():
        if v is None:
            out[k] = None
        elif isinstance(v, PackedTernaryLinear):
            out[k] = v  # stacked; consumed with layer_idx
        elif isinstance(v, DenseLinear):
            out[k] = DenseLinear(
                w=v.w[li], b=None if v.b is None else v.b[li]
            )
        else:
            out[k] = v[li]
    return out


def set_layer(stacked, i: int, layer):
    """Return stacked params with layer i replaced (pure)."""
    return jax.tree_util.tree_map(lambda s, l: s.at[i].set(l), stacked, layer)


def init_params(cfg: ModelConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.n_layers + 3)
    layers = [_init_layer(cfg, keys[i], dtype) for i in range(cfg.n_layers)]
    ln_b = jnp.zeros((cfg.dim,), dtype) if cfg.norm == "layernorm" else None
    params = {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, cfg.dim)).astype(dtype)
        * 0.02,
        "emb_ln_w": jnp.ones((cfg.dim,), dtype) if cfg.embed_norm else None,
        "emb_ln_b": (
            jnp.zeros((cfg.dim,), dtype)
            if (cfg.embed_norm and cfg.norm == "layernorm")
            else None
        ),
        "pos_embed": (
            jax.random.normal(
                keys[-2], (cfg.max_seq_len + cfg.pos_offset, cfg.dim)
            ).astype(dtype)
            * 0.02
            if cfg.pos == "learned"
            else None
        ),
        "layers": stack_layers(layers),
        "lnf_w": jnp.ones((cfg.dim,), dtype),
        "lnf_b": ln_b,
        "lm_head": (
            None
            if cfg.tie_embeddings
            else _init_linear(keys[-3], cfg.vocab_size, cfg.dim, False, dtype)
        ),
    }
    return params


# ----------------------------------------------------------- forward ----
def build_mask(
    cfg: ModelConfig,
    q_len: int,
    kv_len: int,
    q_offset: int | jax.Array = 0,
) -> jax.Array:
    """Additive attention mask: causal, plus per-head ALiBi bias when
    ``cfg.pos == 'alibi'`` (shape (H, Lq, Lkv); else (Lq, Lkv))."""
    mask = causal_mask(q_len, kv_len, q_offset)
    if cfg.pos == "alibi":
        q_pos = q_offset + jnp.arange(q_len)
        mask = mask[None] + alibi_bias(cfg.n_heads, q_pos, kv_len)
    return mask


def embed_tokens(
    cfg: ModelConfig, params, tokens: jax.Array, pos0: int | jax.Array = 0
) -> jax.Array:
    """(B, L) ids -> (B, L, D) hidden, including learned positions if any."""
    h = jnp.take(params["embed"], tokens, axis=0)
    if cfg.embed_scale != 1.0:
        h = h * jnp.asarray(cfg.embed_scale, h.dtype)
    if cfg.pos == "learned":
        L = tokens.shape[1]
        pos = pos0 + jnp.arange(L) + cfg.pos_offset
        h = h + jnp.take(params["pos_embed"], pos, axis=0)[None]
    if cfg.embed_norm:
        h = _norm(cfg, h, params["emb_ln_w"], params["emb_ln_b"])
    return h


def embed_tokens_per_row(
    cfg: ModelConfig, params, tokens: jax.Array, positions: jax.Array
) -> jax.Array:
    """(B,) ids at per-row ``positions`` (B,) -> (B, 1, D) hidden, or
    (B, Lw) ids at (B, Lw) positions -> (B, Lw, D) (speculative verify).

    The continuous-batching decode embed: same semantics as
    :func:`embed_tokens` (embed scale, learned positions, embedding norm)
    but each batch row sits at its own sequence position.
    """
    if tokens.ndim == 1:
        tokens = tokens[:, None]
        positions = positions[:, None]
    h = jnp.take(params["embed"], tokens, axis=0)  # (B, Lw, D)
    if cfg.embed_scale != 1.0:
        h = h * jnp.asarray(cfg.embed_scale, h.dtype)
    if cfg.pos == "learned":
        h = h + jnp.take(
            params["pos_embed"], positions + cfg.pos_offset, axis=0
        )
    if cfg.embed_norm:
        h = _norm(cfg, h, params["emb_ln_w"], params["emb_ln_b"])
    return h


def sliding_adjust(
    cfg: ModelConfig,
    layer_idx: Optional[jax.Array],
    cos, sin, cos_loc, sin_loc,
    mask, kv_valid,
    cache, cache_pos,
    B: int, L: int,
):
    """Fold per-layer sliding-window semantics (gemma2/3) into the
    attention inputs; no-op for all-global configs.

    Selects the local RoPE tables on sliding layers (when the config has a
    distinct local base), and narrows the receptive field to the trailing
    window — via the additive ``mask`` on shared-position paths, or via
    ``kv_valid`` on the per-row continuous-batching decode path. Shared by
    the single-chip layer and the manual-TP layer (parallel/tp.py).
    Returns (cos, sin, mask, kv_valid).
    """
    if not cfg.has_sliding:
        return cos, sin, mask, kv_valid
    if layer_idx is None:
        raise ValueError("sliding-window configs need layer_idx")
    is_global = jnp.asarray(cfg.globals_list())[layer_idx]
    if cos_loc is not None:
        cos = jnp.where(is_global, cos, cos_loc)
        sin = jnp.where(is_global, sin, sin_loc)
    W = cfg.sliding_window
    per_row = cache is not None and jnp.ndim(cache_pos) != 0
    if per_row:
        # Continuous-batching decode (L == 1): window -> kv_valid.
        # kv_valid's width is authoritative: paged views (serve/paged.py)
        # carry the page POOL in .k, whose axes are not the logical cache.
        if kv_valid is not None:
            M = kv_valid.shape[-1]
        else:
            M = cache.k.shape[-3]
        kv_pos = jnp.arange(M)
        win_ok = kv_pos[None, :] > (cache_pos[:, None] - W)  # (B, M)
        base = (
            kv_valid
            if kv_valid is not None
            else jnp.ones((B, M), dtype=bool)
        )
        kv_valid = jnp.where(is_global, base, base & win_ok)
    elif (
        mask is None and kv_valid is not None and L == 1
        and cache_pos is not None
    ):
        # Scalar-pos decode masked via kv_valid only (pipeline stages,
        # parallel/pp.py pp_generate): fold the window into kv_valid.
        kv_pos = jnp.arange(kv_valid.shape[-1])
        win_ok = kv_pos[None, :] > (cache_pos - W)  # (1, M) broadcast
        kv_valid = jnp.where(is_global, kv_valid, kv_valid & win_ok)
    else:
        if mask is None or mask.ndim != 2:
            raise ValueError(
                "sliding-window attention needs a shared (Lq, Lkv) mask"
            )
        q0 = 0 if (cache is None or cache_pos is None) else cache_pos
        q_pos = q0 + jnp.arange(L)
        kv_pos = jnp.arange(mask.shape[-1])
        win = jnp.where(
            kv_pos[None, :] > q_pos[:, None] - W, 0.0, -jnp.inf
        ).astype(jnp.float32)
        mask = mask + jnp.where(is_global, 0.0, win)
    return cos, sin, mask, kv_valid


class LayerIO(NamedTuple):
    """Per-layer auxiliary outputs."""

    kv: Optional[Any]  # updated KV-cache layer view (serve/kvcache.py)
    taps: Optional[Dict[str, jax.Array]]  # linear-input activations


def moe_router_weights(cfg: ModelConfig, router, h: jax.Array):
    """Top-k routing (mixtral / qwen3-moe semantics).

    Returns (wfull, topw, topi): ``wfull`` is the (B, L, E) combine-weight
    matrix — softmax over all experts, top-``experts_per_token`` kept
    (renormalized when ``cfg.norm_topk``), zeros elsewhere. Router math in
    f32 (routing decisions are precision-sensitive)."""
    logits = h.astype(jnp.float32) @ router.w.T.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (B, L, E)
    topw, topi = jax.lax.top_k(probs, cfg.experts_per_token)
    if cfg.norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, cfg.n_experts, dtype=topw.dtype)
    wfull = jnp.einsum("blk,blke->ble", topw, onehot)
    return wfull, topw, topi


def _flatten_expert_stack(p):
    """(n_layers, E, ...) packed-ternary leaves -> (n_layers*E, ...) so the
    scalar-prefetch stacked kernel selects layer*E + expert directly (a
    leading-dims merge is a free metadata reshape)."""
    import dataclasses as _dc

    def r(a):
        return None if a is None else a.reshape((-1,) + a.shape[2:])

    g = p.gather
    if g is not None:
        g = _dc.replace(g, packed=r(g.packed), perm=r(g.perm))
    return _dc.replace(
        p, packed=r(p.packed), alpha=r(p.alpha), mu=r(p.mu), perm=r(p.perm),
        bias=r(p.bias), gather=g,
    )


def _moe_expert_apply(lin, x, e, layer_idx, n_experts, impl):
    """Apply one expert's projection: DenseLinear with (E, out, in) weights
    or PackedTernaryLinear stacked over experts ((E, ...) per-layer, or
    (L, E, ...) inside scan-over-layers — disambiguated by ndim)."""
    if isinstance(lin, PackedTernaryLinear):
        if lin.packed.ndim == 4:
            flat = _flatten_expert_stack(lin)
            idx = jnp.asarray(layer_idx, jnp.int32) * n_experts + e
            return ternary_linear_apply_stacked(flat, x, idx, impl=impl)
        return ternary_linear_apply_stacked(
            lin, x, jnp.asarray(e, jnp.int32), impl=impl
        )
    we = lin.w[e]  # (out, in); traced e -> dynamic_index
    return x @ we.T.astype(x.dtype)


def _moe_mlp(
    cfg: ModelConfig,
    lp: Dict[str, Any],
    h: jax.Array,  # (B, L, D) post-ln2
    impl: str,
    layer_idx,
    taps: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Routed-expert MLP. Exact combine: out = sum_e w_e * expert_e(h).

    Two execution plans, same math:
      * B*L == 1 (decode): only the top-k selected experts run — k
        data-dependent expert indices feed the scalar-prefetch stacked
        kernel (ternary) or a dynamic weight slice (dense).
      * otherwise (prefill / calibration): static loop over all E experts,
        each applied to every token and combined with its (mostly zero)
        routing weight — dense compute, XLA-friendly, no ragged shapes.
    """
    E = cfg.n_experts
    Ie = cfg.expert_inter
    wfull, topw, topi = moe_router_weights(cfg, lp["router"], h)
    if taps is not None:
        taps["moe_w"] = wfull

    def expert_out(e):
        if lp.get("gateup") is not None:
            gu = _moe_expert_apply(lp["gateup"], h, e, layer_idx, E, impl)
            mid = _act(cfg, gu[..., :Ie]) * gu[..., Ie:]
        else:
            g = _moe_expert_apply(lp["gate"], h, e, layer_idx, E, impl)
            u = _moe_expert_apply(lp["up"], h, e, layer_idx, E, impl)
            mid = _act(cfg, g) * u
        return _moe_expert_apply(lp["down"], mid, e, layer_idx, E, impl)

    B, L, D = h.shape
    acc = jnp.zeros((B, L, D), jnp.float32)
    if B * L == 1:
        for j in range(cfg.experts_per_token):
            e = topi[0, 0, j]
            acc = acc + topw[0, 0, j] * expert_out(e).astype(jnp.float32)
    else:
        for e in range(E):
            w_e = wfull[..., e][..., None]  # (B, L, 1)
            acc = acc + w_e * expert_out(e).astype(jnp.float32)
    return acc.astype(h.dtype)


def layer_forward(
    cfg: ModelConfig,
    lp: Dict[str, Any],
    x: jax.Array,  # (B, L, D)
    cos: jax.Array,  # (L, hd/2) rope tables for these positions (rope only)
    sin: jax.Array,
    mask: Optional[jax.Array],  # (L, Lkv) additive
    cache: Optional[Any] = None,  # KVLayerView (duck-typed: .write/.read)
    cache_pos: Optional[jax.Array] = None,  # scalar write offset
    kv_valid: Optional[jax.Array] = None,  # (B, M) bool
    return_taps: bool = False,
    impl: str = "auto",
    layer_idx: Optional[jax.Array] = None,  # enables stacked-weight kernels
    cos_loc: Optional[jax.Array] = None,  # sliding-layer RoPE tables (gemma3)
    sin_loc: Optional[jax.Array] = None,
    global_layer_idx: Optional[jax.Array] = None,  # if weights are a local
    # slice of the model (pipeline stages): the layer's position in the FULL
    # model, for sliding-window global/local selection. Defaults to
    # ``layer_idx``.
    attn_fn=None,  # cache-less attention override (q, k, v, mask, scale=,
    # softcap=) -> ctx — e.g. parallel.cp's ring attention, which computes
    # causality across sequence shards internally.
    moe_fn=None,  # MoE-MLP override (cfg, lp, h, impl, layer_idx, taps=)
    # -> (B, L, D) — e.g. parallel.ep's local-expert + psum combine.
) -> Tuple[jax.Array, LayerIO]:
    """One decoder layer. Returns (output hidden, LayerIO).

    With ``cache`` given (a serve.kvcache.KVLayerView), new k/v are written
    at ``cache_pos`` and attention runs against the full cache
    (decode/prefill path); otherwise attention is over the local sequence
    (calibration/eval path).

    Sliding-window configs (gemma2/3) select per layer between global and
    local attention via ``layer_idx`` (required then): the window constraint
    folds into the additive mask (shared-position paths) or into
    ``kv_valid`` (per-row decode), and sliding layers use the ``*_loc``
    RoPE tables when the config carries a local base (``pos_tables``).
    """
    B, L, D = x.shape
    H, Hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    taps: Dict[str, jax.Array] = {}

    gli = global_layer_idx if global_layer_idx is not None else layer_idx
    # An attention override (ring attention, parallel/cp.py) computes its
    # masking from GLOBAL positions internally — local masks would be
    # wrong. Select the per-layer RoPE tables here and hand the window
    # semantics to the override instead of folding them into mask/kv_valid.
    ext_sliding = attn_fn is not None and cfg.has_sliding and cache is None
    is_global_l = None
    if ext_sliding:
        if gli is None:
            raise ValueError("sliding-window configs need layer_idx")
        is_global_l = jnp.asarray(cfg.globals_list())[gli]
        if cos_loc is not None:
            cos = jnp.where(is_global_l, cos, cos_loc)
            sin = jnp.where(is_global_l, sin, sin_loc)
    else:
        cos, sin, mask, kv_valid = sliding_adjust(
            cfg, gli, cos, sin, cos_loc, sin_loc, mask, kv_valid,
            cache, cache_pos, B, L,
        )

    h = _norm(cfg, x, lp["ln1_w"], lp["ln1_b"])
    if return_taps:
        taps["attn_in"] = h
    if lp.get("qkv") is not None:
        # Fused projection (quantized models): one kernel call, split output.
        qkv = apply_linear(lp["qkv"], h, impl, layer_idx)
        nq = H * hd
        nkv = Hkv * hd
        q = qkv[..., :nq].reshape(B, L, H, hd)
        k = qkv[..., nq : nq + nkv].reshape(B, L, Hkv, hd)
        v = qkv[..., nq + nkv :].reshape(B, L, Hkv, hd)
    else:
        q = apply_linear(lp["q"], h, impl, layer_idx).reshape(B, L, H, hd)
        k = apply_linear(lp["k"], h, impl, layer_idx).reshape(B, L, Hkv, hd)
        v = apply_linear(lp["v"], h, impl, layer_idx).reshape(B, L, Hkv, hd)
    if cfg.qk_norm:
        q = _head_norm(cfg, q, lp["q_norm_w"])
        k = _head_norm(cfg, k, lp["k_norm_w"])
    if cfg.pos == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if cache is not None:
        # cache_pos: scalar (prefill / lockstep decode) or (B,) per-row
        # positions (continuous batching; L must be 1).
        if jnp.ndim(cache_pos) == 0:
            new_kv = cache.write(k, v, cache_pos)
        else:
            new_kv = cache.write_rows(k, v, cache_pos)
        if (
            getattr(new_kv, "k_scale", None) is not None
            and hasattr(new_kv, "read_raw")
        ):
            # Native int8-KV: scales fold into scores/probs; no bf16
            # cache materialization (models.common.attention docstring).
            ck, cv, kss, vss = new_kv.read_raw()
            ctx = attention(
                q, ck, cv, mask, kv_valid,
                scale=cfg.attn_scale, softcap=cfg.attn_softcap,
                k_scale=kss, v_scale=vss,
            )
        else:
            ck, cv = new_kv.read(q.dtype)
            ctx = attention(
                q, ck, cv, mask, kv_valid,
                scale=cfg.attn_scale, softcap=cfg.attn_softcap,
            )
    elif ext_sliding:
        ctx = attn_fn(
            q, k, v, mask, scale=cfg.attn_scale, softcap=cfg.attn_softcap,
            is_global=is_global_l, window=cfg.sliding_window,
        )
        new_kv = None
    else:
        ctx = (attn_fn or attention)(
            q, k, v, mask, scale=cfg.attn_scale, softcap=cfg.attn_softcap
        )
        new_kv = None

    ctx = ctx.reshape(B, L, H * hd)
    if return_taps:
        taps["o_in"] = ctx
    ao = apply_linear(lp["o"], ctx, impl, layer_idx)
    if cfg.sandwich_norm:
        ao = _norm(cfg, ao, lp["post_attn_w"], None)
    x = x + ao

    h = _norm(cfg, x, lp["ln2_w"], lp["ln2_b"])
    if return_taps:
        taps["mlp_in"] = h
    if cfg.is_moe:
        mo = (moe_fn or _moe_mlp)(
            cfg, lp, h, impl, layer_idx if layer_idx is not None else 0,
            taps=taps if return_taps else None,
        )
        if cfg.sandwich_norm:
            mo = _norm(cfg, mo, lp["post_mlp_w"], None)
        x = x + mo
        return x, LayerIO(kv=new_kv, taps=taps if return_taps else None)
    if lp.get("gateup") is not None:
        from ..ops.ternary_matmul import fused_mlp_apply, fused_mlp_ok

        if not return_taps and fused_mlp_ok(lp["gateup"], lp["down"], impl, B * L):
            # One pallas call for the whole MLP: SSR gather + gateup +
            # act*mul + down (ops/kernels/pallas_ternary.ternary_mlp_pallas).
            mo = fused_mlp_apply(
                lp["gateup"], lp["down"], h, cfg.act, layer_idx, impl=impl
            )
            if cfg.sandwich_norm:
                mo = _norm(cfg, mo, lp["post_mlp_w"], None)
            x = x + mo
            return x, LayerIO(kv=new_kv, taps=taps if return_taps else None)
        gu = apply_linear(lp["gateup"], h, impl, layer_idx)
        I = cfg.intermediate
        # gate/up halves split at the STORED width: pad_gateup_blocks may
        # have widened each half past cfg.intermediate with zero columns.
        half = gu.shape[-1] // 2
        mid = _act(cfg, gu[..., :I]) * gu[..., half : half + I]
    elif cfg.gated_mlp:
        g = _act(cfg, apply_linear(lp["gate"], h, impl, layer_idx))
        u = apply_linear(lp["up"], h, impl, layer_idx)
        mid = g * u
    else:
        mid = _act(cfg, apply_linear(lp["up"], h, impl, layer_idx))
    if return_taps:
        taps["down_in"] = mid
    mo = apply_linear(lp["down"], mid, impl, layer_idx)
    if cfg.sandwich_norm:
        mo = _norm(cfg, mo, lp["post_mlp_w"], None)
    x = x + mo

    return x, LayerIO(kv=new_kv, taps=taps if return_taps else None)


def unembed(cfg: ModelConfig, params, h: jax.Array) -> jax.Array:
    h = _norm(cfg, h, params["lnf_w"], params["lnf_b"])
    if params["lm_head"] is not None:
        logits = apply_linear(params["lm_head"], h)
    else:
        logits = h @ params["embed"].T.astype(h.dtype)
    if cfg.final_softcap:
        c = jnp.asarray(cfg.final_softcap, jnp.float32)
        logits = (c * jnp.tanh(logits.astype(jnp.float32) / c)).astype(
            logits.dtype
        )
    return logits


def forward(
    cfg: ModelConfig,
    params,
    tokens: jax.Array,  # (B, L) int32
    impl: str = "auto",
) -> jax.Array:
    """Full causal forward to logits (B, L, V) — eval/perplexity path.

    ``lax.scan`` over the stacked layer parameters: one compiled layer body.
    """
    B, L = tokens.shape
    h = embed_tokens(cfg, params, tokens)
    mask = build_mask(cfg, L, L)
    cos, sin, cos_l, sin_l = pos_tables(cfg, L)

    def body(x, li):
        lp = layer_view(params["layers"], li)
        y, _ = layer_forward(
            cfg, lp, x, cos, sin, mask, impl=impl, layer_idx=li,
            cos_loc=cos_l, sin_loc=sin_l,
        )
        return y, None

    h, _ = jax.lax.scan(body, h, jnp.arange(cfg.n_layers))
    return unembed(cfg, params, h)
