"""Autoregressive generation: prefill + jitted greedy/sampled decode loop.

The reference has no generation path at all (its "inference" overwrites
weights with dequantized fp16 and leaves serving to HF — SURVEY.md §3.5).
Here decode is a single compiled program: ``lax.scan`` over decode steps,
each step one layer-scan over stacked params + KV cache, ternary matmuls
streaming packed weights. Static shapes throughout (fixed max_len cache,
fixed step count) — nothing recompiles per token.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import decoder as dec
from .kvcache import KVCache, KVStackedView, init_cache

__all__ = ["forward_cached", "greedy_generate", "prefill", "chunked_prefill"]


def forward_cached(
    cfg: dec.ModelConfig,
    params,
    tokens: jax.Array,  # (B, L)
    cache: KVCache,
    pos0,  # scalar int: first position of `tokens`
    impl: str = "auto",
    all_logits: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run ``tokens`` at positions [pos0, pos0+L) against the cache.

    Returns (last-position logits (B, V) — or (B, L, V) with
    ``all_logits``, the speculative-verify path — and the updated cache).
    """
    B, L = tokens.shape
    M = cache.max_len
    h = dec.embed_tokens(cfg, params, tokens, pos0=pos0)

    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
    cos = jax.lax.dynamic_slice_in_dim(cos_all, pos0, L)
    sin = jax.lax.dynamic_slice_in_dim(sin_all, pos0, L)
    cos_l = sin_l = None
    if cosl_all is not None:
        cos_l = jax.lax.dynamic_slice_in_dim(cosl_all, pos0, L)
        sin_l = jax.lax.dynamic_slice_in_dim(sinl_all, pos0, L)
    kv_valid = None
    mask = None
    if L == 1 and cfg.pos != "alibi":
        # Lockstep decode: causality over the cache is a per-row validity
        # interval, not an additive mask — the representation the Pallas
        # decode-attention kernel consumes (models/common.attention routes
        # on mask is None), and equivalent under the XLA path's where().
        kv_valid = jnp.broadcast_to(
            jnp.arange(M)[None, :] <= pos0, (B, M)
        )
    else:
        mask = dec.build_mask(cfg, L, M, q_offset=pos0)

    # KV arrays thread through the scan CARRY and are updated in place at
    # the layer index (see kvcache.KVStackedView — passing per-layer views
    # through xs/ys copied the whole cache every step, measured ~4 ms/tok
    # at M=1088 in scripts/decode_budget.py).
    def body(carry, li):
        x, kvt = carry
        kvl = KVStackedView(*kvt, li)
        lp = dec.layer_view(params["layers"], li)
        y, io = dec.layer_forward(
            cfg, lp, x, cos, sin, mask, cache=kvl, cache_pos=pos0, impl=impl,
            kv_valid=kv_valid, layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
        )
        return (y, io.kv.carry()), None

    (h, kvt), _ = jax.lax.scan(
        body,
        (h, KVStackedView.of(cache, 0).carry()),
        jnp.arange(cfg.n_layers),
    )
    new_cache = KVCache(*kvt, length=jnp.asarray(pos0 + L, jnp.int32))
    if all_logits:
        return dec.unembed(cfg, params, h), new_cache
    logits = dec.unembed(cfg, params, h[:, -1:, :])[:, 0]
    return logits, new_cache


def prefill(
    cfg, params, prompt: jax.Array, cache: KVCache, impl: str = "auto"
) -> Tuple[jax.Array, KVCache]:
    """Process the prompt; returns (next-token logits, filled cache)."""
    return forward_cached(cfg, params, prompt, cache, 0, impl)


def _auto_prefill_chunk(cfg, B: int, Lp: int, M: int) -> Optional[int]:
    """Pick a prefill chunk length, or None for whole-prompt prefill.

    Whole-prompt prefill at batch 8 x prompt 1024 fails to COMPILE at 7B:
    XLA materializes a 23.6 GB f32 layer-stacked gateup buffer
    (RESULTS.md round 4; r4_chip1.log). Chunking bounds the live
    activation set to B*chunk rows regardless of prompt length — the
    standard serving shape (vLLM-style chunked prefill), and the same
    mechanism the engine uses to bound prefill interference.

    Two bounds: (a) B*chunk <= 4096 token-rows (batch 8 x 512 compiled
    fine; 8 x 1024 did not), (b) the (B, H, chunk, M) f32 score tensor
    <= ~1 GB so long-context chunks shrink as the cache grows.
    """
    if B * Lp <= 4096:
        return None
    c_act = max(128, (4096 // max(1, B)) // 128 * 128)
    c_scr = max(128, (2**28 // max(1, cfg.n_heads * B * M)) // 128 * 128)
    c = min(c_act, c_scr)
    return c if c < Lp else None


def chunked_prefill(
    cfg, params, prompt: jax.Array, cache: KVCache, impl: str = "auto",
    chunk: int = 512,
) -> Tuple[jax.Array, KVCache]:
    """Prefill the prompt in ``chunk``-token slices against the cache.

    Equal-shape full chunks run under one ``lax.scan`` (their logits are
    dead code — XLA eliminates the unembed); the final chunk (remainder,
    or the last full chunk) runs inline to produce the next-token logits.
    Token-exact vs whole-prompt prefill (tests/test_generate.py).
    """
    B, Lp = prompt.shape
    if chunk >= Lp:
        return forward_cached(cfg, params, prompt, cache, 0, impl)
    nfull, rem = divmod(Lp, chunk)
    nscan = nfull - (0 if rem else 1)
    pos = 0
    if nscan > 0:
        chunks = jnp.moveaxis(
            prompt[:, : nscan * chunk].reshape(B, nscan, chunk), 1, 0
        )  # (nscan, B, chunk)

        def body(carry, toks):
            c, p = carry
            _, c = forward_cached(cfg, params, toks, c, p, impl)
            return (c, p + chunk), None

        (cache, _), _ = jax.lax.scan(
            body, (cache, jnp.int32(0)), chunks
        )
        pos = nscan * chunk
    logits, cache = forward_cached(
        cfg, params, prompt[:, pos:], cache, pos, impl
    )
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new", "impl", "max_len", "kv_quant", "sampling",
        "prefill_chunk",
    ),
)
def generate(
    cfg: dec.ModelConfig,
    params,
    prompt: jax.Array,  # (B, Lp) int32
    max_new: int,
    max_len: Optional[int] = None,
    impl: str = "auto",
    kv_quant: bool = False,
    sampling: "SamplingConfig" = None,
    key: Optional[jax.Array] = None,
    prefill_chunk: Optional[int] = None,  # None = auto; 0 = whole-prompt
) -> jax.Array:
    """Decode ``max_new`` tokens after ``prompt``; one compiled program.

    ``sampling``: a serve.sampling.SamplingConfig (hashable/static); None or
    temperature<=0 means greedy. Returns (B, max_new) token ids.
    """
    from .sampling import SamplingConfig, sample

    scfg = sampling or SamplingConfig()
    B, Lp = prompt.shape
    M = max_len or min(cfg.max_seq_len, Lp + max_new)
    if Lp + max_new > M:
        raise ValueError(f"prompt {Lp} + max_new {max_new} exceeds max_len {M}")
    if key is None:
        key = jax.random.PRNGKey(0)
    cache = init_cache(cfg, B, M, quantized=kv_quant)

    chunk = (
        _auto_prefill_chunk(cfg, B, Lp, M)
        if prefill_chunk is None
        else (prefill_chunk or None)
    )
    if chunk:
        logits, cache = chunked_prefill(
            cfg, params, prompt, cache, impl, chunk
        )
    else:
        logits, cache = prefill(cfg, params, prompt, cache, impl)
    key, k0 = jax.random.split(key)
    tok0 = sample(logits, k0, scfg)

    def step(carry, _):
        cache, tok, pos, key = carry
        logits, cache = forward_cached(
            cfg, params, tok[:, None], cache, pos, impl
        )
        key, ks = jax.random.split(key)
        nxt = sample(logits, ks, scfg)
        return (cache, nxt, pos + 1, key), nxt

    (_, _, _, _), rest = jax.lax.scan(
        step, (cache, tok0, jnp.int32(Lp), key), None, length=max_new - 1
    )
    return jnp.concatenate([tok0[:, None], rest.T], axis=1)


def greedy_generate(cfg, params, prompt, max_new, max_len=None, impl="auto",
                    kv_quant=False, prefill_chunk=None):
    """Greedy decode — the common special case of :func:`generate`."""
    return generate(
        cfg, params, prompt, max_new, max_len=max_len, impl=impl,
        kv_quant=kv_quant, prefill_chunk=prefill_chunk,
    )
