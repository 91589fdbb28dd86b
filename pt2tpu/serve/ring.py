"""Ring KV cache: sliding-window layers keep only `window` cache slots.

The reference rides HF attention and has no caching at all (SURVEY.md §5);
this is a TPU-native memory optimization for the gemma2/3 families, where
most layers are sliding (gemma3: 5 of every 6, window 1024): a sliding
layer can never attend past its window, so its KV cache is a ring of
``window`` slots (write position ``p mod W``) instead of ``max_len`` —
at long context that cuts decode KV traffic and memory by ~n_sliding/n
(gemma3-27B @ 32k: ~6x).

Exactness: attention is permutation-invariant over KV slots, so ring order
never matters — a slot is either inside the window (valid) or already
overwritten. Keys are stored RoPE'd at their absolute positions, exactly
like the flat cache. The decode scan dispatches per layer with
``lax.cond`` between two stacked caches (global layers: full ``max_len``
stack; sliding layers: ``window`` ring stack); the branch index map is
static (``cfg.globals_list()``), only the cond predicate is traced.

``ring_generate`` is the lockstep path; ``make_ring_engine_fns`` plugs the
same split pools into the continuous-batching engine (per-row ring
positions, per-slot prefill scatter that handles prompts longer than the
window).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from .kvcache import KVCache, KVLayerView, KVStackedView

__all__ = ["RingCaches", "init_ring_caches", "ring_generate", "make_ring_engine_fns"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RingCaches:
    """Split stacked caches: full-length globals + window-length rings.

    glob: KVCache (n_global, B, M, Hkv, hd); ring: KVCache
    (n_sliding, B, W, Hkv, hd). Either may be empty (n == 0).
    """

    glob: KVCache
    ring: KVCache

    def tree_flatten(self):
        return (self.glob, self.ring), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _kind_maps(cfg: dec.ModelConfig) -> Tuple[Tuple[bool, ...], np.ndarray]:
    """(is_global per layer, index of each layer within its kind's stack)."""
    gl = cfg.globals_list() if cfg.has_sliding else (True,) * cfg.n_layers
    idx, c = [], {True: 0, False: 0}
    for g in gl:
        idx.append(c[g])
        c[g] += 1
    return gl, np.asarray(idx, np.int32)


def init_ring_caches(
    cfg: dec.ModelConfig, batch: int, max_len: int
) -> RingCaches:
    gl, _ = _kind_maps(cfg)
    n_g, n_s = sum(gl), len(gl) - sum(gl)
    W = min(cfg.sliding_window or max_len, max_len)

    def make(n, m):
        # Shapes computed directly — going through init_cache would eagerly
        # materialize the full (n_layers, B, max_len, ...) flat cache, the
        # exact allocation the ring exists to avoid.
        shape = (n, batch, m, cfg.kv_heads, cfg.hd)
        return KVCache(
            k=jnp.zeros(shape, jnp.bfloat16),
            v=jnp.zeros(shape, jnp.bfloat16),
            k_scale=None,
            v_scale=None,
            length=jnp.int32(0),
        )

    return RingCaches(glob=make(n_g, max_len), ring=make(n_s, W))


def _ring_write_prefill(ring_k: jax.Array, k_new: jax.Array) -> jax.Array:
    """Scatter a prefill's (B, L, ...) keys into a (B, W, ...) ring.

    Slot s must hold the newest position ≡ s (mod W); for L >= W that is
    roll(last W positions, L); for L < W positions [0, L) land at slots
    [0, L) directly."""
    W = ring_k.shape[1]
    L = k_new.shape[1]
    if L >= W:
        return jnp.roll(k_new[:, L - W :], shift=L, axis=1).astype(
            ring_k.dtype
        )
    return ring_k.at[:, :L].set(k_new.astype(ring_k.dtype))


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "max_len", "impl"))
def ring_generate(
    cfg: dec.ModelConfig,
    params,
    prompt: jax.Array,  # (B, Lp) int32
    max_new: int,
    max_len: Optional[int] = None,
    impl: str = "auto",
) -> jax.Array:
    """Greedy decode with ring caches on sliding layers; token-identical to
    ``greedy_generate`` (tests pin this). Returns (B, max_new) ids."""
    B, Lp = prompt.shape
    M = max_len or min(cfg.max_seq_len, Lp + max_new)
    if Lp + max_new > M:
        raise ValueError(f"prompt {Lp} + max_new {max_new} exceeds max_len {M}")
    gl, kind_idx = _kind_maps(cfg)
    gl_arr = jnp.asarray(gl)
    kidx = jnp.asarray(kind_idx)
    W = min(cfg.sliding_window or M, M)
    caches = init_ring_caches(cfg, B, M)
    # Branch cfgs: window handling is the ring's job (decode) or the local
    # mask's (prefill) — layer_forward must not re-apply it.
    cfg_plain = cfg.with_(sliding_window=0, layer_globals=None)

    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)

    def tables(pos0, L, is_local: bool):
        src_c = cosl_all if (is_local and cosl_all is not None) else cos_all
        src_s = sinl_all if (is_local and sinl_all is not None) else sin_all
        return (
            jax.lax.dynamic_slice_in_dim(src_c, pos0, L),
            jax.lax.dynamic_slice_in_dim(src_s, pos0, L),
        )

    # ---------------------------------------------------------- prefill --
    # Local attention (window via the standard sliding mask), then scatter
    # each layer's K/V into its kind's stack.
    h = dec.embed_tokens(cfg, params, prompt)
    mask_pf = dec.build_mask(cfg, Lp, Lp)
    cos_pf, sin_pf = tables(0, Lp, False)
    cosl_pf, sinl_pf = (
        tables(0, Lp, True) if cosl_all is not None else (None, None)
    )

    def pf_body(carry, li):
        h, glob, ring = carry
        lp = dec.layer_view(params["layers"], li)
        cap = KVLayerView(
            k=jnp.zeros((B, Lp, cfg.kv_heads, cfg.hd), jnp.bfloat16),
            v=jnp.zeros((B, Lp, cfg.kv_heads, cfg.hd), jnp.bfloat16),
            k_scale=None,
            v_scale=None,
        )
        y, io = dec.layer_forward(
            cfg, lp, h, cos_pf, sin_pf, mask_pf, cache=cap, cache_pos=0,
            impl=impl, layer_idx=li, cos_loc=cosl_pf, sin_loc=sinl_pf,
        )
        kv = io.kv  # (B, Lp, Hkv, hd) bf16 — the local keys/values
        ki = kidx[li]

        def wr_glob(g, r):
            g = dataclasses.replace(
                g,
                k=jax.lax.dynamic_update_slice(
                    g.k, kv.k[None].astype(g.k.dtype), (ki, 0, 0, 0, 0)
                ),
                v=jax.lax.dynamic_update_slice(
                    g.v, kv.v[None].astype(g.v.dtype), (ki, 0, 0, 0, 0)
                ),
            )
            return g, r

        def wr_ring(g, r):
            # zeros base, NOT r.k[0]: for Lp < W the scatter fills only
            # slots [0, Lp) and the base leaks through in the rest — using
            # another layer's buffer there would plant foreign KV that only
            # the current kv_valid gating keeps un-attended.
            zk = jnp.zeros_like(r.k[0])
            rk = _ring_write_prefill(zk, kv.k)
            rv = _ring_write_prefill(jnp.zeros_like(r.v[0]), kv.v)
            r = dataclasses.replace(
                r,
                k=jax.lax.dynamic_update_slice(
                    r.k, rk[None], (ki, 0, 0, 0, 0)
                ),
                v=jax.lax.dynamic_update_slice(
                    r.v, rv[None], (ki, 0, 0, 0, 0)
                ),
            )
            return g, r

        if caches.ring.k.shape[0] == 0:
            glob, ring = wr_glob(glob, ring)
        elif caches.glob.k.shape[0] == 0:
            glob, ring = wr_ring(glob, ring)
        else:
            glob, ring = jax.lax.cond(gl_arr[li], wr_glob, wr_ring, glob, ring)
        return (y, glob, ring), None

    (h, glob, ring), _ = jax.lax.scan(
        pf_body, (h, caches.glob, caches.ring), jnp.arange(cfg.n_layers)
    )
    logits = dec.unembed(cfg, params, h[:, -1:, :])[:, 0]
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # ----------------------------------------------------------- decode --
    def decode_step(carry, _):
        glob, ring, tok, pos = carry
        x = dec.embed_tokens(cfg, params, tok[:, None], pos0=pos)
        cos_g, sin_g = tables(pos, 1, False)
        cos_l, sin_l = tables(pos, 1, True)
        mask_g = dec.build_mask(cfg_plain, 1, M, q_offset=pos)
        kv_valid_r = (jnp.arange(W)[None, :] <= pos) & jnp.ones(
            (B, 1), bool
        )

        def step_body(carry2, li):
            h, glob, ring = carry2
            lp = dec.layer_view(params["layers"], li)
            ki = kidx[li]

            def run_glob(h, glob, ring):
                # In-place single-row write at layer ki (KVStackedView):
                # writing the full layer slab back copied ~2x the layer's
                # KV per step (see serve.kvcache.KVStackedView).
                view = KVStackedView(glob.k, glob.v, None, None, ki)
                y, io = dec.layer_forward(
                    cfg_plain, lp, h, cos_g, sin_g, mask_g, cache=view,
                    cache_pos=pos, impl=impl, layer_idx=li,
                )
                glob = dataclasses.replace(glob, k=io.kv.k, v=io.kv.v)
                return y, glob, ring

            def run_ring(h, glob, ring):
                view = KVStackedView(ring.k, ring.v, None, None, ki)
                y, io = dec.layer_forward(
                    cfg_plain, lp, h, cos_l, sin_l, None, cache=view,
                    cache_pos=pos % W, kv_valid=kv_valid_r, impl=impl,
                    layer_idx=li,
                )
                ring = dataclasses.replace(ring, k=io.kv.k, v=io.kv.v)
                return y, glob, ring

            if ring.k.shape[0] == 0:
                h, glob, ring = run_glob(h, glob, ring)
            elif glob.k.shape[0] == 0:
                h, glob, ring = run_ring(h, glob, ring)
            else:
                h, glob, ring = jax.lax.cond(
                    gl_arr[li], run_glob, run_ring, h, glob, ring
                )
            return (h, glob, ring), None

        (h, glob, ring), _ = jax.lax.scan(
            step_body, (x, glob, ring), jnp.arange(cfg.n_layers)
        )
        logits = dec.unembed(cfg, params, h)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (glob, ring, nxt, pos + 1), nxt

    (_, _, _, _), rest = jax.lax.scan(
        decode_step, (glob, ring, tok0, jnp.int32(Lp)), None,
        length=max_new - 1,
    )
    return jnp.concatenate([tok0[:, None], rest.T], axis=1)


# ------------------------------------------------- engine integration ----
@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _ring_decode_step(cfg, params, tokens, caches, positions, active,
                      impl="auto", samp=None):
    """Per-row decode over split pools (ServeEngine decode_fn contract):
    sliding layers write/attend their window ring, globals the full pool."""
    B = tokens.shape[0]
    M = caches.glob.k.shape[2]
    W = caches.ring.k.shape[2]
    gl, kind_idx = _kind_maps(cfg)
    gl_arr, kidx = jnp.asarray(gl), jnp.asarray(kind_idx)
    cfg_plain = cfg.with_(sliding_window=0, layer_globals=None)

    x = dec.embed_tokens_per_row(cfg, params, tokens, positions)
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, max(M, W))
    cos_g = jnp.take(cos_all, positions, axis=0)[:, None]
    sin_g = jnp.take(sin_all, positions, axis=0)[:, None]
    cos_l = cos_g if cosl_all is None else jnp.take(
        cosl_all, positions, axis=0
    )[:, None]
    sin_l = sin_g if sinl_all is None else jnp.take(
        sinl_all, positions, axis=0
    )[:, None]
    kv_valid_g = jnp.arange(M)[None, :] <= positions[:, None]
    kv_valid_r = jnp.arange(W)[None, :] <= positions[:, None]

    def body(carry, li):
        h, glob, ring = carry
        lp = dec.layer_view(params["layers"], li)
        ki = kidx[li]

        def run_glob(h, glob, ring):
            # In-place per-row write at layer ki (see KVStackedView).
            view = KVStackedView(glob.k, glob.v, None, None, ki)
            y, io = dec.layer_forward(
                cfg_plain, lp, h, cos_g, sin_g, None, cache=view,
                cache_pos=positions, kv_valid=kv_valid_g, impl=impl,
                layer_idx=li,
            )
            return y, dataclasses.replace(glob, k=io.kv.k, v=io.kv.v), ring

        def run_ring(h, glob, ring):
            view = KVStackedView(ring.k, ring.v, None, None, ki)
            y, io = dec.layer_forward(
                cfg_plain, lp, h, cos_l, sin_l, None, cache=view,
                cache_pos=positions % W, kv_valid=kv_valid_r, impl=impl,
                layer_idx=li,
            )
            return y, glob, dataclasses.replace(ring, k=io.kv.k, v=io.kv.v)

        if caches.ring.k.shape[0] == 0:
            h, glob, ring = run_glob(h, glob, ring)
        elif caches.glob.k.shape[0] == 0:
            h, glob, ring = run_ring(h, glob, ring)
        else:
            h, glob, ring = jax.lax.cond(
                gl_arr[li], run_glob, run_ring, h, glob, ring
            )
        return (h, glob, ring), None

    (h, glob, ring), _ = jax.lax.scan(
        body, (x, caches.glob, caches.ring), jnp.arange(cfg.n_layers)
    )
    logits = dec.unembed(cfg, params, h)[:, 0]
    if samp is None:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        from .sampling import sample_per_row

        base_key, uids, temps, top_ks, top_ps = samp
        nxt = sample_per_row(
            logits, base_key, uids, positions, temps, top_ks, top_ps
        )
    nxt = jnp.where(active, nxt, 0)
    return nxt, RingCaches(glob=glob, ring=ring)


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _ring_prefill_into_slot(cfg, params, prompt, true_len, caches, slot,
                            impl="auto", samp=None):
    """Prefill one padded (1, Lb) prompt on a temp flat cache, then scatter
    per layer kind: globals take rows [0, M); sliding layers take the ring
    gather slot s <- position t-1-((t-1-s) mod W) (pads at >= t are never
    selected, so prompts longer than the window wrap correctly)."""
    from .kvcache import init_cache as _init_flat

    M = caches.glob.k.shape[2]
    W = caches.ring.k.shape[2]
    gl, kind_idx = _kind_maps(cfg)
    Lb = prompt.shape[1]
    tmp = _init_flat(cfg, 1, M)

    h = dec.embed_tokens(cfg, params, prompt)
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
    cos, sin = cos_all[:Lb], sin_all[:Lb]
    cos_l = None if cosl_all is None else cosl_all[:Lb]
    sin_l = None if sinl_all is None else sinl_all[:Lb]
    mask = dec.build_mask(cfg, Lb, M)
    def body(carry, li):
        x, kvt = carry
        kvl = KVStackedView(*kvt, li)
        lp = dec.layer_view(params["layers"], li)
        y, io = dec.layer_forward(
            cfg, lp, x, cos, sin, mask, cache=kvl, cache_pos=0, impl=impl,
            layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
        )
        return (y, io.kv.carry()), None

    (h, kvt), _ = jax.lax.scan(
        body, (h, (tmp.k, tmp.v, None, None)), jnp.arange(cfg.n_layers)
    )
    new_views = KVLayerView(k=kvt[0], v=kvt[1], k_scale=None, v_scale=None)
    h_last = jax.lax.dynamic_slice_in_dim(h, true_len - 1, 1, axis=1)
    logits = dec.unembed(cfg, params, h_last)[:, 0]

    # ring gather indices: slot s <- newest position ≡ s (mod W) below t
    t = true_len
    s_idx = jnp.arange(W)
    p = (t - 1) - ((t - 1 - s_idx) % W)  # (W,) positions, may be < 0
    valid = (p >= 0)[:, None, None]  # (W, 1, 1) over (W, Hkv, hd) rows
    pc = jnp.clip(p, 0, M - 1)

    glob, ring = caches.glob, caches.ring
    for li, g in enumerate(gl):  # static pattern: no cond needed
        ki = int(kind_idx[li])
        if g:
            glob = dataclasses.replace(
                glob,
                k=glob.k.at[ki, slot].set(new_views.k[li, 0]),
                v=glob.v.at[ki, slot].set(new_views.v[li, 0]),
            )
        else:
            rk = jnp.where(valid, new_views.k[li, 0][pc], 0)
            rv = jnp.where(valid, new_views.v[li, 0][pc], 0)
            ring = dataclasses.replace(
                ring,
                k=ring.k.at[ki, slot].set(rk),
                v=ring.v.at[ki, slot].set(rv),
            )
    if samp is None:
        tok = jnp.argmax(logits[0]).astype(jnp.int32)
    else:
        from .sampling import sample_per_row

        base_key, uid, temp, top_k, top_p = samp
        tok = sample_per_row(
            logits, base_key, uid[None], (true_len - 1)[None],
            temp[None], top_k[None], top_p[None],
        )[0]
    return tok, RingCaches(glob=glob, ring=ring)


def make_ring_engine_fns(cfg: dec.ModelConfig, impl: str = "auto"):
    """(prefill_fn, decode_fn, cache_factory) for serve.ServeEngine:
    continuous batching with window-sized ring pools on sliding layers.

    Usage::

        pf, df, factory = make_ring_engine_fns(cfg)
        eng = ServeEngine(cfg, params, prefill_fn=pf, decode_fn=df,
                          cache_factory=factory)
    """

    def prefill_fn(cfg_, params_, prompt, true_len, caches, slot, impl_=None,
                   samp=None):
        return _ring_prefill_into_slot(
            cfg, params_, prompt, jnp.int32(true_len), caches, slot, impl,
            samp,
        )

    def decode_fn(cfg_, params_, tokens, caches, positions, active,
                  impl_=None, samp=None):
        return _ring_decode_step(
            cfg, params_, tokens, caches, positions, active, impl, samp
        )

    def cache_factory(cfg_, max_batch, max_len):
        return init_ring_caches(cfg_, max_batch, max_len)

    return prefill_fn, decode_fn, cache_factory
