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

Lockstep (shared-position) generation only — the continuous-batching
engine keeps the flat pool cache for now.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from .kvcache import KVCache, KVLayerView

__all__ = ["RingCaches", "init_ring_caches", "ring_generate"]


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
                view = glob.layer(ki)
                y, io = dec.layer_forward(
                    cfg_plain, lp, h, cos_g, sin_g, mask_g, cache=view,
                    cache_pos=pos, impl=impl, layer_idx=li,
                )
                nk = io.kv
                glob = dataclasses.replace(
                    glob,
                    k=jax.lax.dynamic_update_slice(
                        glob.k, nk.k[None], (ki, 0, 0, 0, 0)
                    ),
                    v=jax.lax.dynamic_update_slice(
                        glob.v, nk.v[None], (ki, 0, 0, 0, 0)
                    ),
                )
                return y, glob, ring

            def run_ring(h, glob, ring):
                view = ring.layer(ki)
                y, io = dec.layer_forward(
                    cfg_plain, lp, h, cos_l, sin_l, None, cache=view,
                    cache_pos=pos % W, kv_valid=kv_valid_r, impl=impl,
                    layer_idx=li,
                )
                nk = io.kv
                ring = dataclasses.replace(
                    ring,
                    k=jax.lax.dynamic_update_slice(
                        ring.k, nk.k[None], (ki, 0, 0, 0, 0)
                    ),
                    v=jax.lax.dynamic_update_slice(
                        ring.v, nk.v[None], (ki, 0, 0, 0, 0)
                    ),
                )
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
