"""Paged KV cache: pooled fixed-size pages + per-slot page tables.

The reference has no serving/caching at all (SURVEY.md §5 long-context
row: paged KV absent from round 1). The dense slot pool
(serve/kvcache.py) reserves ``max_len`` rows per slot; under mixed
request lengths most of that is dead memory. Paging pools it:

  * one (n_layers, n_pages, page_size, Hkv, hd) pool per k/v — TOTAL KV
    memory is chosen, not per-slot;
  * a (B, max_pages) int32 page table maps each slot's logical positions
    to pool pages; allocation/free is HOST bookkeeping (a free list),
    exactly like slot scheduling — no device shapes ever change;
  * decode writes one token at (layer, table[row, pos//ps], pos%ps) — a
    tiny scatter; attention gathers the row's pages back into logical
    order and runs the standard masked kernel (the gather reads only
    pages the row owns — the same bytes a right-sized dense cache would).

``PagedServeEngine`` drops in for ServeEngine: same submit()/run() API,
same greedy outputs (tests pin token equality), but slots can oversubscribe
sequence capacity as long as LIVE tokens fit the pool.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from .engine import ServeEngine, _bucket
from .kvcache import KVStackedView, init_cache

__all__ = ["PagedKV", "PagedServeEngine", "init_paged"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKV:
    """Pooled paged cache. k/v: (L, P, ps, Hkv, hd) bf16 or int8; optional
    k_scale/v_scale: (L, P, ps, Hkv, 1) f32 (int8 pools); table: (B, maxp)
    int32 page ids (unallocated entries point at page 0 and are masked by
    position validity)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    table: jax.Array

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.table), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def max_len(self) -> int:  # logical per-slot capacity
        return self.table.shape[1] * self.page_size


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _PagedView:
    """Duck-typed per-layer cache view for layer_forward (decode path):
    per-row single-token writes through the page table, reads gather the
    row's pages into logical order. With scales present the int8 path
    exposes read_raw() so attention folds scales natively (no bf16
    dequant copy — see models.common.attention)."""

    k: jax.Array  # (L, P, ps, Hkv, hd)
    v: jax.Array
    k_scale: Optional[jax.Array]  # (L, P, ps, Hkv, 1) f32
    v_scale: Optional[jax.Array]
    table: jax.Array  # (B, maxp)
    li: jax.Array

    def tree_flatten(self):
        return (
            self.k, self.v, self.k_scale, self.v_scale, self.table, self.li
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def write_rows(self, k_new, v_new, positions):
        """(B, 1, Hkv, hd) at per-row ``positions``."""
        from .kvcache import _quantize_i8

        ps = self.k.shape[2]
        B = k_new.shape[0]
        rows = jnp.arange(B)
        page = self.table[rows, positions // ps]  # (B,)
        off = positions % ps
        li = jnp.broadcast_to(self.li, (B,))
        if self.k_scale is None:
            k = self.k.at[li, page, off].set(k_new[:, 0].astype(self.k.dtype))
            v = self.v.at[li, page, off].set(v_new[:, 0].astype(self.v.dtype))
            return _PagedView(k, v, None, None, self.table, self.li)
        kq, ks = _quantize_i8(k_new)
        vq, vs = _quantize_i8(v_new)
        return _PagedView(
            k=self.k.at[li, page, off].set(kq[:, 0]),
            v=self.v.at[li, page, off].set(vq[:, 0]),
            k_scale=self.k_scale.at[li, page, off].set(ks[:, 0]),
            v_scale=self.v_scale.at[li, page, off].set(vs[:, 0]),
            table=self.table,
            li=self.li,
        )

    def _gather(self, pool):
        p_li = jax.lax.dynamic_index_in_dim(pool, self.li, 0, keepdims=False)
        B, maxp = self.table.shape
        ps = p_li.shape[1]
        return p_li[self.table].reshape(B, maxp * ps, *p_li.shape[2:])

    def read(self, dtype=jnp.bfloat16):
        k = self._gather(self.k)
        v = self._gather(self.v)
        if self.k_scale is None:
            return k.astype(dtype), v.astype(dtype)
        ks = self._gather(self.k_scale)
        vs = self._gather(self.v_scale)
        return (
            (k.astype(jnp.float32) * ks).astype(dtype),
            (v.astype(jnp.float32) * vs).astype(dtype),
        )

    def read_raw(self):
        k = self._gather(self.k)
        v = self._gather(self.v)
        if self.k_scale is None:
            return k, v, None, None
        return k, v, self._gather(self.k_scale), self._gather(self.v_scale)

    def carry(self):
        return (self.k, self.v, self.k_scale, self.v_scale)


def init_paged(cfg, n_pages: int, page_size: int, max_batch: int,
               max_pages_per_slot: int, dtype=jnp.bfloat16,
               quantized: bool = False) -> PagedKV:
    L, Hkv, hd = cfg.n_layers, cfg.kv_heads, cfg.hd
    shape = (L, n_pages, page_size, Hkv, hd)
    if quantized:
        return PagedKV(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros((L, n_pages, page_size, Hkv, 1), jnp.float32),
            v_scale=jnp.zeros((L, n_pages, page_size, Hkv, 1), jnp.float32),
            table=jnp.zeros((max_batch, max_pages_per_slot), jnp.int32),
        )
    return PagedKV(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        k_scale=None,
        v_scale=None,
        table=jnp.zeros((max_batch, max_pages_per_slot), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _paged_decode_step(cfg, params, tokens, cache, positions, active,
                       impl="auto", samp=None):
    """ServeEngine decode_fn contract over a PagedKV cache."""
    from .sampling import sample_per_row

    B = tokens.shape[0]
    M = cache.max_len
    x = dec.embed_tokens_per_row(cfg, params, tokens, positions)
    if cfg.pos == "rope":
        cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
        cos = jnp.take(cos_all, positions, axis=0)[:, None]
        sin = jnp.take(sin_all, positions, axis=0)[:, None]
        cos_l = sin_l = None
        if cosl_all is not None:
            cos_l = jnp.take(cosl_all, positions, axis=0)[:, None]
            sin_l = jnp.take(sinl_all, positions, axis=0)[:, None]
    else:
        cos = sin = jnp.zeros((B, 1, 1), jnp.float32)
        cos_l = sin_l = None
    kv_valid = jnp.arange(M)[None, :] <= positions[:, None]
    mask = None
    if cfg.pos == "alibi":
        from ..models.common import alibi_slopes

        slopes = alibi_slopes(cfg.n_heads)
        rel = (
            jnp.arange(M, dtype=jnp.float32)[None, :]
            - positions.astype(jnp.float32)[:, None]
        )
        mask = slopes[None, :, None, None] * rel[:, None, None, :]

    def body(carry, li):
        h, kvt = carry
        view = _PagedView(*kvt, cache.table, li)
        lp = dec.layer_view(params["layers"], li)
        y, io = dec.layer_forward(
            cfg, lp, h, cos, sin, mask, cache=view, cache_pos=positions,
            kv_valid=kv_valid, impl=impl, layer_idx=li,
            cos_loc=cos_l, sin_loc=sin_l,
        )
        return (y, io.kv.carry()), None

    (h, kvt), _ = jax.lax.scan(
        body,
        (x, (cache.k, cache.v, cache.k_scale, cache.v_scale)),
        jnp.arange(cfg.n_layers),
    )
    logits = dec.unembed(cfg, params, h)[:, 0]
    if samp is None:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        base_key, uids, temps, top_ks, top_ps = samp
        nxt = sample_per_row(
            logits, base_key, uids, positions, temps, top_ks, top_ps
        )
    nxt = jnp.where(active, nxt, 0)
    return nxt, PagedKV(*kvt, cache.table)


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _paged_prefill(cfg, params, prompt, true_len, cache, pages, impl="auto",
                   samp=None):
    """Prefill a (1, Lb) prompt on a temp flat cache, then scatter its KV
    into ``pages`` (Lb/ps page ids). Returns (first token, cache)."""
    from .sampling import sample_per_row

    ps = cache.page_size
    Lb = prompt.shape[1]
    M = cache.max_len
    tmp = init_cache(
        cfg, 1, Lb,
        dtype=jnp.bfloat16 if cache.quantized else cache.k.dtype,
        quantized=cache.quantized,
    )

    h = dec.embed_tokens(cfg, params, prompt)
    cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
    cos, sin = cos_all[:Lb], sin_all[:Lb]
    cos_l = None if cosl_all is None else cosl_all[:Lb]
    sin_l = None if sinl_all is None else sinl_all[:Lb]
    mask = dec.build_mask(cfg, Lb, Lb)

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
        body, (h, KVStackedView.of(tmp, 0).carry()), jnp.arange(cfg.n_layers)
    )
    h_last = jax.lax.dynamic_slice_in_dim(h, true_len - 1, 1, axis=1)
    logits = dec.unembed(cfg, params, h_last)[:, 0]

    # scatter (L, 1, Lb, Hkv, hd) -> pool pages (Lb/ps chunks)
    tk, tv, tks, tvs = kvt
    L = tk.shape[0]
    n_chunks = Lb // ps

    def chunked(a):
        return a.reshape(L, n_chunks, ps, *a.shape[3:])

    k = cache.k.at[:, pages].set(chunked(tk))
    v = cache.v.at[:, pages].set(chunked(tv))
    k_scale = v_scale = None
    if cache.quantized:
        k_scale = cache.k_scale.at[:, pages].set(chunked(tks))
        v_scale = cache.v_scale.at[:, pages].set(chunked(tvs))

    if samp is None:
        tok = jnp.argmax(logits[0]).astype(jnp.int32)
    else:
        base_key, uid, temp, top_k, top_p = samp
        tok = sample_per_row(
            logits, base_key, uid[None], (true_len - 1)[None],
            temp[None], top_k[None], top_p[None],
        )[0]
    return tok, PagedKV(k, v, k_scale, v_scale, cache.table)


class PagedServeEngine(ServeEngine):
    """Continuous batching over a paged KV pool.

    ``kv_pages`` total pages of ``page_size`` tokens each are shared by
    all slots; per-slot capacity is bounded by ``max_len`` (table width)
    but memory is only consumed for LIVE tokens. Admission fails over to
    queueing when the pool is exhausted (pages free as requests retire).
    """

    def __init__(self, cfg, params, max_batch=8, max_len=2048,
                 kv_pages: Optional[int] = None, page_size: int = 64,
                 impl="auto", seed: int = 0, dtype=jnp.bfloat16,
                 kv_quant: bool = False, decode_quantum: int = 1):
        # Sliding-window configs: the window is enforced in-attention
        # (models.decoder.sliding_adjust folds it into kv_valid on the
        # per-row decode path), so results are exact. Pages holding
        # out-of-window history are NOT yet reclaimed — the memory
        # optimization belongs with a window-aware page table; the ring
        # engine (make_ring_engine_fns) already gives O(window) memory
        # when every layer slides.
        if max_len % page_size:
            raise ValueError("max_len must be a multiple of page_size")
        maxp = max_len // page_size
        kv_pages = kv_pages or max_batch * maxp  # default: dense-equivalent
        # Physical page 0 is a reserved SCRATCH page: idle slots and
        # unallocated table entries point at it, so their don't-care decode
        # writes can never stomp a live page. Usable pool = kv_pages.
        super().__init__(
            cfg, params, max_batch=max_batch, max_len=max_len, impl=impl,
            seed=seed, decode_quantum=decode_quantum,
            prefill_fn=self._pf, decode_fn=_paged_decode_step,
            cache_factory=lambda c, b, m: init_paged(
                c, kv_pages + 1, page_size, b, maxp, dtype,
                quantized=kv_quant,
            ),
        )
        self.ps = page_size
        self._bucket_lo = page_size  # prefill buckets stay page-aligned
        self._free: List[int] = list(range(kv_pages, 0, -1))
        self._pages: List[List[int]] = [[] for _ in range(max_batch)]
        self._table = np.zeros((max_batch, maxp), np.int32)

    # -------------------------------------------------- page accounting --
    def _alloc(self, slot: int, n: int) -> bool:
        if len(self._free) < n:
            return False
        for _ in range(n):
            pg = self._free.pop()
            self._table[slot, len(self._pages[slot])] = pg
            self._pages[slot].append(pg)
        self.cache = dataclasses.replace(
            self.cache, table=jnp.asarray(self._table)
        )
        return True

    def _release(self, slot: int) -> None:
        self._free.extend(reversed(self._pages[slot]))
        self._pages[slot] = []
        self._table[slot] = 0

    def _maybe_finish(self, slot: int) -> None:
        req = self.slots[slot]
        super()._maybe_finish(slot)
        if req is not None and self.slots[slot] is None:
            self._release(slot)

    # ---------------------------------------------------- engine hooks --
    def _plan_admissions(self):
        """Admit only while the pool has pages for the prefill bucket + the
        first decode page (requests wait in queue otherwise)."""
        plans = []
        for slot in range(self.B):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue[0]
            Lp = len(req.prompt)
            if Lp + req.max_new > self.M:
                self.queue.pop(0)
                req.done = True
                req.out = []
                self.finished.append(req)
                continue
            Lb = min(_bucket(Lp, self.ps), self.M)
            need = Lb // self.ps
            if len(self._free) < need:
                break  # pool exhausted: wait for retirements
            assert self._alloc(slot, need)
            plans.append((slot, self.queue.pop(0)))
        return plans

    def _pf(self, cfg, params, prompt, true_len, cache, slot, impl="auto",
            samp=None):
        Lb = prompt.shape[1]
        pages = jnp.asarray(
            self._table[slot, : Lb // self.ps], jnp.int32
        )
        return _paged_prefill(
            cfg, params, prompt, true_len, cache, pages, impl, samp
        )

    def step(self) -> bool:
        # allocate the page a row is about to write, when it crosses a
        # page boundary (position % ps == 0)
        for slot in range(self.B):
            if self.slots[slot] is None:
                continue
            pos = int(self.positions[slot])
            need_pages = pos // self.ps + 1
            while len(self._pages[slot]) < need_pages:
                if not self._alloc(slot, 1):
                    raise RuntimeError(
                        "paged KV pool exhausted mid-decode; size kv_pages "
                        "for worst-case live tokens (eviction/preemption is "
                        "future work)"
                    )
        return super().step()

    # ------------------------------------------------ snapshot support --
    def _snapshot_extra(self):
        """Host page bookkeeping for save_engine_state (the device-side
        table rides the cache pytree; the free list / per-slot page lists
        live here)."""
        return {
            "free": list(self._free),
            "pages": [list(p) for p in self._pages],
            "table": self._table.copy(),
        }

    def _restore_extra(self, extra) -> None:
        self._free = list(extra["free"])
        self._pages = [list(p) for p in extra["pages"]]
        self._table[:] = extra["table"]
