"""Continuous-batching serving engine (single host).

The reference has no serving path at all (SURVEY.md §5). This engine is the
standard slot-based continuous batcher, TPU-shaped:

  * a fixed pool of B slots shares one static-shape KV cache — admission
    and retirement never change any compiled shape;
  * new requests prefill into a free slot via a batch-1 prefill program
    whose cache rows scatter into the pool (prompt lengths are bucketed to
    powers of two to bound compile count);
  * all active slots advance together through ONE jitted per-row decode
    step (per-slot positions, per-row RoPE, per-row cache writes,
    per-row validity masks);
  * the host loop (pure Python/numpy bookkeeping) admits, steps, detects
    EOS/max-token stops, and frees slots — it never touches device shapes.

Greedy sampling for now; the sampling hook is a single argmax site.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from .kvcache import KVCache, KVStackedView, init_cache

__all__ = ["Request", "ServeEngine"]


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # (Lp,) int32
    max_new: int
    eos_id: Optional[int] = None
    out: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _decode_step(cfg, params, tokens, cache, positions, active, impl="auto"):
    """One per-row decode step for all slots.

    tokens (B,) int32; positions (B,) int32 (where the new token sits);
    active (B,) bool. Returns (next_tokens (B,), cache).
    """
    B = tokens.shape[0]
    M = cache.max_len
    x = dec.embed_tokens_per_row(cfg, params, tokens, positions)  # (B, 1, D)
    if cfg.pos == "rope":
        cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
        cos = jnp.take(cos_all, positions, axis=0)[:, None]  # (B, 1, hd/2)
        sin = jnp.take(sin_all, positions, axis=0)[:, None]
        cos_l = sin_l = None
        if cosl_all is not None:
            cos_l = jnp.take(cosl_all, positions, axis=0)[:, None]
            sin_l = jnp.take(sinl_all, positions, axis=0)[:, None]
    else:
        cos = sin = jnp.zeros((B, 1, 1), jnp.float32)
        cos_l = sin_l = None

    kv_valid = jnp.arange(M)[None, :] <= positions[:, None]  # (B, M)
    mask = None
    if cfg.pos == "alibi":
        from ..models.common import alibi_slopes

        slopes = alibi_slopes(cfg.n_heads)  # (H,)
        rel = (
            jnp.arange(M, dtype=jnp.float32)[None, :]
            - positions.astype(jnp.float32)[:, None]
        )  # (B, M)
        mask = (slopes[None, :, None, None] * rel[:, None, None, :])  # (B,H,1,M)
    def body(carry, li):
        h, kvt = carry
        kvl = KVStackedView(*kvt, li)
        lp = dec.layer_view(params["layers"], li)
        y, io = dec.layer_forward(
            cfg, lp, h, cos, sin, mask,
            cache=kvl, cache_pos=positions, kv_valid=kv_valid, impl=impl,
            layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
        )
        return (y, io.kv.carry()), None

    (h, kvt), _ = jax.lax.scan(
        body, (x, KVStackedView.of(cache, 0).carry()), jnp.arange(cfg.n_layers)
    )
    logits = dec.unembed(cfg, params, h)[:, 0]  # (B, V)
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(active, nxt, 0)
    new_cache = KVCache(*kvt, length=cache.length)
    return nxt, new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "slot", "impl"))
def _prefill_into_slot(cfg, params, prompt, true_len, cache, slot: int, impl="auto"):
    """Prefill one right-padded (1, Lb) prompt on a temp 1-row cache and
    scatter its rows into pool slot ``slot``.

    ``true_len`` is traced, so only the bucket length Lb (and the slot)
    cause compiles; the next token comes from the hidden state at position
    ``true_len - 1`` (causality makes the right padding inert, and decode
    overwrites pad cache entries as the sequence grows past them).
    Returns (next-token scalar, cache).
    """
    M = cache.max_len
    Lb = prompt.shape[1]
    tmp = init_cache(cfg, 1, M, quantized=cache.quantized)

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
        body, (h, KVStackedView.of(tmp, 0).carry()), jnp.arange(cfg.n_layers)
    )
    h_last = jax.lax.dynamic_slice_in_dim(h, true_len - 1, 1, axis=1)
    logits = dec.unembed(cfg, params, h_last)[:, 0]  # (1, V)

    def put(pool, row):
        return pool.at[:, slot].set(row[:, 0])

    tk, tv, tks, tvs = kvt
    cache = KVCache(
        k=put(cache.k, tk),
        v=put(cache.v, tv),
        k_scale=None if cache.k_scale is None else put(cache.k_scale, tks),
        v_scale=None if cache.v_scale is None else put(cache.v_scale, tvs),
        length=cache.length,
    )
    return jnp.argmax(logits[0]).astype(jnp.int32), cache


class ServeEngine:
    """Host-side scheduler over the jitted prefill/decode programs."""

    def __init__(
        self,
        cfg: dec.ModelConfig,
        params,
        max_batch: int = 8,
        max_len: int = 2048,
        kv_quant: bool = False,
        impl: str = "auto",
        prefill_fn=None,
        decode_fn=None,
        kv_heads: Optional[int] = None,
        cache_factory=None,
    ):
        """``prefill_fn``/``decode_fn`` override the default jitted programs
        with strategy-specific ones sharing the same contracts — e.g.
        ``parallel.tp.make_tp_engine_fns`` for manual tensor parallelism
        (head-sharded pool cache, shard-local kernels) or
        ``serve.ring.make_ring_engine_fns`` (window-sized ring pools on
        sliding layers). ``kv_heads`` overrides the pool's kv-head count
        (unused by the TP fns, which shard the standard pool);
        ``cache_factory(cfg, max_batch, max_len)`` replaces the pool
        entirely — the engine treats the cache as opaque state threaded
        through the prefill/decode fns."""
        self.cfg = cfg
        self.params = params
        self.B = max_batch
        self.M = max_len
        self.impl = impl
        self._prefill_fn = prefill_fn or _prefill_into_slot
        self._decode_fn = decode_fn or _decode_step
        if cache_factory is not None:
            if kv_quant or kv_heads is not None:
                raise ValueError(
                    "cache_factory replaces the KV pool entirely; kv_quant/"
                    "kv_heads would be silently ignored — thread them into "
                    "the factory instead"
                )
            self.cache = cache_factory(cfg, max_batch, max_len)
        else:
            cache_cfg = cfg if kv_heads is None else cfg.with_(n_kv_heads=kv_heads)
            self.cache = init_cache(
                cache_cfg, max_batch, max_len, quantized=kv_quant
            )
        self.queue: List[Request] = []
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.positions = np.zeros(max_batch, np.int32)  # next write position
        self.tokens = np.zeros(max_batch, np.int32)  # next token to feed
        self._uid = 0
        import time as _time

        self._time = _time
        self._t0 = _time.time()
        self.stats = {
            "admitted": 0,
            "completed": 0,
            "steps": 0,
            "tokens": 0,
            "tokens_per_s": 0.0,
        }

    def submit(
        self, prompt, max_new: int, eos_id: Optional[int] = None
    ) -> Request:
        req = Request(
            uid=self._uid,
            prompt=np.asarray(prompt, np.int32).reshape(-1),
            max_new=max_new,
            eos_id=eos_id,
        )
        self._uid += 1
        self.queue.append(req)
        return req

    # ---------------------------------------------------- scheduling ----
    def _admit(self) -> None:
        for slot in range(self.B):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            Lp = len(req.prompt)
            if Lp + req.max_new > self.M:
                req.done = True  # reject: too long for the pool
                req.out = []
                continue
            Lb = min(_bucket(Lp), self.M)
            padded = np.zeros(Lb, np.int32)
            padded[:Lp] = req.prompt
            nxt, self.cache = self._prefill_fn(
                self.cfg,
                self.params,
                jnp.asarray(padded[None, :]),
                jnp.int32(Lp),
                self.cache,
                slot,
                self.impl,
            )
            first = int(nxt)
            req.out.append(first)
            self.slots[slot] = req
            self.positions[slot] = Lp
            self.tokens[slot] = first
            self.stats["admitted"] += 1
            self._maybe_finish(slot)

    def _maybe_finish(self, slot: int) -> None:
        req = self.slots[slot]
        if req is None:
            return
        if len(req.out) >= req.max_new or (
            req.eos_id is not None and req.out and req.out[-1] == req.eos_id
        ):
            req.done = True
            self.slots[slot] = None
            self.stats["completed"] += 1

    def step(self) -> bool:
        """Admit + advance all active slots one token. False when idle."""
        self._admit()
        active = np.array([r is not None for r in self.slots])
        if not active.any():
            return bool(self.queue)
        nxt, self.cache = self._decode_fn(
            self.cfg,
            self.params,
            jnp.asarray(self.tokens),
            self.cache,
            jnp.asarray(self.positions),
            jnp.asarray(active),
            self.impl,
        )
        nxt = np.asarray(nxt)
        self.stats["steps"] += 1
        for slot in range(self.B):
            if self.slots[slot] is None:
                continue
            self.positions[slot] += 1
            self.tokens[slot] = nxt[slot]
            self.slots[slot].out.append(int(nxt[slot]))
            self.stats["tokens"] += 1
            self._maybe_finish(slot)
        elapsed = max(self._time.time() - self._t0, 1e-9)
        self.stats["tokens_per_s"] = round(self.stats["tokens"] / elapsed, 2)
        return True

    def run(self, max_steps: int = 100000) -> None:
        """Drain the queue completely."""
        steps = 0
        while (self.queue or any(s is not None for s in self.slots)) and (
            steps < max_steps
        ):
            self.step()
            steps += 1
