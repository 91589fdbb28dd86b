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
    EOS/max-token stops, and frees slots — it never touches device shapes;
  * per-request sampling (temperature/top-k/top-p) runs INSIDE the jitted
    decode step with per-row parameters (serve.sampling.sample_per_row);
    greedy rows stay exact argmax;
  * optional speculative decoding (``draft=...``): a draft-model slot pool
    mirrors the target pool, every step drafts k tokens per row and
    verifies them in ONE (B, k+1) per-row target forward — rows advance
    1..k+1 tokens per step independently. Greedy rows are token-exact vs
    the non-speculative engine.
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
from .sampling import SamplingConfig, sample_per_row

__all__ = ["Request", "ServeEngine", "save_engine_state", "load_engine_state"]


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # (Lp,) int32
    max_new: int
    eos_id: Optional[int] = None
    sampling: Optional[SamplingConfig] = None  # None => greedy
    out: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _rows_forward(cfg, params, tokens, cache, positions, impl="auto"):
    """Per-row windowed forward: tokens (B, Lw) occupy positions
    ``positions[b] .. positions[b]+Lw-1`` of each row's sequence. Writes the
    window into the cache and returns ((B, Lw, V) logits, cache).

    Lw == 1 is the continuous-batching decode step; Lw == k+1 is the
    speculative verify step. Causality within the window and validity of
    the cache prefix are one additive (B, 1, Lw, M) mask (ALiBi adds its
    per-head bias on top).
    """
    B, Lw = tokens.shape
    M = cache.max_len
    pos2 = positions[:, None] + jnp.arange(Lw)[None, :]  # (B, Lw)
    x = dec.embed_tokens_per_row(cfg, params, tokens, pos2)  # (B, Lw, D)
    if cfg.pos == "rope":
        cos_all, sin_all, cosl_all, sinl_all = dec.pos_tables(cfg, M)
        cos = jnp.take(cos_all, pos2, axis=0)  # (B, Lw, hd/2)
        sin = jnp.take(sin_all, pos2, axis=0)
        cos_l = sin_l = None
        if cosl_all is not None:
            cos_l = jnp.take(cosl_all, pos2, axis=0)
            sin_l = jnp.take(sinl_all, pos2, axis=0)
    else:
        cos = sin = jnp.zeros((B, Lw, 1), jnp.float32)
        cos_l = sin_l = None

    kv_valid = None
    mask = None
    if Lw == 1:
        # decode fast path: validity is per-row only (cheap bool mask)
        kv_valid = jnp.arange(M)[None, :] <= positions[:, None]  # (B, M)
    else:
        ok = jnp.arange(M)[None, None, :] <= pos2[:, :, None]  # (B, Lw, M)
        mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
    if cfg.pos == "alibi":
        from ..models.common import alibi_slopes

        slopes = alibi_slopes(cfg.n_heads)  # (H,)
        rel = (
            jnp.arange(M, dtype=jnp.float32)[None, None, :]
            - pos2.astype(jnp.float32)[:, :, None]
        )  # (B, Lw, M)
        bias = slopes[None, :, None, None] * rel[:, None]  # (B, H, Lw, M)
        mask = bias if mask is None else bias + mask

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
    logits = dec.unembed(cfg, params, h)  # (B, Lw, V)
    return logits, KVCache(*kvt, length=cache.length)


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _decode_step(cfg, params, tokens, cache, positions, active, impl="auto",
                 samp=None):
    """One per-row decode step for all slots.

    tokens (B,) int32; positions (B,) int32 (where the new token sits);
    active (B,) bool; samp None (greedy) or (base_key, uids, temps, top_ks,
    top_ps) per-row sampling arrays. Returns (next_tokens (B,), cache).
    """
    logits, new_cache = _rows_forward(
        cfg, params, tokens[:, None], cache, positions, impl
    )
    logits = logits[:, 0]  # (B, V)
    if samp is None:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        base_key, uids, temps, top_ks, top_ps = samp
        nxt = sample_per_row(
            logits, base_key, uids, positions, temps, top_ks, top_ps
        )
    nxt = jnp.where(active, nxt, 0)
    return nxt, new_cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "q", "impl", "decode_fn")
)
def _decode_quantum(cfg, params, tokens, cache, positions, active, samp,
                    q, impl, decode_fn):
    """``q`` decode steps in ONE jitted program (a lax.scan over the
    engine's per-step decode_fn) — the multi-step scheduling quantum.

    One host dispatch + one device->host fetch amortize across q tokens
    per row: on this infrastructure the per-step host round-trip costs
    10-100x the batch-8 step compute (measured 113 ms/step vs 6.2 ms,
    RESULTS round 5), and even on local PCIe hosts the dispatch floor is
    real. Returns ((B, q) tokens, cache). Rows keep decoding past an EOS
    emitted mid-quantum; the host truncates and retires them at the
    quantum boundary (their cache slots are re-prefilled on admission, and
    kv_valid masks any stale suffix), so outputs are token-identical to
    the single-step engine. Sampling keys stay per-(seed, uid, position):
    positions advance inside the scan and flow into sample_per_row."""

    def body(carry, _):
        tok, kv, pos = carry
        if samp is None:
            nxt, kv = decode_fn(cfg, params, tok, kv, pos, active, impl)
        else:
            nxt, kv = decode_fn(
                cfg, params, tok, kv, pos, active, impl, samp
            )
        return (nxt, kv, pos + 1), nxt

    (tok, cache, _), seq = jax.lax.scan(
        body, (tokens, cache, positions), None, length=q
    )
    return jnp.swapaxes(seq, 0, 1), cache  # (B, q)


@functools.partial(jax.jit, static_argnames=("cfg_t", "cfg_d", "k", "impl"))
def _spec_decode_step(
    cfg_t, params_t, cfg_d, params_d, tokens, t_cache, d_cache, positions,
    active, k, impl="auto", samp=None,
):
    """One speculative continuous-batching step: draft k tokens per row,
    verify all rows in ONE (B, k+1) per-row target forward.

    Returns (votes (B, k+1), n_acc (B,), t_cache, d_cache): row b emits
    ``votes[b, :n_acc[b]+1]`` and its next feed token is
    ``votes[b, n_acc[b]]`` at position ``positions[b] + n_acc[b] + 1``.

    Greedy rows (samp None, or temp <= 0): argmax draft + argmax verify —
    token-exact vs the non-speculative greedy engine. Sampled rows use
    SPECULATIVE SAMPLING (Leviathan/Chen rejection): drafts sample from
    the draft's filtered distribution, acceptance tests pt/pd, rejections
    resample from the residual — the emitted stream is distributed exactly
    as target-only sampling (serve.sampling.spec_accept_per_row; the
    random STREAM differs from the plain sampled engine's, by design).

    k+1 draft steps (not k): the extra step writes draft KV at position
    c+k so a fully-accepted round leaves no hole in the draft cache (see
    serve.speculative._spec_generate, same invariant per row).
    """
    from .sampling import _spec_keys, filtered_logits, spec_accept_per_row

    B = tokens.shape[0]
    if samp is not None:
        base_key, uids, temps, top_ks, top_ps = samp
        sampled_row = temps > 0.0  # (B,)

    def d_body(carry, i):
        dc, tok = carry
        lg, dc = _rows_forward(
            cfg_d, params_d, tok[:, None], dc, positions + i, impl
        )
        lg = lg[:, 0]  # (B, V)
        greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        if samp is None:
            return (dc, greedy_tok), (greedy_tok, jnp.zeros((B, 0)))
        flt = filtered_logits(lg, temps, top_ks, top_ps)
        pd_i = jax.nn.softmax(flt, axis=-1)  # (B, V)
        kd = _spec_keys(base_key, uids, positions + i, 1, salt=1)[:, 0]
        stok = jax.vmap(jax.random.categorical)(
            kd, jnp.log(pd_i + 1e-20)
        ).astype(jnp.int32)
        nxt = jnp.where(sampled_row, stok, greedy_tok)
        return (dc, nxt), (nxt, pd_i)

    (d_cache, _), (drafts, pds) = jax.lax.scan(
        d_body, (d_cache, tokens), jnp.arange(k + 1)
    )
    drafts = jnp.transpose(drafts[:k])  # (B, k)

    toks = jnp.concatenate([tokens[:, None], drafts], axis=1)  # (B, k+1)
    vlogits, t_cache = _rows_forward(
        cfg_t, params_t, toks, t_cache, positions, impl
    )
    votes = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)  # (B, k+1)

    ok = drafts == votes[:, :k]  # (B, k)
    n_acc = jnp.argmin(
        jnp.concatenate([ok, jnp.zeros((B, 1), bool)], axis=1), axis=1
    ).astype(jnp.int32)  # first False per row; k if all accepted

    if samp is not None:
        pd = jnp.transpose(pds[:k], (1, 0, 2))  # (B, k, V)
        V = vlogits.shape[-1]
        flt_t = filtered_logits(
            vlogits.reshape(B * (k + 1), V),
            jnp.repeat(temps, k + 1),
            jnp.repeat(top_ks, k + 1),
            jnp.repeat(top_ps, k + 1),
        ).reshape(B, k + 1, V)
        pt = jax.nn.softmax(flt_t, axis=-1)
        s_tokens, s_nacc = spec_accept_per_row(
            base_key, uids, positions, drafts, pd, pt
        )
        votes = jnp.where(sampled_row[:, None], s_tokens, votes)
        n_acc = jnp.where(sampled_row, s_nacc, n_acc)

    n_acc = jnp.where(active, n_acc, 0)
    votes = jnp.where(active[:, None], votes, 0)
    return votes, n_acc, t_cache, d_cache


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _prefill_into_slot(cfg, params, prompt, true_len, cache, slot,
                       impl="auto", samp=None):
    """Prefill one right-padded (1, Lb) prompt on a temp 1-row cache and
    scatter its rows into pool slot ``slot``.

    ``true_len`` AND ``slot`` are traced (the scatter is a
    dynamic_update_slice), so only the bucket length Lb causes compiles —
    with slot static, a max_batch-8 engine compiled 8 variants per bucket,
    and the 24 extra compiles landed MID-MEASUREMENT as requests rotated
    through slots (measured 0.79 s/admission on the tunnel, 3x the decode
    phase). The next token comes from the hidden state at position
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
    if samp is None:
        tok = jnp.argmax(logits[0]).astype(jnp.int32)
    else:
        base_key, uid, temp, top_k, top_p = samp
        tok = sample_per_row(
            logits, base_key, uid[None], (true_len - 1)[None],
            temp[None], top_k[None], top_p[None],
        )[0]
    return tok, cache


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
        seed: int = 0,
        draft=None,
        spec_k: int = 4,
        multihost: bool = False,
        decode_quantum: int = 1,
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
        through the prefill/decode fns.

        ``seed`` keys per-request sampling (requests submitted with a
        SamplingConfig; greedy rows stay exact argmax).

        ``draft=(cfg_d, params_d)`` enables speculative decoding: a draft
        pool mirrors the target pool and every step drafts ``spec_k``
        tokens per row + verifies them in one per-row target forward.
        Greedy-token-exact vs the plain engine; requires the default
        prefill/decode programs and non-sliding-window configs.

        ``decode_quantum`` > 1 batches up to that many decode steps into
        one jitted scan per host dispatch (_decode_quantum) — the
        throughput/latency knob of multi-step scheduling. Outputs are
        token-identical to quantum 1; the costs are admission latency
        (a queued request waits out the current quantum) and per-token
        emission granularity (tokens surface in bursts at quantum
        boundaries). The effective quantum self-limits to the smallest
        remaining token budget among active rows (power-of-2 bucketed to
        bound compiles), so no step is wasted on a row past max_new.

        ``multihost=True`` runs the scheduler on a multi-process JAX
        cluster: process 0 owns the request queue and plans admissions;
        the per-step plan (slots, prompts, sampling params) is broadcast
        with ``multihost_utils.broadcast_one_to_all`` so every process
        executes the IDENTICAL sequence of jitted prefill/decode programs
        (the SPMD requirement). Submit requests on process 0 only."""
        self.cfg = cfg
        self.params = params
        self.B = max_batch
        self.M = max_len
        self.impl = impl
        self._prefill_fn = prefill_fn or _prefill_into_slot
        self._decode_fn = decode_fn or _decode_step
        self._base_key = jax.random.PRNGKey(seed)
        self.temps = np.zeros(max_batch, np.float32)
        self.topks = np.zeros(max_batch, np.int32)
        self.topps = np.ones(max_batch, np.float32)
        self.uids = np.zeros(max_batch, np.int32)
        self.draft = draft
        self.spec_k = spec_k
        self.decode_quantum = max(1, int(decode_quantum))
        if draft is not None:
            cfg_d, _ = draft
            if prefill_fn or decode_fn or cache_factory:
                raise ValueError(
                    "speculative decoding requires the default engine "
                    "programs (no prefill_fn/decode_fn/cache_factory)"
                )
            if cfg.has_sliding or cfg_d.has_sliding:
                raise ValueError(
                    "speculative engine does not support sliding-window "
                    "configs yet (per-row windowed verify vs window mask)"
                )
            if cfg_d.vocab_size != cfg.vocab_size:
                raise ValueError("draft and target must share a vocabulary")
            self.d_cache = init_cache(cfg_d, max_batch, max_len)
            self.stats_spec = {"rounds": 0, "drafted": 0, "accepted": 0}
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
        self._mh = bool(multihost) and jax.process_count() > 1
        self._proc0 = jax.process_index() == 0
        self._mh_has_queue = False
        self._bucket_lo = 16  # min prefill bucket (paged engine: page size)
        self.finished: List[Request] = []  # retired requests, in order
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
            # wall-time split of the two device-touching phases (admission
            # prefills + their first-token fetch vs decode dispatch+fetch):
            # on tunnel-attached hosts the dispatch round-trips dominate,
            # and this split is what locates them (RESULTS round 5)
            "t_admit_s": 0.0,
            "t_decode_s": 0.0,
        }

    def submit(
        self,
        prompt,
        max_new: int,
        eos_id: Optional[int] = None,
        sampling: Optional[SamplingConfig] = None,
    ) -> Request:
        if sampling is not None and sampling.greedy:
            sampling = None
        req = Request(
            uid=self._uid,
            prompt=np.asarray(prompt, np.int32).reshape(-1),
            max_new=max_new,
            eos_id=eos_id,
            sampling=sampling,
        )
        self._uid += 1
        self.queue.append(req)
        return req

    # ---------------------------------------------------- scheduling ----
    def _plan_admissions(self) -> List:
        """Host-side admission decisions (pops the queue; no device work).
        Returns [(slot, Request), ...] — at most one per free slot."""
        plans = []
        budget = self.spec_k + 1 if self.draft is not None else 0
        for slot in range(self.B):
            if self.slots[slot] is not None:
                continue
            while self.queue:
                req = self.queue.pop(0)
                if len(req.prompt) + req.max_new + budget > self.M:
                    req.done = True  # reject: too long for the pool
                    req.out = []
                    self.finished.append(req)
                    continue
                plans.append((slot, req))
                break
        return plans

    def _exec_admission(self, slot: int, req: Request) -> None:
        """Dispatch + finalize one admission (see the split below; kept as
        the single-call form for subclass overrides and multihost)."""
        self._finalize_admission(slot, req, self._dispatch_admission(slot, req))

    def _dispatch_admission(self, slot: int, req: Request):
        """Run the (deterministic, device-touching) admission: prefill into
        ``slot`` + slot bookkeeping. Returns the on-device next-token
        scalar WITHOUT fetching it — _admit dispatches every planned
        admission first and fetches afterwards, so n same-step admissions
        cost one host round-trip instead of n (each int(nxt) fetch blocks
        on the full prefill; measured ~0.4-0.7 s per round-trip on the
        tunnel). In multihost mode every process calls this with identical
        arguments."""
        Lp = len(req.prompt)
        Lb = min(_bucket(Lp, self._bucket_lo), self.M)
        padded = np.zeros(Lb, np.int32)
        padded[:Lp] = req.prompt
        sc = req.sampling
        self.uids[slot] = req.uid
        self.temps[slot] = sc.temperature if sc else 0.0
        self.topks[slot] = sc.top_k if sc else 0
        self.topps[slot] = sc.top_p if sc else 1.0
        samp = None
        if sc is not None:
            samp = (
                self._base_key,
                jnp.int32(req.uid),
                jnp.float32(sc.temperature),
                jnp.int32(sc.top_k),
                jnp.float32(sc.top_p),
            )
        # samp passed only when sampling: keeps the (cfg, params,
        # prompt, true_len, cache, slot, impl) contract for greedy
        # strategy overrides; a sampled request against an override
        # without samp support fails loudly (TypeError).
        pf_args = (
            self.cfg, self.params, jnp.asarray(padded[None, :]),
            jnp.int32(Lp), self.cache, slot, self.impl,
        )
        nxt, self.cache = (
            self._prefill_fn(*pf_args)
            if samp is None
            else self._prefill_fn(*pf_args, samp)
        )
        if self.draft is not None:
            cfg_d, params_d = self.draft
            _, self.d_cache = _prefill_into_slot(
                cfg_d, params_d, jnp.asarray(padded[None, :]),
                jnp.int32(Lp), self.d_cache, slot, self.impl,
            )
        return nxt

    def _finalize_admission(self, slot: int, req: Request, nxt) -> None:
        first = int(nxt)
        req.out.append(first)
        self.slots[slot] = req
        self.positions[slot] = len(req.prompt)
        self.tokens[slot] = first
        self.stats["admitted"] += 1
        self._maybe_finish(slot)

    def _admit(self) -> None:
        t0 = self._time.time()
        try:
            self._admit_inner()
        finally:
            self.stats["t_admit_s"] = round(
                self.stats.get("t_admit_s", 0.0)
                + (self._time.time() - t0), 3
            )

    def _admit_inner(self) -> None:
        if not self._mh:
            # dispatch every planned prefill before fetching any first
            # token: one blocking round-trip for the whole batch of
            # admissions instead of one per admission
            pend = [
                (slot, req, self._dispatch_admission(slot, req))
                for slot, req in self._plan_admissions()
            ]
            for slot, req, nxt in pend:
                self._finalize_admission(slot, req, nxt)
            return
        from jax.experimental import multihost_utils

        B, M = self.B, self.M
        rec = {
            "n": np.zeros((), np.int32),
            "has_queue": np.zeros((), np.int32),
            "slot": np.zeros(B, np.int32),
            "uid": np.zeros(B, np.int32),
            "lp": np.zeros(B, np.int32),
            "max_new": np.zeros(B, np.int32),
            "eos": np.full(B, -1, np.int32),
            "temp": np.zeros(B, np.float32),
            "topk": np.zeros(B, np.int32),
            "topp": np.ones(B, np.float32),
            "prompt": np.zeros((B, M), np.int32),
        }
        plans = []
        if self._proc0:
            plans = self._plan_admissions()
            rec["n"] = np.int32(len(plans))
            rec["has_queue"] = np.int32(bool(self.queue))
            for i, (slot, req) in enumerate(plans):
                rec["slot"][i] = slot
                rec["uid"][i] = req.uid
                rec["lp"][i] = len(req.prompt)
                rec["max_new"][i] = req.max_new
                rec["eos"][i] = -1 if req.eos_id is None else req.eos_id
                sc = req.sampling
                if sc is not None:
                    rec["temp"][i] = sc.temperature
                    rec["topk"][i] = sc.top_k
                    rec["topp"][i] = sc.top_p
                rec["prompt"][i, : len(req.prompt)] = req.prompt
        rec = jax.tree_util.tree_map(
            np.asarray, multihost_utils.broadcast_one_to_all(rec)
        )
        self._mh_has_queue = bool(rec["has_queue"])
        if self._proc0:
            for slot, req in plans:
                self._exec_admission(slot, req)
            return
        for i in range(int(rec["n"])):
            lp = int(rec["lp"][i])
            temp = float(rec["temp"][i])
            req = Request(
                uid=int(rec["uid"][i]),
                prompt=rec["prompt"][i, :lp].astype(np.int32),
                max_new=int(rec["max_new"][i]),
                eos_id=None if rec["eos"][i] < 0 else int(rec["eos"][i]),
                sampling=(
                    SamplingConfig(
                        temperature=temp,
                        top_k=int(rec["topk"][i]),
                        top_p=float(rec["topp"][i]),
                    )
                    if temp > 0
                    else None
                ),
            )
            self._exec_admission(int(rec["slot"][i]), req)

    def _maybe_finish(self, slot: int) -> None:
        req = self.slots[slot]
        if req is None:
            return
        if len(req.out) >= req.max_new or (
            req.eos_id is not None and req.out and req.out[-1] == req.eos_id
        ):
            req.done = True
            self.slots[slot] = None
            self.finished.append(req)
            self.stats["completed"] += 1

    def step(self) -> bool:
        """Admit + advance all active slots (one token, or up to spec_k+1
        with speculation). False when idle."""
        self._admit()
        active = np.array([r is not None for r in self.slots])
        if not active.any():
            if self._mh and not self._proc0:
                return self._mh_has_queue
            return bool(self.queue)
        if self.draft is not None:
            return self._step_spec(active)
        samp = None
        if any(
            self.slots[s] is not None and self.slots[s].sampling is not None
            for s in range(self.B)
        ):
            samp = (
                self._base_key,
                jnp.asarray(self.uids),
                jnp.asarray(self.temps),
                jnp.asarray(self.topks),
                jnp.asarray(self.topps),
            )
        q = self._quantum_q()
        if q > 1:
            td0 = self._time.time()
            seq, self.cache = _decode_quantum(
                self.cfg, self.params, jnp.asarray(self.tokens),
                self.cache, jnp.asarray(self.positions),
                jnp.asarray(active), samp, q, self.impl, self._decode_fn,
            )
            seq = np.asarray(seq)  # (B, q)
            self.stats["t_decode_s"] = round(
                self.stats["t_decode_s"] + (self._time.time() - td0), 3
            )
            self.stats["steps"] += q
            for slot in range(self.B):
                req = self.slots[slot]
                if req is None:
                    continue
                # cache/positions advanced q for every live row; a row
                # retiring mid-quantum (EOS) has its tail truncated here
                # and its slot state reset by the next admission.
                self.positions[slot] += q
                self.tokens[slot] = seq[slot, q - 1]
                for j in range(q):
                    req.out.append(int(seq[slot, j]))
                    self.stats["tokens"] += 1
                    if len(req.out) >= req.max_new or (
                        req.eos_id is not None
                        and req.out[-1] == req.eos_id
                    ):
                        break
                self._maybe_finish(slot)
            elapsed = max(self._time.time() - self._t0, 1e-9)
            self.stats["tokens_per_s"] = round(
                self.stats["tokens"] / elapsed, 2
            )
            return True
        dc_args = (
            self.cfg, self.params, jnp.asarray(self.tokens), self.cache,
            jnp.asarray(self.positions), jnp.asarray(active), self.impl,
        )
        td0 = self._time.time()
        nxt, self.cache = (
            self._decode_fn(*dc_args)
            if samp is None
            else self._decode_fn(*dc_args, samp)
        )
        nxt = np.asarray(nxt)
        self.stats["t_decode_s"] = round(
            self.stats["t_decode_s"] + (self._time.time() - td0), 3
        )
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

    def _quantum_q(self) -> int:
        """Effective multi-step quantum for THIS step: bounded by the
        smallest remaining budget among active rows (no wasted steps past
        max_new), power-of-2 bucketed so at most log2(decode_quantum)
        program variants compile. Deterministic from broadcast state, so
        multihost processes stay in lockstep."""
        if self.decode_quantum <= 1:
            return 1
        rem = [
            r.max_new - len(r.out)
            for r in self.slots
            if r is not None
        ]
        if not rem:
            return 1
        q = max(1, min(self.decode_quantum, min(rem)))
        return 1 << (q.bit_length() - 1)

    def _step_spec(self, active: np.ndarray) -> bool:
        """One speculative step: every active row advances 1..spec_k+1
        tokens (accepted draft prefix + the verify bonus token)."""
        cfg_d, params_d = self.draft
        samp = None
        if any(
            self.slots[s] is not None and self.slots[s].sampling is not None
            for s in range(self.B)
        ):
            samp = (
                self._base_key,
                jnp.asarray(self.uids),
                jnp.asarray(self.temps),
                jnp.asarray(self.topks),
                jnp.asarray(self.topps),
            )
        votes, n_acc, self.cache, self.d_cache = _spec_decode_step(
            self.cfg, self.params, cfg_d, params_d,
            jnp.asarray(self.tokens), self.cache, self.d_cache,
            jnp.asarray(self.positions), jnp.asarray(active),
            self.spec_k, self.impl, samp,
        )
        votes = np.asarray(votes)
        n_acc = np.asarray(n_acc)
        self.stats["steps"] += 1
        self.stats_spec["rounds"] += int(active.sum())
        self.stats_spec["drafted"] += int(active.sum()) * self.spec_k
        for slot in range(self.B):
            req = self.slots[slot]
            if req is None:
                continue
            take = int(n_acc[slot]) + 1
            self.stats_spec["accepted"] += int(n_acc[slot])
            # cache state advanced take tokens regardless of host-side
            # truncation (a truncated request retires, freeing the slot)
            self.positions[slot] += take
            self.tokens[slot] = int(votes[slot, take - 1])
            for j in range(take):
                req.out.append(int(votes[slot, j]))
                self.stats["tokens"] += 1
                if len(req.out) >= req.max_new or (
                    req.eos_id is not None and req.out[-1] == req.eos_id
                ):
                    break
            self._maybe_finish(slot)
        elapsed = max(self._time.time() - self._t0, 1e-9)
        self.stats["tokens_per_s"] = round(self.stats["tokens"] / elapsed, 2)
        return True

    def run(self, max_steps: int = 100000) -> None:
        """Drain the queue completely (all processes call this together
        in multihost mode; step() keeps them in lockstep)."""
        steps = 0
        while steps < max_steps and self.step():
            steps += 1


# ----------------------------------------------------------------------
# Preemption-safe serving: snapshot/restore of the full scheduler state
# (SURVEY.md §5 failure-handling row — TPU preemption is the real failure
# mode; the quantization side already journals per layer).
def save_engine_state(eng: "ServeEngine", path: str) -> None:
    """Serialize the engine's complete state — KV cache pytree, per-slot
    host arrays, queue + in-flight requests — so a preempted server can
    resume mid-request on a fresh process (token-identical continuation,
    see tests/test_engine_sampling.py)."""
    import os
    import pickle

    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(eng.cache)
    arrays = {}
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        if "bfloat16" in str(a.dtype):
            a = a.view(np.uint16)  # npz cannot store bf16
        arrays[f"leaf{i}"] = a
    np.savez(os.path.join(path, "cache.npz"), **arrays)

    def req_state(r):
        return {
            "uid": r.uid, "prompt": np.asarray(r.prompt),
            "max_new": r.max_new, "eos_id": r.eos_id, "out": list(r.out),
            "done": r.done,
            "sampling": None if r.sampling is None else dataclasses.asdict(
                r.sampling
            ),
        }

    host = {
        "slots": [None if r is None else req_state(r) for r in eng.slots],
        "queue": [req_state(r) for r in eng.queue],
        "positions": eng.positions.copy(),
        "tokens": eng.tokens.copy(),
        "uids": eng.uids.copy(),
        "temps": eng.temps.copy(),
        "topks": eng.topks.copy(),
        "topps": eng.topps.copy(),
        "uid_counter": eng._uid,
        "stats": dict(eng.stats),
        # engine-subclass extras (e.g. the paged engine's page free list)
        "extra": getattr(eng, "_snapshot_extra", lambda: None)(),
    }
    with open(os.path.join(path, "host.pkl"), "wb") as f:
        pickle.dump(host, f)


def load_engine_state(eng: "ServeEngine", path: str) -> List[Request]:
    """Restore a snapshot into a freshly-constructed engine (same cfg /
    params / pool geometry). Returns the restored in-flight + queued
    Requests (callers re-acquire their handles)."""
    import os
    import pickle

    cur_leaves, treedef = jax.tree_util.tree_flatten(eng.cache)
    with np.load(os.path.join(path, "cache.npz")) as z:
        leaves = []
        for i, cur in enumerate(cur_leaves):
            a = z[f"leaf{i}"]
            if a.dtype == np.uint16 and cur.dtype == jnp.bfloat16:
                a = a.view(jnp.bfloat16)
            leaves.append(jnp.asarray(a, cur.dtype))
    eng.cache = jax.tree_util.tree_unflatten(treedef, leaves)

    with open(os.path.join(path, "host.pkl"), "rb") as f:
        host = pickle.load(f)

    def mk_req(s):
        sc = s["sampling"]
        return Request(
            uid=s["uid"], prompt=np.asarray(s["prompt"], np.int32),
            max_new=s["max_new"], eos_id=s["eos_id"],
            sampling=None if sc is None else SamplingConfig(**sc),
            out=list(s["out"]), done=s["done"],
        )

    eng.slots = [None if s is None else mk_req(s) for s in host["slots"]]
    eng.queue = [mk_req(s) for s in host["queue"]]
    eng.positions[:] = host["positions"]
    eng.tokens[:] = host["tokens"]
    eng.uids[:] = host["uids"]
    eng.temps[:] = host["temps"]
    eng.topks[:] = host["topks"]
    eng.topps[:] = host["topps"]
    eng._uid = host["uid_counter"]
    eng.stats.update(host["stats"])
    if host.get("extra") is not None:
        eng._restore_extra(host["extra"])
    return [r for r in eng.slots if r is not None] + list(eng.queue)
