"""Batched-verify speculative-decode economics (VERDICT r4 item 7).

Round 4 measured batch-1 speculative decode as a LOSS at the real
acceptance (0.554 with a same-corpus 2L draft): the (1, k+1) verify
forward costs ~2.9 plain decode steps. The open question was whether the
verify amortizes at batch B — the (B, k+1) target forward streams the
weights once for all rows, so the per-ROW round cost should fall toward
(k+1 draft steps)/B-independent + verify/B.

This probe measures the COMPUTE ratio directly, free of dispatch noise:
one jitted lax.scan of N speculative rounds (engine's _spec_decode_step:
k+1 draft steps + one (B, k+1) verify) vs one jitted scan of N plain
decode steps (_decode_step), slope-timed (N_long - N_short) in the SAME
process, interleaved. Token semantics are irrelevant to cost (same
programs the engine runs); acceptance enters only the PROJECTION:

  speedup(a) = E[tokens/round](a) / (C_round / C_step)
  E[tokens/round] = (1 - a^(k+1)) / (1 - a)   (accepted prefix + bonus)

Prints one JSON line per batch with the measured ratio and projected
speedups at the round-4 measured acceptance (0.554) and at 0.8/1.0.
"""

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except Exception:
        pass

import functools

import jax.numpy as jnp
import numpy as np


def build_chains(cfg, params, cfg_d, params_d, B, M, k, impl):
    from pt2tpu.serve.engine import _decode_step, _spec_decode_step
    from pt2tpu.serve.kvcache import init_cache

    active = jnp.ones((B,), bool)

    @functools.partial(jax.jit, static_argnames=("n",))
    def plain_chain(params, n):
        cache = init_cache(cfg, B, M)
        tok = jnp.ones((B,), jnp.int32)
        pos = jnp.full((B,), 32, jnp.int32)

        def body(carry, _):
            tok, kv, pos = carry
            nxt, kv = _decode_step(cfg, params, tok, kv, pos, active, impl)
            return (nxt, kv, pos + 1), None

        (tok, _, _), _ = jax.lax.scan(
            body, (tok, cache, pos), None, length=n
        )
        return tok

    @functools.partial(jax.jit, static_argnames=("n",))
    def spec_chain(params, params_d, n):
        t_cache = init_cache(cfg, B, M)
        d_cache = init_cache(cfg_d, B, M)
        tok = jnp.ones((B,), jnp.int32)
        pos = jnp.full((B,), 32, jnp.int32)

        def body(carry, _):
            tok, tc, dc, pos = carry
            votes, nacc, tc, dc = _spec_decode_step(
                cfg, params, cfg_d, params_d, tok, tc, dc, pos, active,
                k, impl,
            )
            tok = votes[jnp.arange(B), nacc]
            return (tok, tc, dc, pos + nacc + 1), None

        (tok, _, _, _), _ = jax.lax.scan(
            body, (tok, t_cache, d_cache, pos), None, length=n
        )
        return tok

    return plain_chain, spec_chain


def timed(fn, *args):
    t0 = time.time()
    np.asarray(fn(*args))
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--n-short", type=int, default=8)
    ap.add_argument("--n-long", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-len", type=int, default=640)
    args = ap.parse_args()

    from pt2tpu.models import get_config
    from pt2tpu.utils.randmodel import default_perm_mode, random_ternary_params

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.model, args.layers = "tiny-llama", 2
        args.draft_layers = 1
    cfg = get_config(args.model)
    if args.layers:
        cfg = cfg.with_(n_layers=args.layers)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.max_len))
    cfg_d = cfg.with_(n_layers=args.draft_layers)
    impl = "a8" if on_tpu else "auto"
    params = random_ternary_params(cfg, jax.random.PRNGKey(0), perm_mode=default_perm_mode(cfg))
    params_d = random_ternary_params(
        cfg_d, jax.random.PRNGKey(1), perm_mode=default_perm_mode(cfg_d)
    )
    if on_tpu:
        from pt2tpu.ops import ternary_matmul as _tm

        _tm.verify_fused_gather()
        _tm.verify_fused_mlp()
        _tm.verify_igather_fused()

    k = args.k

    def e_tokens(a):
        if a >= 1.0:
            return k + 1.0
        return (1.0 - a ** (k + 1)) / (1.0 - a)

    for B in map(int, args.batches.split(",")):
        plain, spec = build_chains(
            cfg, params, cfg_d, params_d, B, args.max_len, k, impl
        )
        # compile all four entries
        for fn, fa in ((plain, (params,)), (spec, (params, params_d))):
            for n in (args.n_short, args.n_long):
                timed(fn, *fa, n)
        best = {key: float("inf") for key in ("ps", "pl", "ss", "sl")}
        for _ in range(args.rounds):  # interleaved (drift-immune)
            best["ps"] = min(best["ps"], timed(plain, params, args.n_short))
            best["ss"] = min(
                best["ss"], timed(spec, params, params_d, args.n_short)
            )
            best["pl"] = min(best["pl"], timed(plain, params, args.n_long))
            best["sl"] = min(
                best["sl"], timed(spec, params, params_d, args.n_long)
            )
        dn = args.n_long - args.n_short
        c_step = (best["pl"] - best["ps"]) / dn
        c_round = (best["sl"] - best["ss"]) / dn
        ratio = c_round / c_step
        rec = {
            "batch": B,
            "k": k,
            "draft_layers": args.draft_layers,
            "c_step_ms": round(c_step * 1e3, 3),
            "c_round_ms": round(c_round * 1e3, 3),
            "round_over_step": round(ratio, 3),
            "speedup_at_0.554": round(e_tokens(0.554) / ratio, 3),
            "speedup_at_0.8": round(e_tokens(0.8) / ratio, 3),
            "speedup_at_1.0": round(e_tokens(1.0) / ratio, 3),
            "breakeven_accept": None,
        }
        # acceptance where E[tokens/round] == ratio (bisect; E monotone)
        lo, hi = 0.0, 1.0
        if e_tokens(1.0) > ratio:
            for _ in range(40):
                mid = (lo + hi) / 2
                if e_tokens(mid) < ratio:
                    lo = mid
                else:
                    hi = mid
            rec["breakeven_accept"] = round(hi, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
