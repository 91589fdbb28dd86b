"""Continuous-batching engine benchmark (VERDICT r4 item 5 / missing #3).

The ServeEngine (serve/engine.py) is correctness-tested but had no measured
throughput. This driver measures the number a serving framework is judged
on: steady-state tok/s and per-token latency under mixed prefill/decode
load, on the real chip.

Workload model:
  * ``n`` requests, prompt lengths cycled from {64, 128, 256, 384}
    (bucketed by the engine to powers of two), ``max_new`` tokens each;
  * ``--load`` = offered arrival rate as a fraction of the engine's own
    saturated throughput (0 = closed loop: submit everything up front);
    arrivals are exponential (Poisson process) from a seeded host RNG;
  * warmup phase submits one request per prompt bucket first and drains
    it, so bucket-prefill/decode compiles are excluded from the steady
    state (first compile through the axon tunnel is ~30 s).

Metrics: steady tok/s over the measured phase, p50/p99 inter-token
latency per row, mean/p99 time-to-first-token. NOTE: per-step dispatch
latency through the device tunnel is wildly variable (70 us - 25 ms);
p99 inter-token latency on this environment carries that noise floor —
recorded as-is, flagged in RESULTS.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS even when sitecustomize imported jax before this
# process's env var could take effect (same pattern as bench.py).
import jax  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except Exception:
        pass

PROMPT_MIX = (64, 128, 256, 384)


def prompt_mix(max_len, max_new):
    """The workload's prompt lengths, clamped so every request fits."""
    mix = tuple(p for p in PROMPT_MIX if p + max_new + 1 <= max_len)
    if not mix:
        mix = (max(8, max_len - max_new - 8),)
    return mix


def make_requests(n, max_new, vocab, max_len, seed=0):
    rng = np.random.default_rng(seed)
    mix = prompt_mix(max_len, max_new)
    return [
        (rng.integers(0, vocab, size=(mix[i % len(mix)],)), max_new)
        for i in range(n)
    ]


def run_workload(eng, reqs, arrival_rate=0.0, seed=1):
    """Drive the engine over ``reqs`` = [(prompt, max_new), ...].

    arrival_rate: requests/s Poisson offered load (0 = closed loop).
    Returns a dict of measurements.
    """
    rng = np.random.default_rng(seed)
    if arrival_rate > 0:
        gaps = rng.exponential(1.0 / arrival_rate, size=len(reqs))
        arrivals = np.cumsum(gaps)
        arrivals[0] = 0.0
    else:
        arrivals = np.zeros(len(reqs))

    t0 = time.time()
    pending = list(zip(arrivals, reqs))
    live = {}  # uid -> (Request, dict(arr, emit_times, prev_len))
    tok_times = []
    submit_i = 0
    while submit_i < len(pending) or any(not r.done for r, _ in live.values()):
        now = time.time() - t0
        while submit_i < len(pending) and pending[submit_i][0] <= now:
            arr_t, (prompt, max_new) = pending[submit_i]
            r = eng.submit(prompt, max_new=max_new)
            live[r.uid] = (r, {"arr": now, "emit": [], "prev": 0})
            submit_i += 1
        if not eng.step():
            # engine idle: jump to the next arrival
            if submit_i < len(pending):
                nxt = pending[submit_i][0]
                dt = nxt - (time.time() - t0)
                if dt > 0:
                    time.sleep(min(dt, 0.05))
                continue
            break
        t = time.time() - t0
        for r, st in live.values():
            new = len(r.out) - st["prev"]
            if new > 0:
                st["emit"].extend([t] * new)  # step granularity
                st["prev"] = len(r.out)
                tok_times.append((t, new))
    makespan = time.time() - t0

    # latency stats
    ttfts, itls = [], []
    for r, st in live.values():
        if st["emit"]:
            ttfts.append(st["emit"][0] - st["arr"])
            d = np.diff(st["emit"])
            itls.extend(d[d > 0])  # same-step multi-token rows collapse
    total_toks = sum(len(r.out) for r, _ in live.values())
    # steady state: drop the first and last 10% of tokens by time
    times = np.array([t for t, _ in tok_times])
    counts = np.array([c for _, c in tok_times])
    cum = np.cumsum(counts)
    lo_i = int(np.searchsorted(cum, 0.1 * total_toks))
    hi_i = int(np.searchsorted(cum, 0.9 * total_toks))
    if hi_i > lo_i and times[hi_i] > times[lo_i]:
        steady = float(
            (cum[hi_i] - cum[lo_i]) / (times[hi_i] - times[lo_i])
        )
    else:
        steady = total_toks / makespan
    itls = np.array(itls) if itls else np.array([0.0])
    return {
        "requests": len(live),
        "tokens": int(total_toks),
        "makespan_s": round(makespan, 2),
        "tok_s_overall": round(total_toks / makespan, 2),
        "tok_s_steady": round(steady, 2),
        "ttft_mean_s": round(float(np.mean(ttfts)), 3) if ttfts else None,
        "ttft_p99_s": round(float(np.percentile(ttfts, 99)), 3)
        if ttfts
        else None,
        "itl_p50_ms": round(float(np.percentile(itls, 50)) * 1e3, 2),
        "itl_p99_ms": round(float(np.percentile(itls, 99)) * 1e3, 2),
        "engine_stats": dict(eng.stats),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--n", type=int, default=32, help="measured requests")
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=640)
    ap.add_argument(
        "--load", type=float, default=0.0,
        help="offered arrival rate, requests/s (0 = closed loop)",
    )
    ap.add_argument("--kv-quant", action="store_true")
    ap.add_argument("--a8", action="store_true", default=None)
    ap.add_argument(
        "--quantum", type=int, default=1,
        help="decode_quantum: decode steps batched per host dispatch "
        "(multi-step scheduling; token-identical, amortizes the per-step "
        "host round-trip — measured 113 ms/step at quantum 1 on this "
        "tunnel vs 6.2 ms of compute)",
    )
    ap.add_argument(
        "--draft-layers", type=int, default=0,
        help="speculative engine: draft depth (same-seed random params — "
        "the batched-verify economics probe of VERDICT r4 item 7; real "
        "acceptance comes from the tiny-LM pair)",
    )
    ap.add_argument("--spec-k", type=int, default=4)
    args = ap.parse_args()

    import jax

    from pt2tpu.models import get_config
    from pt2tpu.serve.engine import ServeEngine
    from pt2tpu.utils.randmodel import default_perm_mode, random_ternary_params

    on_tpu = jax.default_backend() == "tpu"
    if args.a8 is None:
        args.a8 = on_tpu
    if not on_tpu:
        args.model, args.layers = "tiny-llama", 2
    cfg = get_config(args.model)
    if args.layers:
        cfg = cfg.with_(n_layers=args.layers)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.max_len))
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), perm_mode=default_perm_mode(cfg)
    )
    impl = "a8" if args.a8 else "auto"
    if on_tpu:
        from pt2tpu.ops import ternary_matmul as _tm

        _tm.verify_fused_gather()
        _tm.verify_fused_mlp()
        _tm.verify_igather_fused()

    draft = None
    if args.draft_layers:
        cfg_d = cfg.with_(n_layers=args.draft_layers)
        params_d = random_ternary_params(
            cfg_d, jax.random.PRNGKey(0), perm_mode=default_perm_mode(cfg_d)
        )
        draft = (cfg_d, params_d)
    eng = ServeEngine(
        cfg, params, max_batch=args.max_batch, max_len=args.max_len,
        kv_quant=args.kv_quant, impl=impl, draft=draft, spec_k=args.spec_k,
        decode_quantum=args.quantum,
    )
    # warmup: one request per bucket, drained — compiles excluded. With a
    # quantum, max_new = 2*quantum-1 walks the effective q through every
    # power-of-2 bucket (min-remaining shrinks 2q-1 -> q -> ... -> 1), so
    # all _decode_quantum variants compile here, not mid-measurement.
    t0 = time.time()
    warm_new = max(4, 2 * args.quantum - 1)
    warm = [
        eng.submit(np.zeros(lp, np.int64), max_new=warm_new)
        for lp in prompt_mix(args.max_len, args.new)
    ]
    eng.run()
    print(f"warmup (compiles): {time.time()-t0:.1f}s", file=sys.stderr)
    eng.stats.update(
        steps=0, tokens=0, admitted=0, completed=0,
        t_admit_s=0.0, t_decode_s=0.0,
    )
    if draft is not None:
        eng.stats_spec.update(rounds=0, drafted=0, accepted=0)
    eng._t0 = time.time()

    reqs = make_requests(args.n, args.new, cfg.vocab_size, args.max_len)
    out = run_workload(eng, reqs, arrival_rate=args.load)
    out["config"] = {
        "model": args.model, "layers": cfg.n_layers, "impl": impl,
        "max_batch": args.max_batch, "max_len": args.max_len,
        "kv_quant": args.kv_quant, "load_rps": args.load, "new": args.new,
        "prompt_mix": prompt_mix(args.max_len, args.new),
        "draft_layers": args.draft_layers, "spec_k": args.spec_k,
        "quantum": args.quantum,
    }
    if draft is not None:
        out["spec_stats"] = dict(eng.stats_spec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
