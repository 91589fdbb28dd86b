"""Per-op time budget of one full decode step (VERDICT r1 next-step #1).

Methodology: ablation slopes. Each variant monkeypatches ONE component of
the decode program out at trace time (patches are seen because
``jax.clear_caches()`` forces a retrace per variant), then times the same
jitted greedy-decode program at two decode lengths; the slope difference
vs the full program is that component's per-token cost. This is the only
reliable timing on this infrastructure (dispatch latency 70 us - 25 ms
through the tunnel; jax.block_until_ready does not block — see RESULTS.md
methodology).

Caveats:
  * zero-outputs can let XLA constant-fold downstream work; ablations are
    chosen so the surviving graph stays data-dependent (attention ablation
    returns q, norms become identity). The unembed ablation also folds the
    feedback path (argmax + next-token embed), so its delta slightly
    overstates unembed alone (embed is ~17 MB/step of HBM, small).
  * deltas below ~5% of the step are within machine drift; treat as noise.

Run:  python scripts/decode_budget.py [--prompt 32] [--new 64] [--reps 3]
      [--long]   # add a prompt-1024 run (attention/KV-heavy regime)
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def bench_slope(cfg, params, prompt_len, max_new, reps, batch=1, **gen_kw):
    from pt2tpu.serve import greedy_generate

    short = max(8, max_new // 4)
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    M = prompt_len + max_new

    def timed(n):
        f = lambda p: greedy_generate(
            cfg, params, p, max_new=n, max_len=M, **gen_kw
        )
        np.asarray(f(prompt))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(prompt))
            best = min(best, time.time() - t0)
        return best

    t_s, t_l = timed(short), timed(max_new)
    return (t_l - t_s) / (max_new - short)  # seconds per token


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--long", action="store_true")
    ap.add_argument("--variants", default=None, help="comma list to run")
    args = ap.parse_args()

    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.ops import ternary_matmul as tm
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config(args.model)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.prompt + args.new))
    params = random_ternary_params(cfg, jax.random.PRNGKey(0), perm_mode="ssr")

    orig = {
        "attention": dec.attention,
        "_norm": dec._norm,
        "_head_norm": dec._head_norm,
        "unembed": dec.unembed,
        "apply_rope": dec.apply_rope,
        "embed_tokens": dec.embed_tokens,
    }
    orig_tm = {"gather_apply": tm.gather_apply}

    def fake_gather(g, x, impl="auto", layer_idx=None):
        return x  # SSR lanes un-permuted: wrong math, right shapes/bytes-of-x

    def restore():
        for k, v in orig_tm.items():
            setattr(tm, k, v)
        for k, v in orig.items():
            setattr(dec, k, v)

    def fake_attention(q, k, v, *a, **kw):
        return q  # same shape as the context output

    def fake_norm(cfg_, x, w, b=None):
        return x

    def fake_head_norm(cfg_, x, w):
        return x

    def fake_unembed(cfg_, p, h):
        # Broadcast of one hidden lane, NOT zeros: logits must stay
        # data-dependent on h or XLA constant-folds the entire decode loop
        # (zeros measured 0.003 ms/tok — the whole program folded away).
        return jnp.broadcast_to(
            h[..., :1], h.shape[:-1] + (cfg_.vocab_size,)
        ).astype(h.dtype)

    def fake_rope(x, cos, sin):
        return x

    variants = {
        "full": {},
        "no_attn": {"attention": fake_attention},
        "no_norms": {"_norm": fake_norm, "_head_norm": fake_head_norm},
        "no_unembed": {"unembed": fake_unembed},
        "no_rope": {"apply_rope": fake_rope},
        "no_gather": {"__tm__": {"gather_apply": fake_gather}},
        "xla_impl": {"__impl__": "xla"},
        "a8": {"__impl__": "a8"},
        "kv_int8": {"__kv__": True},
        # int8 cache with attention ablated: (kv_int8 - kv8_noattn) is the
        # int8 attention READ cost; (kv8_noattn - no_attn) is the int8
        # write/carry overhead OUTSIDE attention — localizes the measured
        # batch-8 int8 regression (RESULTS round 4).
        "kv8_noattn": {"attention": fake_attention, "__kv__": True},
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    for name, patch in variants.items():
        restore()
        impl = patch.pop("__impl__", "auto") if "__impl__" in patch else "auto"
        kvq = patch.pop("__kv__", False) if "__kv__" in patch else False
        for k, v in patch.pop("__tm__", {}).items():
            setattr(tm, k, v)
        for k, v in patch.items():
            setattr(dec, k, v)
        jax.clear_caches()
        sec = bench_slope(
            cfg, params, args.prompt, args.new, args.reps,
            batch=args.batch, impl=impl, kv_quant=kvq,
        )
        results[name] = sec
        full = results.get("full")
        delta = (full - sec) * 1e6 if (full and name != "full") else 0.0
        print(
            f"{name:12s} {sec*1e3:8.3f} ms/tok  ({1/sec:7.1f} tok/s)"
            + (f"   component ~{delta:7.1f} us/tok" if name != "full" else ""),
            file=sys.stderr,
        )
    restore()
    print(json.dumps({
        "config": {
            "model": args.model, "prompt": args.prompt, "new": args.new,
            "batch": args.batch,
        },
        "ms_per_tok": {k: round(v * 1e3, 4) for k, v in results.items()},
    }))

    if args.long:
        jax.clear_caches()
        sec = bench_slope(cfg, params, 1024, args.new, args.reps,
                          batch=args.batch, impl="auto")
        print(f"full @ prompt=1024: {sec*1e3:.3f} ms/tok ({1/sec:.1f} tok/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
