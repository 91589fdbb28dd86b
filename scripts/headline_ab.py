"""Interleaved A/B of the MODEL-LEVEL decode variants: bf16 vs ternary
lm_head, exact vs W2A8 kernels — one process, drift-immune (same
methodology as scripts/fusion_ab.py; separate bench processes drift
±15%, RESULTS.md).

Settles two round-3 loose ends in one run:
  * the ternary-lm_head "regression" (round-1: 145.2 < 149.1 across
    processes; round-3 head probe says the kernel is 4.5x faster than
    the dense head single-op — which story is real end-to-end?)
  * the a8 end-to-end gain, now that the real-language quality gate
    passed (19.32 -> 19.38 ppl, RESULTS round 4).

Run on the TPU:  python scripts/headline_ab.py [--rounds 3] [--new 64]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.models import get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("llama-2-7b")
    cfg = cfg.with_(max_seq_len=args.prompt + args.new + 16)
    p_bf16 = random_ternary_params(
        cfg, jax.random.PRNGKey(0), perm_mode="ssr"
    )
    p_tern = random_ternary_params(
        cfg, jax.random.PRNGKey(0), perm_mode="ssr", ternary_lm_head=True
    )
    prompt = jnp.ones((args.batch, args.prompt), jnp.int32)

    combos = [
        ("base      ", p_bf16, "auto"),
        ("a8        ", p_bf16, "a8"),
        ("thead     ", p_tern, "auto"),
        ("thead+a8  ", p_tern, "a8"),
    ]
    short = max(8, args.new // 4)

    progs = {}
    base_len = args.prompt + args.new
    for ci, (name, params, impl) in enumerate(combos):
        for li, n in enumerate((short, args.new)):
            M = base_len + ci * 2 + li  # unique static arg per program
            f = (lambda p, params=params, impl=impl, n=n, M=M:
                 greedy_generate(cfg, params, p, max_new=n, max_len=M,
                                 impl=impl))
            np.asarray(f(prompt))  # compile + warm
            progs[(ci, li)] = f
        print(f"compiled {name}", file=sys.stderr)

    best = {k: float("inf") for k in progs}
    for r in range(args.rounds):
        for ci in range(len(combos)):
            for li in (0, 1):
                f = progs[(ci, li)]
                t0 = time.time()
                np.asarray(f(prompt))
                best[(ci, li)] = min(best[(ci, li)], time.time() - t0)
        print(f"round {r} done", file=sys.stderr)

    for ci, (name, _, _) in enumerate(combos):
        sec = (best[(ci, 1)] - best[(ci, 0)]) / (args.new - short)
        print(f"{name}: {sec*1e3:7.3f} ms/tok  ({args.batch/sec:7.1f} tok/s)")


if __name__ == "__main__":
    main()
