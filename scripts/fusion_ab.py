"""Interleaved A/B of the fused-kernel routing flags at the END-TO-END
decode level.

Separate bench processes drift +-15% on this machine (RESULTS.md
methodology), so single-run flag comparisons are meaningless — the round-3
first pass "measured" 135.9/149.2/165.8/169.1 tok/s for four flag combos
that cannot all be real. This script compiles every combo ONCE in one
process (the routing flags are read at trace time; a per-combo max_len
offset forces distinct jit cache entries), then interleaves slope-timing
rounds across combos so drift hits all of them equally.

Run on the TPU:  python scripts/fusion_ab.py [--rounds 3] [--new 64]
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
    from pt2tpu.ops import ternary_matmul as tm
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("llama-2-7b")
    cfg = cfg.with_(max_seq_len=args.prompt + args.new + 8)
    params = random_ternary_params(cfg, jax.random.PRNGKey(0),
                                   perm_mode="ssr")
    prompt = jnp.ones((args.batch, args.prompt), jnp.int32)

    combos = [
        ("none      ", False, False),
        ("igather   ", True, False),
        ("mlp       ", False, True),
        ("ig+mlp    ", True, True),
    ]
    short = max(8, args.new // 4)

    # compile phase: distinct max_len per (combo, length) -> distinct cache
    # entries, each traced under that combo's flag state
    progs = {}
    base_len = args.prompt + args.new
    for ci, (name, ig, mlp) in enumerate(combos):
        tm.IGATHER_FUSED, tm.FUSED_MLP = ig, mlp
        for li, n in enumerate((short, args.new)):
            M = base_len + ci * 2 + li  # unique static arg per program
            f = (lambda p, n=n, M=M: greedy_generate(
                cfg, params, p, max_new=n, max_len=M))
            np.asarray(f(prompt))  # compile + warm under current flags
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

    for ci, (name, ig, mlp) in enumerate(combos):
        sec = (best[(ci, 1)] - best[(ci, 0)]) / (args.new - short)
        print(f"{name}: {sec*1e3:7.3f} ms/tok  ({args.batch/sec:7.1f} tok/s)")


if __name__ == "__main__":
    main()
