"""End-to-end projection-floor A/B (VERDICT r4 item 1, the honest form).

Chained kernel microbenches overstate attainable rates: round-5 chain
runs credited no_unpack_a8 with 1.7 TB/s of packed HBM traffic — above
the chip's physical bandwidth — because a chained single-kernel scan
enjoys cross-iteration pipelining the real decode (6 distinct kernels +
attention + norms per layer, inside a token scan) never gets. So the
floor is measured END-TO-END instead: the SAME decode program with the
WRONG-MATH ``impl="floor8"`` kernels patched in — identical call
structure, identical DMA volume (raw packed planes replicated to depth on
the s8 MXU), zero unpack VPU work. a8 tok/s / floor8 tok/s = the fraction
of the structurally attainable rate the production unpack path reaches;
everything above floor8 is NOT reachable by any unpack formulation.

Interleaved one-process slope timing (round-3/4 methodology: cross-
process runs drift +-15%).
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
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.models import get_config
    from pt2tpu.ops import ternary_matmul as _tm
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    _tm.verify_fused_gather()
    _tm.verify_fused_mlp()
    _tm.verify_igather_fused()

    cfg = get_config("llama-2-7b")
    cfg = cfg.with_(max_seq_len=args.prompt + args.new + 16)
    params = random_ternary_params(cfg, jax.random.PRNGKey(0),
                                   perm_mode="ssr")
    prompt = jnp.ones((args.batch, args.prompt), jnp.int32)

    combos = [
        ("exact-bf16", "auto"),
        ("a8        ", "a8"),
        ("floor8    ", "floor8"),
    ]
    short = max(8, args.new // 4)
    M = -(-(args.prompt + args.new + 8) // 128) * 128

    progs, lens = {}, {}
    for ci, (name, impl) in enumerate(combos):
        for li, n0 in enumerate((short, args.new)):
            n = n0 + ci  # unique static per program
            f = (lambda p, n=n, impl=impl: greedy_generate(
                cfg, params, p, max_new=n, max_len=M, impl=impl))
            np.asarray(f(prompt))  # compile + warm
            progs[(ci, li)] = f
            lens[(ci, li)] = n
        print(f"compiled {name}", file=sys.stderr)

    best = {k: float("inf") for k in progs}
    for r in range(args.rounds):
        for k, f in progs.items():
            t0 = time.time()
            np.asarray(f(prompt))
            best[k] = min(best[k], time.time() - t0)
        print(f"round {r} done", file=sys.stderr)

    res = {}
    for ci, (name, impl) in enumerate(combos):
        d_t = best[(ci, 1)] - best[(ci, 0)]
        d_n = lens[(ci, 1)] - lens[(ci, 0)]
        per = d_t / d_n
        res[name.strip()] = per
        print(f"{name}: {per*1e3:8.3f} ms/step  "
              f"{args.batch/per:7.1f} tok/s")
    if "a8" in res and "floor8" in res:
        print(f"a8 reaches {100*res['floor8']/res['a8']:.1f}% of the "
              f"floor8 structural ceiling "
              f"(unpack tax {1e3*(res['a8']-res['floor8']):.3f} ms/step)")


if __name__ == "__main__":
    main()
