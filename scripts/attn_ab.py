"""Interleaved end-to-end A/B of the decode-attention kernel at the
serving operating point (batch 8, prompt 512): XLA vs Pallas attention x
bf16 vs int8 KV, inside the real decode program (the cache mutates every
step, so nothing hoists — unlike isolated chained probes, whose
loop-invariant KV lets XLA lift the int8 converts out of the loop and
whose slopes go negative under drift; see attn_kernel_probe.py history).
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
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.models import common, get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("llama-2-7b")
    cfg = cfg.with_(max_seq_len=args.prompt + args.new + 16)
    params = random_ternary_params(cfg, jax.random.PRNGKey(0),
                                   perm_mode="ssr")
    prompt = jnp.ones((args.batch, args.prompt), jnp.int32)

    combos = [
        ("xla    bf16", False, False),
        ("pallas bf16", True, False),
        ("xla    int8", False, True),
        ("pallas int8", True, True),
    ]
    short = max(8, args.new // 4)
    # ONE max_len for every combo, chosen kernel-supported (M % 128 == 0):
    # the first version of this script gave each combo a unique M=576..583
    # for jit-cache separation — none divisible by 128, so the kernel
    # NEVER engaged and the deltas measured M-alignment, not the kernel.
    # Uniqueness now comes from per-combo max_new offsets instead.
    M = -(-(args.prompt + args.new + 8) // 128) * 128
    from pt2tpu.ops.kernels import pallas_attention as _pa

    assert _pa.supported(M, cfg.hd, True) and _pa.supported(M, cfg.hd, False)

    progs = {}
    outs = {}
    lens = {}
    for ci, (name, kern, kvq) in enumerate(combos):
        # both ambient flags: int8 routes through INT8_DECODE_ATTN_KERNEL
        # (default ON since round 5) — the "xla int8" combo must disable it
        common.DECODE_ATTN_KERNEL = kern
        common.INT8_DECODE_ATTN_KERNEL = kern
        for li, n0 in enumerate((short, args.new)):
            n = n0 + ci  # unique static arg per program; M is shared
            f = (lambda p, n=n, kvq=kvq: greedy_generate(
                cfg, params, p, max_new=n, max_len=M, impl="a8",
                kv_quant=kvq))
            outs[(ci, li)] = np.asarray(f(prompt))  # compile + warm
            progs[(ci, li)] = f
            lens[(ci, li)] = n
        print(f"compiled {name}", file=sys.stderr)
    # exactness: kernel vs xla within each kv mode (greedy tokens)
    for kv in (0, 1):
        a, b = outs[(0 + 2 * kv, 1)], outs[(1 + 2 * kv, 1)]
        nmin = min(a.shape[1], b.shape[1])
        same = (a[:, :nmin] == b[:, :nmin]).mean()
        print(f"kv_quant={kv}: kernel-vs-xla token agreement {same:.4f}",
              file=sys.stderr)

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
        sec = (best[(ci, 1)] - best[(ci, 0)]) / (lens[(ci, 1)] - lens[(ci, 0)])
        print(f"{name}: {sec*1e3:7.3f} ms/step  ({args.batch/sec:7.1f} tok/s)")


if __name__ == "__main__":
    main()
