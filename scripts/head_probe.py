"""Why is the ternary lm_head SLOWER than the dense bf16 head?

Round-1 bench: batch-1 decode 149.1 tok/s (dense head) vs 145.2 (ternary
head) despite the ternary head reading ~8x fewer HBM bytes (32.8 MB packed
vs 262 MB bf16). This probe times the head matmul in isolation at decode
shapes across kernel configs, interleaved in one process (separate
processes drift ±15%).

Chains ride lax.fori_loop (an unrolled 48-call chain at V=32000 took >15
min to compile through the remote-compile tunnel).

Run on the TPU:  python scripts/head_probe.py [--reps 3]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def make_chain(fn, x0, n):
    """jit(fori_loop) chaining fn n times; output feeds back (scaled tiny)
    so XLA cannot hoist the weight reads out of the loop body."""

    @jax.jit
    def run(x):
        def body(i, h):
            o = fn(h)
            return x + (o[:, : x.shape[1]] * 1e-6).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    np.asarray(run(x0))  # compile + warm
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--long", type=int, default=48)
    ap.add_argument("--short", type=int, default=12)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas
    from pt2tpu.utils.randmodel import random_ternary_linear

    D, V = 4096, 32000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, D)), jnp.bfloat16)

    Wd = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.bfloat16)
    p = random_ternary_linear(jax.random.PRNGKey(0), V, D,
                              perm_mode="identity")

    variants = {"dense bf16": lambda h: (h @ Wd.T).astype(jnp.float32)}
    for tn, bps in ((0, 0), (3200, 8), (1280, 16), (16000, 8), (6400, 16)):
        kw = {} if tn == 0 else {"tile_n": tn, "blocks_per_step": bps}
        label = "auto" if tn == 0 else f"tn={tn} bps={bps}"
        variants[f"ternary {label}"] = functools.partial(
            lambda h, kw: ternary_matmul_pallas(
                h, p.packed, p.alpha, p.mu, block_size=128, **kw
            ),
            kw=kw,
        )

    progs = {}
    for name, fn in variants.items():
        try:
            progs[name] = (make_chain(fn, x, args.short),
                           make_chain(fn, x, args.long))
            print(f"compiled {name}", file=sys.stderr)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", file=sys.stderr)

    best = {}
    for r in range(args.reps):
        for name, (fs, fl) in progs.items():
            for li, f in enumerate((fs, fl)):
                t0 = time.time()
                np.asarray(f(x))
                key = (name, li)
                best[key] = min(best.get(key, 1e9), time.time() - t0)
        print(f"round {r} done", file=sys.stderr)

    for name in progs:
        t = (best[(name, 1)] - best[(name, 0)]) / (args.long - args.short)
        bytes_ = V * D * 2 if name.startswith("dense") else V * D // 4
        print(f"{name:24s}: {t*1e6:8.1f} us  ({bytes_/t/1e9:5.0f} GB/s "
              f"{'bf16' if name.startswith('dense') else 'packed'})")


if __name__ == "__main__":
    main()
