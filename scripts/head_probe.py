"""Why is the ternary lm_head SLOWER than the dense bf16 head?

Round-1 bench: batch-1 decode 149.1 tok/s (dense head) vs 145.2 (ternary
head) despite the ternary head reading ~8x fewer HBM bytes (32.8 MB packed
vs 262 MB bf16). This probe times the head matmul in isolation at decode
shapes (chained two-length slope, the only reliable timing here — see
RESULTS.md methodology) across kernel configs.

Run on the TPU:  python scripts/head_probe.py [--reps 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def chain_time(fn, x0, n_long=48, n_short=12, reps=3):
    """Per-call seconds via two-chain-length slope (cancels dispatch)."""

    def chain(n):
        @jax.jit
        def run(x):
            h = x
            for i in range(n):
                o = fn(h)
                # fold the (B, n) output back to (B, D) cheaply to chain
                h = x + o[:, : x.shape[1]].astype(x.dtype) * 1e-6
            return h

        np.asarray(run(x0))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(run(x0))
            best = min(best, time.time() - t0)
        return best

    t_l, t_s = chain(n_long), chain(n_short)
    return (t_l - t_s) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas
    from pt2tpu.utils.randmodel import random_ternary_linear

    D, V = 4096, 32000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, D)), jnp.bfloat16)

    # dense bf16 head
    Wd = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.bfloat16)
    t = chain_time(lambda h: h @ Wd.T, x, reps=args.reps)
    print(f"dense bf16 head: {t*1e6:8.1f} us  "
          f"({V*D*2/t/1e9:.0f} GB/s)", file=sys.stderr)

    p = random_ternary_linear(jax.random.PRNGKey(0), V, D,
                              perm_mode="identity")
    for tn in (None, 3200, 1280, 32000, 16000):
        for bps in (None, 8, 16, 32):
            if (tn is None) != (bps is None):
                continue
            kw = {} if tn is None else {"tile_n": tn, "blocks_per_step": bps}
            try:
                f = lambda h: ternary_matmul_pallas(  # noqa: E731
                    h, p.packed, p.alpha, p.mu, block_size=128, **kw
                ).astype(jnp.bfloat16)
                t = chain_time(f, x, reps=args.reps)
                label = "auto" if tn is None else f"tn={tn} bps={bps}"
                print(f"ternary head {label:18s}: {t*1e6:8.1f} us  "
                      f"({V*D/4/t/1e9:.0f} GB/s packed)", file=sys.stderr)
            except Exception as e:
                print(f"ternary head tn={tn} bps={bps}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
