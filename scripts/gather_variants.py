"""One-hot gather variants: packed 2-bit planes (DMA-heavy) vs in-kernel
iota generation (index-only). Chain-slope timing at the 7B decode shape.

Run on TPU: python scripts/gather_variants.py [--B 16] [--D 4096] [--K 4096]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def time_chain(call, x0, n1=64, n2=320, reps=7):
    """Slope of chained applications (the only reliable timing here —
    dispatch latency through the tunnel is wildly variable)."""

    def chained(n):
        @jax.jit
        def f(x):
            def body(c, _):
                return call(c), None

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out

        np.asarray(f(x0))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(x0))
            best = min(best, time.time() - t0)
        return best

    t1, t2 = chained(n1), chained(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--D", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    from pt2tpu.ops.gather import make_packed_gather
    from pt2tpu.ops.kernels.pallas_gather import (
        onehot_iota_pallas,
        onehot_matmul_pallas,
    )

    rng = np.random.default_rng(0)
    perm = rng.permutation(args.D)[: args.K].astype(np.int32)
    g = make_packed_gather(jnp.asarray(perm), args.D)
    x = jnp.asarray(rng.standard_normal((args.B, args.D)), jnp.bfloat16)

    # exactness first (bit-equality: {0,1} one-hot passthrough)
    want = np.asarray(onehot_matmul_pallas(x, g.packed))
    got = np.asarray(onehot_iota_pallas(x, jnp.asarray(perm), D=args.D))
    exact = bool((want == got).all())
    print(f"iota vs packed exact: {exact}")
    if not exact:
        bad = np.abs(want - got)
        print(f"  max abs diff {bad.max():.3e} at {np.unravel_index(bad.argmax(), bad.shape)}")
        sys.exit(1)

    # chained-slope timing: a scan whose carry flows through the gather.
    # The gather output feeds back as the next x (shapes match for D==K).
    def packed_call(c):
        return onehot_matmul_pallas(c, g.packed).astype(jnp.bfloat16)

    pvec = jnp.asarray(perm)

    def iota_call(c):
        return onehot_iota_pallas(c, pvec, D=args.D).astype(jnp.bfloat16)

    for name, call in [("packed", packed_call), ("iota", iota_call)]:
        sec = time_chain(call, x, reps=args.reps)
        print(f"{name:8s} {sec*1e6:8.2f} us/call")


if __name__ == "__main__":
    main()
