"""On-chip (tile_n, blocks_per_step) sweep for the fused ternary kernels.

Times each config with the scan-slope method (chain the kernel N times in
one jitted program; slope between two chain lengths cancels dispatch and
data movement of the endpoints — the only reliable timing through the axon
tunnel, see RESULTS.md methodology).

Run on the TPU:  python scripts/kernel_sweep.py [--shapes qkv,o,gateup,down]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas
from pt2tpu.ops.kernels.pallas_gather import onehot_matmul_pallas

# llama-2-7b projection shapes: name -> (K lanes, n out)
SHAPES = {
    "qkv": (4096, 12288),
    "o": (4096, 4096),
    "gateup": (4096, 22016),
    "down": (12288, 4096),  # 11008 padded to 96 blocks
    "gather": (4096, 4096),
}

CONFIGS = {
    "qkv": [(4096, 16), (4096, 32), (2048, 16), (6144, 16), (12288, 8)],
    "o": [(4096, 16), (4096, 32), (2048, 32), (4096, 8)],
    "gateup": [(4096, 16), (5504, 16), (5504, 32), (2752, 32), (11008, 8)],
    "down": [(4096, 16), (4096, 32), (4096, 48), (4096, 96), (2048, 32)],
    "gather": [(2048, 16), (4096, 16), (4096, 32), (1024, 32)],
}


def fetch(x):
    np.asarray(x)


def time_chain(make_call, x0, n1=64, n2=320, reps=7):
    """Seconds per call via slope between two chain lengths.

    Dispatch latency through the axon tunnel varies by milliseconds between
    runs, so: long chains (the delta covers >= ~2.5 ms of kernel time),
    interleaved min-of-reps per endpoint, slope of the minima.
    """

    def chained(n):
        @jax.jit
        def f(x):
            def body(c, _):
                o = make_call(c)
                # feed a same-shape slice back so the chain is sequential
                c2 = jax.lax.dynamic_slice(
                    o, (0, 0), (c.shape[0], min(c.shape[1], o.shape[1]))
                ).astype(c.dtype)
                if c2.shape[1] < c.shape[1]:
                    c2 = jnp.pad(c2, ((0, 0), (0, c.shape[1] - c2.shape[1])))
                return c2, ()

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return f

    f1, f2 = chained(n1), chained(n2)
    fetch(f1(x0))  # compile
    fetch(f2(x0))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.time()
        fetch(f1(x0))
        t1s.append(time.time() - t0)
        t0 = time.time()
        fetch(f2(x0))
        t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="qkv,o,gateup,down,gather")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    for name in args.shapes.split(","):
        K, n = SHAPES[name]
        nb = K // 128
        packed = jnp.asarray(
            rng.integers(-128, 128, (K // 4, n)), jnp.int8
        )
        alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.bfloat16)
        mu = jnp.asarray(
            rng.normal(0, 0.001, (nb, n)), jnp.bfloat16
        )
        x0 = jnp.asarray(rng.standard_normal((args.batch, K)), jnp.bfloat16)
        for tn, bps in CONFIGS[name]:
            if name == "gather":
                call = lambda c: onehot_matmul_pallas(
                    c, packed, tile_n=tn, blocks_per_step=bps
                )
            else:
                call = lambda c: ternary_matmul_pallas(
                    c, packed, alpha, mu, tile_n=tn, blocks_per_step=bps
                )
            try:
                t = time_chain(call, x0)
            except Exception as e:
                print(f"{name} tn={tn} bps={bps}: FAIL {type(e).__name__}: {e}",
                      flush=True)
                continue
            gbs = (K // 4) * n / t / 1e9
            print(
                f"{name} ({K}x{n}) tn={tn} bps={bps}: {t*1e6:8.1f} us  "
                f"packed {gbs:6.1f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
