"""Kernel-variant experiments: where does the fused ternary matmul spend time?

Variants of the inner step at fixed tiling (qkv shape, tn=4096, bps=16),
timed with the chain-slope method. V1 is *mathematically wrong* on purpose
(skips the unpack) — it exists only to bound the unpack's VPU cost.

Run on TPU: python scripts/kernel_variants.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

BS = 128
BS4 = 32


def make_kernel(variant: str, bps: int):
    def _kernel(x_ref, packed_ref, alpha_ref, mu_ref, o_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        cdt = jnp.bfloat16
        xs = x_ref[:].astype(cdt)
        acc = jnp.zeros_like(o_ref)

        if variant != "no_offset":
            row_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * BS, bps), 0) // BS
            col_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * BS, bps), 1)
            ones_blocks = (row_blk == col_blk).astype(cdt)
            smat = jnp.dot(xs, ones_blocks, preferred_element_type=jnp.float32)
            offset = (mu_ref[:] - alpha_ref[:]).astype(cdt)
            acc += jnp.dot(smat.astype(cdt), offset, preferred_element_type=jnp.float32)

        for p in range(bps):
            pk = packed_ref[p * BS4 : (p + 1) * BS4, :]
            xb = xs[:, p * BS : (p + 1) * BS]
            if variant == "baseline" or variant == "no_offset":
                pk32 = pk.astype(jnp.int32)
                planes = [((pk32 >> (2 * q)) & 3) for q in range(4)]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "no_unpack":  # WRONG MATH: unpack cost probe
                u = pk.astype(cdt)  # (BS4, tn)
                d = jnp.dot(
                    xb[:, :BS4], u, preferred_element_type=jnp.float32
                ) * 4.0
            elif variant == "quarter_dots":
                pk32 = pk.astype(jnp.int32)
                d = jnp.zeros_like(o_ref)
                for q in range(4):
                    uq = ((pk32 >> (2 * q)) & 3).astype(cdt)
                    xq = xb[:, q * BS4 : (q + 1) * BS4]
                    d += jnp.dot(xq, uq, preferred_element_type=jnp.float32)
            elif variant == "uint_widen":
                pku = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int32)
                planes = [
                    (pku & 3),
                    ((pku >> 2) & 3),
                    ((pku >> 4) & 3),
                    (pku >> 6),  # zero-extended: top field needs no mask
                ]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "int8_dot":
                # W2A8 probe: codes stay int8, x pre-quantized int8, MXU
                # int8xint8->int32 (xq is a speed probe; real mode would
                # carry per-row scales).
                pk32 = pk.astype(jnp.int32)
                planes = [
                    ((pk32 >> (2 * q)) & 3).astype(jnp.int8) for q in range(4)
                ]
                u = jnp.concatenate(planes, axis=0)  # (BS, tn) int8
                xq = (xb * 16.0).astype(jnp.int8)
                d = jnp.dot(
                    xq, u, preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (1.0 / 16.0)
            elif variant == "tree4":
                # two-level field extraction: 2 ops to 4-bit halves, then
                # 4 ops on half-volume tiles (6 quarter-passes vs 8).
                pk32 = pk.astype(jnp.int32)
                lo4 = pk32 & 0x0F
                hi4 = (pk32 >> 4) & 0x0F
                planes = [lo4 & 3, lo4 >> 2, hi4 & 3, hi4 >> 2]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "bf16_arith":
                # Field extraction in bf16 arithmetic: one int8->bf16 cast of
                # the packed byte, then divides/floors (no integer shifts).
                b = pltpu.bitcast(pk, jnp.uint8).astype(cdt)  # 0..255 exact in bf16
                c3 = jnp.floor(b * (1.0 / 64.0))
                r3 = b - c3 * 64.0
                c2 = jnp.floor(r3 * (1.0 / 16.0))
                r2 = r3 - c2 * 16.0
                c1 = jnp.floor(r2 * 0.25)
                c0 = r2 - c1 * 4.0
                u = jnp.concatenate([c0, c1, c2, c3], axis=0)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            else:
                raise ValueError(variant)
            acc += d * alpha_ref[p : p + 1, :].astype(jnp.float32)
        o_ref[:] += acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("variant", "tn", "bps"))
def run_variant(x, packed, alpha, mu, *, variant, tn=4096, bps=16):
    K4, n = packed.shape
    K = K4 * 4
    nb = K // BS
    B = x.shape[0]
    grid = (1, n // tn, nb // bps)
    return pl.pallas_call(
        make_kernel(variant, bps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, bps * BS), lambda b, i, j: (b, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bps * BS4, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda b, i, j: (b, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
    )(x, packed, alpha, mu)


def fetch(x):
    np.asarray(x)


def time_chain(call, x0, n1=64, n2=320, reps=7):
    def chained(n):
        @jax.jit
        def f(x):
            def body(c, _):
                o = call(c)
                c2 = jax.lax.dynamic_slice(o, (0, 0), c.shape).astype(c.dtype)
                return c2, ()

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return f

    f1, f2 = chained(n1), chained(n2)
    fetch(f1(x0))
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
    rng = np.random.default_rng(0)
    K, n = 4096, 12288
    packed = jnp.asarray(rng.integers(-128, 128, (K // 4, n)), jnp.int8)
    nb = K // BS
    alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.bfloat16)
    mu = jnp.asarray(rng.normal(0, 0.001, (nb, n)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
    print("backend:", jax.default_backend(), flush=True)

    # correctness cross-check for the exact variants
    ref = run_variant(x0, packed, alpha, mu, variant="baseline")
    for v in ["quarter_dots", "uint_widen", "tree4"]:
        try:
            got = run_variant(x0, packed, alpha, mu, variant=v)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"{v}: max abs err vs baseline = {err:.3e}", flush=True)
        except Exception as e:
            print(f"{v}: FAIL {type(e).__name__}: {e}", flush=True)

    for v in ["baseline", "tree4", "int8_dot", "no_unpack"]:
        try:
            t = time_chain(
                lambda c: run_variant(c, packed, alpha, mu, variant=v), x0
            )
            gbs = (K // 4) * n / t / 1e9
            print(f"{v:14s}: {t*1e6:7.1f} us  packed {gbs:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{v}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
