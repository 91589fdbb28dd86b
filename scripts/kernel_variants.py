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
    rpb = 8 if variant.startswith("i32") else BS4  # packed rows per block

    def _kernel(x_ref, packed_ref, alpha_ref, mu_ref, o_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        cdt = jnp.bfloat16
        xs = x_ref[:].astype(cdt)
        acc = jnp.zeros_like(o_ref)

        if variant not in ("no_offset", "dma_only"):
            row_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * BS, bps), 0) // BS
            col_blk = jax.lax.broadcasted_iota(jnp.int32, (bps * BS, bps), 1)
            ones_blocks = (row_blk == col_blk).astype(cdt)
            smat = jnp.dot(xs, ones_blocks, preferred_element_type=jnp.float32)
            offset = (mu_ref[:] - alpha_ref[:]).astype(cdt)
            acc += jnp.dot(smat.astype(cdt), offset, preferred_element_type=jnp.float32)

        if variant == "dma_only":
            # WRONG MATH — floor row (a): every operand block still streams
            # (the pipeline DMAs per in_spec regardless of use); compute is
            # one broadcast-add per block so nothing is elided.
            for p in range(bps):
                acc += packed_ref[p * rpb : p * rpb + 1, :].astype(jnp.float32)
            acc += alpha_ref[0:1, :].astype(jnp.float32)
            acc += mu_ref[0:1, :].astype(jnp.float32)
            o_ref[:] += acc
            return

        if variant in ("swpipe", "swpipe_nomask"):
            u_prev = None
            for p in range(bps + 1):
                if u_prev is not None:
                    xb_prev = xs[:, (p - 1) * BS : p * BS]
                    if variant == "swpipe_nomask":
                        B_ = xs.shape[0]
                        xb2 = jnp.concatenate(
                            [jnp.zeros((B_, BS4), cdt),
                             xb_prev[:, : BS - BS4]], axis=1)
                        x_op = jnp.concatenate([xb_prev, -4.0 * xb2], axis=0)
                        d2 = jnp.dot(x_op, u_prev,
                                     preferred_element_type=jnp.float32)
                        d = d2[:B_] + d2[B_:]
                    else:
                        d = jnp.dot(xb_prev, u_prev,
                                    preferred_element_type=jnp.float32)
                    acc += d * alpha_ref[p - 1 : p, :].astype(jnp.float32)
                if p < bps:
                    pk = packed_ref[p * rpb : (p + 1) * rpb, :]
                    if variant == "swpipe_nomask":
                        pkw = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int32)
                        planes = [(pkw >> (2 * q)) for q in range(4)]
                    else:
                        pk32 = pk.astype(jnp.int32)
                        planes = [((pk32 >> (2 * q)) & 3) for q in range(4)]
                    u_prev = jnp.concatenate(planes, axis=0).astype(cdt)
            o_ref[:] += acc
            return

        for p in range(bps):
            pk = packed_ref[p * rpb : (p + 1) * rpb, :]
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
            elif variant == "unpack_nodot":
                # WRONG MATH — floor row (b): the FULL baseline unpack chain
                # (widen, 4x shift/mask, concat, cast) consumed by a sublane
                # reduction instead of the MXU dot. The reduction itself is
                # ~1 extra pass over the codes, so this row slightly
                # OVERSTATES unpack-without-dot; (c)-(b) understates the dot.
                pk32 = pk.astype(jnp.int32)
                planes = [((pk32 >> (2 * q)) & 3) for q in range(4)]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.sum(u, axis=0, keepdims=True).astype(jnp.float32)
            elif variant == "no_unpack_a8":
                # WRONG MATH — a8 floor: DMA + plane-copy concat + s8 MXU
                # dots, no shifts/masks/casts (the a8 pipeline's analog of
                # no_unpack: what W2A8 would cost if codes streamed ready).
                u8 = jnp.concatenate([pk] * 4, axis=0)  # (BS, tn) int8
                xq = (xb * 16.0).astype(jnp.int8)
                d = jnp.dot(
                    xq, u8, preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (1.0 / 16.0)
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
            elif variant in ("i32_planes", "i32_planes_a8"):
                # packed_ref holds int32 words, 16 codes each; plane q of
                # word-row s is code row q*8+s of the block. No int8 widen.
                pk32 = pk  # (8, tn) int32 per block
                planes = [((pk32 >> (2 * q)) & 3) for q in range(16)]
                if variant == "i32_planes_a8":
                    u = jnp.concatenate(
                        [q_.astype(jnp.int8) for q_ in planes], axis=0
                    )
                    xq = (xb * 16.0).astype(jnp.int8)
                    d = jnp.dot(
                        xq, u, preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (1.0 / 16.0)
                else:
                    u = jnp.concatenate(planes, axis=0).astype(cdt)
                    d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "bitcast32":
                # Cross-width bitcast probe: reinterpret the int8 tile as
                # int32 in-register (layout = whatever Mosaic does; timing
                # probe first, exact layout compensated offline if fast).
                pk32 = pltpu.bitcast(pk, jnp.int32)  # (BS4//4, tn)?
                planes = [((pk32 >> (2 * q)) & 3) for q in range(16)]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant in ("i8_cmp", "i8_cmp_a8"):
                # Field extraction without any int32: unsigned-range compares
                # on the int8 byte itself (no i8 shifts on TPU, but compares
                # and adds are native). Fields u_q in {0,1,2} so the byte is
                # b = u0 + 4 u1 + 16 u2 + 64 u3 <= 170; threshold recovery:
                #   u3 = (b>=64)+(b>=128), r = b-64*u3, u2 = (r>=16)+(r>=32)...
                one = jnp.int8(1)
                b = pltpu.bitcast(pk, jnp.uint8)
                u3 = (b >= 64).astype(jnp.int8) + (b >= 128).astype(jnp.int8)
                r3 = pltpu.bitcast(b, jnp.int8) - u3 * jnp.int8(64)
                u2 = (r3 >= 16).astype(jnp.int8) + (r3 >= 32).astype(jnp.int8)
                r2 = r3 - u2 * jnp.int8(16)
                u1 = (r2 >= 4).astype(jnp.int8) + (r2 >= 8).astype(jnp.int8)
                u0 = r2 - u1 * jnp.int8(4)
                del one
                if variant == "i8_cmp_a8":
                    u = jnp.concatenate([u0, u1, u2, u3], axis=0)
                    xq = (xb * 16.0).astype(jnp.int8)
                    d = jnp.dot(
                        xq, u, preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (1.0 / 16.0)
                else:
                    u = jnp.concatenate([u0, u1, u2, u3], axis=0).astype(cdt)
                    d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant in ("nomask_2dot", "i16_nomask_2dot"):
                # Mask-free unpack: with zero-extended bytes, the raw shifted
                # plane s_q = sum_{p>=q} 4^(p-q) c_p telescopes:
                #   dot(x, masked) = dot(x, s) - 4*dot(shift32(x), s)
                # so the 3 full-volume mask passes become one extra dot row
                # block on the TINY x side (stacked into a single 2B-row dot).
                B_ = xs.shape[0]
                if variant == "i16_nomask_2dot":
                    pkw = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int16)
                else:
                    pkw = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int32)
                planes = [(pkw >> (2 * q)) for q in range(4)]  # no masks
                u = jnp.concatenate(planes, axis=0).astype(cdt)  # <=255 exact
                xb2 = jnp.concatenate(
                    [jnp.zeros((B_, BS4), cdt), xb[:, : BS - BS4]], axis=1
                )
                xs2 = jnp.concatenate([xb, -4.0 * xb2], axis=0)  # (2B, BS)
                d2 = jnp.dot(xs2, u, preferred_element_type=jnp.float32)
                d = d2[:B_] + d2[B_:]
            elif variant in ("nomask_1dot", "i16_nomask_1dot"):
                # Mask-free telescoped planes folded into ONE dot: the
                # 2B-row stack of nomask_2dot collapses into a single
                # modified x operand x~ = xb - 4*shift(xb) (one tiny VPU
                # pass over the x tile) at the cost of one extra bf16
                # rounding on x~ (|x~| <= 5|x|, so ~2^-9 relative).
                B_ = xs.shape[0]
                if variant == "i16_nomask_1dot":
                    pkw = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int16)
                else:
                    pkw = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int32)
                planes = [(pkw >> (2 * q)) for q in range(4)]  # no masks
                u = jnp.concatenate(planes, axis=0).astype(cdt)  # <=255 exact
                xb2 = jnp.concatenate(
                    [jnp.zeros((B_, BS4), jnp.float32),
                     xb[:, : BS - BS4].astype(jnp.float32)], axis=1
                )
                xt = (xb.astype(jnp.float32) - 4.0 * xb2).astype(cdt)
                d = jnp.dot(xt, u, preferred_element_type=jnp.float32)
            elif variant in ("swpipe", "swpipe_nomask"):
                # Software-pipelined probe: the dot consumes the PREVIOUS
                # iteration's unpacked block, so unpack(p) and dot(p-1) are
                # dependency-free and may overlap (VPU vs MXU). Same math.
                pass  # handled outside the per-p dispatch (needs loop state)
            elif variant == "bf16_floors":
                # All-bf16 field extraction, single dot: signed cast, prefix
                # planes p_q = floor(b/4^q), fields f_q = p_q - 4 p_{q+1};
                # the byte sign folds into f3 via one compare-select.
                b16 = pk.astype(cdt)  # signed int8 -> bf16, exact
                p1 = jnp.floor(b16 * 0.25)
                p2 = jnp.floor(p1 * 0.25)
                p3 = jnp.floor(p2 * 0.25)
                f0 = b16 - 4.0 * p1
                f1 = p1 - 4.0 * p2
                f2 = p2 - 4.0 * p3
                f3 = jnp.where(b16 < 0, p3 + 4.0, p3)
                u = jnp.concatenate([f0, f1, f2, f3], axis=0)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "bf16_floors_2dot":
                # Prefix planes only + stacked 2-dot telescoping + appended
                # sign-correction rows (depth 160).
                B_ = xs.shape[0]
                b16 = pk.astype(cdt)
                p1 = jnp.floor(b16 * 0.25)
                p2 = jnp.floor(p1 * 0.25)
                p3 = jnp.floor(p2 * 0.25)
                h4 = jnp.where(b16 < 0, jnp.asarray(4.0, cdt), jnp.asarray(0.0, cdt))
                u = jnp.concatenate([b16, p1, p2, p3, h4], axis=0)  # (160,tn)
                xf = jnp.concatenate([xb, xb[:, BS - BS4 :]], axis=1)  # (B,160)
                xb2 = jnp.concatenate(
                    [jnp.zeros((B_, BS4), cdt), xb[:, : BS - BS4]], axis=1
                )
                xneg = jnp.concatenate(
                    [-4.0 * xb2, jnp.zeros((B_, BS4), cdt)], axis=1
                )  # (B,160)
                xs2 = jnp.concatenate([xf, xneg], axis=0)  # (2B,160)
                d2_ = jnp.dot(xs2, u, preferred_element_type=jnp.float32)
                d = d2_[:B_] + d2_[B_:]
            elif variant == "nibble_a8":
                # Unsigned nibble planes (fit int8, no sign correction):
                # planes {lo4, lo4>>2, hi4, hi4>>2}; f pairs telescope into a
                # stacked int8 2-dot. Only 4 shift/mask passes, no masks on
                # the 2-bit level, no h plane.
                B_ = xs.shape[0]
                pku = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int32)
                lo4 = pku & 15
                hi4 = pku >> 4
                l1 = lo4 >> 2
                h1 = hi4 >> 2
                u8 = jnp.concatenate(
                    [
                        lo4.astype(jnp.int8),
                        l1.astype(jnp.int8),
                        hi4.astype(jnp.int8),
                        h1.astype(jnp.int8),
                    ],
                    axis=0,
                )
                xq = (xb * 16.0).astype(jnp.int8)
                z = jnp.zeros((B_, BS4), jnp.int8)
                # quarters (x0,x1,x2,x3) pair rows [lo4,l1,hi4,h1]; the -4
                # term pairs x0->l1 and x2->h1 only.
                x0 = xq[:, :BS4]
                x2 = xq[:, 2 * BS4 : 3 * BS4]
                xneg = jnp.concatenate([z, x0, z, x2], axis=1)
                d1 = jnp.dot(xq, u8, preferred_element_type=jnp.int32)
                d2_ = jnp.dot(xneg, u8, preferred_element_type=jnp.int32)
                d = (d1 - 4 * d2_).astype(jnp.float32) * (1.0 / 16.0)
            elif variant == "nomask_a8":
                # Mask-free + int8 MXU: SIGNED shifted planes fit int8
                # (s_q in [-128,127]); the sign bit adds a constant
                # -256/4^q per plane which telescopes to a single
                # quarter-size correction dot against h = [byte < 0]:
                #   exact = d1 - 4*d2 + 4*dot(x_3, h)
                B_ = xs.shape[0]
                pk32 = pk.astype(jnp.int32)  # sign-extend
                planes = [
                    (pk32 >> (2 * q)).astype(jnp.int8) for q in range(4)
                ]
                u8 = jnp.concatenate(planes, axis=0)  # (BS, tn) int8
                h8 = (pk32 < 0).astype(jnp.int8)  # (BS4, tn); i8 cmp unsupported
                xq = (xb * 16.0).astype(jnp.int8)
                xq2 = jnp.concatenate(
                    [jnp.zeros((B_, BS4), jnp.int8), xq[:, : BS - BS4]],
                    axis=1,
                )
                d1 = jnp.dot(xq, u8, preferred_element_type=jnp.int32)
                d2 = jnp.dot(xq2, u8, preferred_element_type=jnp.int32)
                dh = jnp.dot(
                    xq[:, BS - BS4 :], h8, preferred_element_type=jnp.int32
                )
                d = (d1 - 4 * d2 + 4 * dh).astype(jnp.float32) * (1.0 / 16.0)
            elif variant == "i16_planes":
                # Shifts/masks on 16-bit lanes (2 elements per 32-bit lane).
                pk16 = pltpu.bitcast(pk, jnp.uint8).astype(jnp.int16)
                planes = [((pk16 >> (2 * q)) & 3) for q in range(4)]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "ablate_shift":
                # WRONG MATH: no shifts/masks — bound their cost.
                pk32 = pk.astype(jnp.int32)
                u = jnp.concatenate([pk32] * 4, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            elif variant == "ablate_mask":
                # WRONG MATH: shifts but no masks — bound mask cost.
                pk32 = pk.astype(jnp.int32)
                planes = [(pk32 >> (2 * q)) for q in range(4)]
                u = jnp.concatenate(planes, axis=0).astype(cdt)
                d = jnp.dot(xb, u, preferred_element_type=jnp.float32)
            else:
                raise ValueError(variant)
            acc += d * alpha_ref[p : p + 1, :].astype(jnp.float32)
        o_ref[:] += acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("variant", "tn", "bps"))
def run_variant(x, packed, alpha, mu, *, variant, tn=4096, bps=16):
    rpb = 8 if variant.startswith("i32") else BS4
    codes_per = BS // rpb
    K4, n = packed.shape
    K = K4 * codes_per
    nb = K // BS
    B = x.shape[0]
    grid = (1, n // tn, nb // bps)
    return pl.pallas_call(
        make_kernel(variant, bps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, bps * BS), lambda b, i, j: (b, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bps * rpb, tn), lambda b, i, j: (j, i), memory_space=pltpu.VMEM),
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


def time_chain_interleaved(calls, x0, n1=64, n2=320, reps=9):
    """Measure many variants with rounds interleaved across variants, so
    machine-state drift (tunnel warmup, clock scaling) hits all variants
    equally. Returns {name: seconds_per_call} using per-variant min slopes."""

    def chained(call, n):
        @jax.jit
        def f(x):
            def body(c, _):
                o = call(c)
                c2 = jax.lax.dynamic_slice(o, (0, 0), c.shape).astype(c.dtype)
                return c2, ()

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return f

    fns = {}
    for name, call in calls.items():
        try:
            f1, f2 = chained(call, n1), chained(call, n2)
            fetch(f1(x0))
            fetch(f2(x0))
            fns[name] = (f1, f2)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    t1s = {name: [] for name in fns}
    t2s = {name: [] for name in fns}
    for _ in range(reps):
        for name, (f1, f2) in fns.items():
            t0 = time.time()
            fetch(f1(x0))
            t1s[name].append(time.time() - t0)
            t0 = time.time()
            fetch(f2(x0))
            t2s[name].append(time.time() - t0)
    return {
        name: (min(t2s[name]) - min(t1s[name])) / (n2 - n1) for name in fns
    }


def pack8(U):
    """Baseline plane-interleaved int8 layout: byte[p*32+r], field q = code
    row p*128 + q*32 + r."""
    K, n = U.shape
    Ub = U.reshape(K // BS, 4, BS4, n)  # (p, q, r, n)
    b = (
        Ub[:, 0] | (Ub[:, 1] << 2) | (Ub[:, 2] << 4) | (Ub[:, 3] << 6)
    )  # (p, r, n)
    return b.reshape(K // 4, n).astype(np.uint8).view(np.int8)


def pack32(U):
    """int32-word layout: word[p*8+s], field q (bits 2q) = code row
    p*128 + q*8 + s."""
    K, n = U.shape
    Uw = U.reshape(K // BS, 16, 8, n).astype(np.uint32)  # (p, q, s, n)
    w = np.zeros((K // BS, 8, n), np.uint32)
    for q in range(16):
        w |= Uw[:, q] << (2 * q)
    return w.reshape(K // 16, n).view(np.int32)


def main():
    rng = np.random.default_rng(0)
    K, n = 4096, 12288
    U = rng.integers(0, 3, (K, n))
    packed = jnp.asarray(pack8(U))
    packed32 = jnp.asarray(pack32(U))
    nb = K // BS
    alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.bfloat16)
    mu = jnp.asarray(rng.normal(0, 0.001, (nb, n)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
    print("backend:", jax.default_backend(), flush=True)

    exact = {
        "nomask_2dot": packed,
        "swpipe": packed,
        "swpipe_nomask": packed,
    }
    ref = run_variant(x0, packed, alpha, mu, variant="baseline")
    for v, pk in exact.items():
        try:
            got = run_variant(x0, pk, alpha, mu, variant=v)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"{v}: max abs err vs baseline = {err:.3e}", flush=True)
        except Exception as e:
            print(f"{v}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
    # a8 variants must match int8_dot bitwise (same x quantization).
    ref8 = run_variant(x0, packed, alpha, mu, variant="int8_dot")
    for v8 in ("nibble_a8", "nomask_a8"):
        try:
            got8 = run_variant(x0, packed, alpha, mu, variant=v8)
            err8 = float(jnp.max(jnp.abs(got8 - ref8)))
            print(f"{v8}: max abs err vs int8_dot = {err8:.3e}", flush=True)
        except Exception as e:
            print(f"{v8}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    timed = [
        ("baseline", packed),
        ("nomask_2dot", packed),
        ("swpipe", packed),
        ("swpipe_nomask", packed),
        ("int8_dot", packed),
        ("no_unpack", packed),
        ("dma_only", packed),
        ("unpack_nodot", packed),
        ("no_unpack_a8", packed),
        ("nomask_a8", packed),
        ("nibble_a8", packed),
    ]
    calls = {
        v: (lambda c, pk=pk, v=v: run_variant(c, pk, alpha, mu, variant=v))
        for v, pk in timed
    }
    times = time_chain_interleaved(calls, x0, reps=17)
    for v, t in times.items():
        gbs = (K // 4) * n / t / 1e9
        print(f"{v:14s}: {t*1e6:7.1f} us  packed {gbs:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
