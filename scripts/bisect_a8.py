"""Bisect which op in the nomask_a8 variant Mosaic rejects."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS, BS4 = 128, 32


def make(step):
    def _kernel(x_ref, packed_ref, o_ref):
        B_ = x_ref.shape[0]
        tn = o_ref.shape[1]
        xb = x_ref[:].astype(jnp.bfloat16)
        pk = packed_ref[0:BS4, :]
        pk32 = pk.astype(jnp.int32)
        planes = [(pk32 >> (2 * q)).astype(jnp.int8) for q in range(4)]
        u8 = jnp.concatenate(planes, axis=0)
        xq = (xb[:, :BS] * 16.0).astype(jnp.int8)
        if step == "base":
            d = jnp.dot(xq, u8, preferred_element_type=jnp.int32)
        elif step == "h8":
            h8 = (pk < 0).astype(jnp.int8)
            d = jnp.dot(
                xq[:, BS - BS4 :], h8, preferred_element_type=jnp.int32
            )
        elif step == "xq2":
            xq2 = jnp.concatenate(
                [jnp.zeros((B_, BS4), jnp.int8), xq[:, : BS - BS4]], axis=1
            )
            d = jnp.dot(xq2, u8, preferred_element_type=jnp.int32)
        elif step == "twodot":
            xq2 = jnp.concatenate(
                [jnp.zeros((B_, BS4), jnp.int8), xq[:, : BS - BS4]], axis=1
            )
            d1 = jnp.dot(xq, u8, preferred_element_type=jnp.int32)
            d2 = jnp.dot(xq2, u8, preferred_element_type=jnp.int32)
            d = d1 - 4 * d2
        elif step == "fold":
            # Fold the sign correction into the main dot: append 4*h8 rows
            # to the weight operand and the top x quarter to the x side.
            h8 = (pk < 0).astype(jnp.int8) * jnp.int8(4)
            u8f = jnp.concatenate([u8, h8], axis=0)  # (160, tn)
            xqf = jnp.concatenate([xq, xq[:, BS - BS4 :]], axis=1)  # (B,160)
            xq2 = jnp.concatenate(
                [jnp.zeros((B_, BS4), jnp.int8), xq[:, : BS - BS4]], axis=1
            )
            d1 = jnp.dot(xqf, u8f, preferred_element_type=jnp.int32)
            d2 = jnp.dot(xq2, u8, preferred_element_type=jnp.int32)
            d = d1 - 4 * d2
        elif step == "cmp_only":
            # compare-derived plane inside a depth-128 dot
            h8 = (pk < 0).astype(jnp.int8)
            u8h = jnp.concatenate([planes[0], planes[1], planes[2], h8], axis=0)
            d = jnp.dot(xq, u8h, preferred_element_type=jnp.int32)
        elif step == "d160":
            # depth-160 int8 dot, no compare
            u8f = jnp.concatenate(planes + [planes[0]], axis=0)
            xqf = jnp.concatenate([xq, xq[:, BS - BS4 :]], axis=1)
            d = jnp.dot(xqf, u8f, preferred_element_type=jnp.int32)
        elif step == "all":
            h8 = (pk < 0).astype(jnp.int8)
            xq2 = jnp.concatenate(
                [jnp.zeros((B_, BS4), jnp.int8), xq[:, : BS - BS4]], axis=1
            )
            d1 = jnp.dot(xq, u8, preferred_element_type=jnp.int32)
            d2 = jnp.dot(xq2, u8, preferred_element_type=jnp.int32)
            dh = jnp.dot(
                xq[:, BS - BS4 :], h8, preferred_element_type=jnp.int32
            )
            d = d1 - 4 * d2 + 4 * dh
        o_ref[:] = d.astype(jnp.float32)

    return _kernel


@functools.partial(jax.jit, static_argnames=("step",))
def run(x, packed, *, step):
    K4, n = packed.shape
    return pl.pallas_call(
        make(step),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
    )(x, packed)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((16, 128)), jnp.bfloat16)
packed = jnp.asarray(rng.integers(-128, 128, (32, 512)), jnp.int8)
for step in ["cmp_only", "d160"]:
    try:
        np.asarray(run(x, packed, step=step))
        print(step, "OK", flush=True)
    except Exception as e:
        print(step, "FAIL", type(e).__name__, str(e)[:500], flush=True)
