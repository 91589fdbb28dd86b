"""HLO-structure test for the manual-TP chunked-psum overlap claim
(VERDICT r3 weak-6): tp_row_apply's central design point is that chunk
c's psum is ISSUED before chunk c+1's ternary matmul, so on real hardware
the reduction rides the ICI while the MXU streams the next chunk.

The check runs on the LOWERED (pre-backend) module from the 8-CPU mesh:
one all_reduce per chunk, each over its own (B, n/chunks) partial, with
chunk c's all_reduce emitted before chunk c+1's matmul. Serializing the
collectives — concatenating partials into one psum, or hoisting all
reduces after all dots — flips these assertions. (The *compiled* CPU
module is deliberately not used: XLA:CPU's all-reduce combiner merges
adjacent collectives into one tuple all-reduce, destroying exactly the
structure under test; the TPU backend instead splits these into async
start/done pairs its latency-hiding scheduler can overlap.)
"""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.parallel.mesh import make_mesh
from pt2tpu.parallel.tp import prepare_tp_layer, tp_layer_specs, tp_row_apply
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = pytest.mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')

WAYS, CHUNKS = 4, 2


def _lowered_text():
    # o: 256 output lanes -> two 128-lane chunks (the clamp in
    # tp_row_apply keeps chunks 128-aligned, so tiny-llama's 64-wide o
    # would silently degrade to chunks=1)
    cfg = get_config("tiny-llama").with_(
        dim=256, n_heads=4, n_kv_heads=4, intermediate=256, n_layers=1
    )
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), perm_mode="identity"
    )
    lp = prepare_tp_layer(cfg, dec.layer_slice(params["layers"], 0), WAYS)
    mesh = make_mesh({"model": WAYS}, jax.devices()[:WAYS])
    x = jnp.ones((2, 256), jnp.float32)

    def f(p, xx):
        return tp_row_apply(p, xx, "model", chunks=CHUNKS, impl="xla")

    fn = jax.jit(
        jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(tp_layer_specs(lp)["o"], P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )
    return fn.lower(lp["o"], x).as_text()


def test_chunked_psum_interleaves_with_matmuls():
    txt = _lowered_text()
    # restrict to the shard_map body (the matmul sub-function's own ops
    # come later in the file and would confuse position comparisons)
    body = txt.split("sdy.return")[0]
    lines = body.splitlines()
    ar_lines = [
        i for i, l in enumerate(lines) if "stablehlo.all_reduce" in l
    ]
    mm_lines = [
        i for i, l in enumerate(lines)
        if re.search(r"call @ternary_matmul", l)
    ]
    # one all_reduce per chunk, each over its own (B, n/chunks) partial —
    # a serialized concat-then-psum rewrite collapses this to ONE (B, n)
    # all_reduce
    assert len(ar_lines) == CHUNKS, f"want {CHUNKS} all_reduces:\n{body}"
    for i in ar_lines:
        # the op's type signature sits on its multi-line region's closing
        # line: ``}) : (tensor<2x128xf32>) -> tensor<2x128xf32>``
        region = "\n".join(lines[i : i + 8])
        assert "-> tensor<2x128xf32>" in region, region
    assert len(mm_lines) == CHUNKS, (len(mm_lines), CHUNKS)
    # chunk 0's reduction is emitted BEFORE chunk 1's matmul — the
    # overlap window the design claims
    assert mm_lines[0] < ar_lines[0] < mm_lines[1] < ar_lines[1], (
        f"collectives serialized: matmuls at {mm_lines}, "
        f"all_reduces at {ar_lines}"
    )
