"""Fused iota-gather + matmul kernel (v2, safe grid order) vs the two-step
path — interpret mode on CPU. On-chip gates: scripts/tpu_smoke.py and
ops.ternary_matmul.verify_igather_fused (called by bench.py).

Numeric note: on CPU the two-step reference keeps x in f32 while
ternary_matmul_pallas casts to bf16 on TPU only, so these tests feed bf16
inputs to both paths; remaining differences are f32 dot-accumulation order
(few ulps).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pt2tpu.core.packing import unpack_ternary
from pt2tpu.ops.gather import gather_apply
from pt2tpu.ops.kernels.pallas_ternary import (
    ternary_matmul_pallas_igathered,
    ternary_matmul_pallas_igathered_stacked,
)
from pt2tpu.ops import ternary_matmul as tm
from pt2tpu.utils.randmodel import random_ternary_linear


def _dense_ref(p, x):
    """fp64 dense reference: gather by perm (pad lanes -> zero slot) then
    matmul against the exactly dequantized weight."""
    T = np.asarray(unpack_ternary(p.packed, block_size=128)).astype(np.float64)
    al = np.asarray(p.alpha).astype(np.float64)
    mu = np.asarray(p.mu).astype(np.float64)
    W = al.repeat(128, axis=0) * T + mu.repeat(128, axis=0)
    xnp = np.asarray(x).astype(np.float64)
    xpad = np.concatenate([xnp, np.zeros((xnp.shape[0], 1))], axis=1)
    return xpad[:, np.asarray(p.perm)] @ W


def test_igathered_matches_dense_reference():
    p = random_ternary_linear(jax.random.PRNGKey(0), 2048, 512,
                              perm_mode="ssr")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    want = _dense_ref(p, x)
    with pltpu.force_tpu_interpret_mode():
        # multi-output-tile, multi-j grid: the revisit pattern under test
        got = np.asarray(ternary_matmul_pallas_igathered(
            x, p.perm, p.packed, p.alpha, p.mu, block_size=128,
            tile_n=128, blocks_per_step=8,
        ))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


def test_igathered_matches_two_step_bf16():
    p = random_ternary_linear(jax.random.PRNGKey(2), 1024, 512,
                              perm_mode="ssr")
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 512), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        xg = gather_apply(p.gather, x, impl="pallas").astype(jnp.bfloat16)
        from pt2tpu.ops.kernels.pallas_ternary import ternary_matmul_pallas

        want = np.asarray(ternary_matmul_pallas(
            xg, p.packed, p.alpha, p.mu, block_size=128))
        got = np.asarray(ternary_matmul_pallas_igathered(
            x, p.perm, p.packed, p.alpha, p.mu, block_size=128,
            tile_n=128, blocks_per_step=8,
        ))
    # identical bf16 lanes; differences are f32 accumulation order only
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-3, rel


def test_igathered_stacked_layer_select():
    ps = [random_ternary_linear(jax.random.PRNGKey(10 + i), 2048, 512,
                                perm_mode="ssr") for i in range(3)]
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 512), jnp.float32)
    perm_s = jnp.stack([p.perm for p in ps])
    pk = jnp.stack([p.packed for p in ps])
    al = jnp.stack([p.alpha for p in ps])
    mu = jnp.stack([p.mu for p in ps])
    for li in range(3):
        want = _dense_ref(ps[li], x)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ternary_matmul_pallas_igathered_stacked(
                x, perm_s, pk, al, mu, jnp.int32(li), block_size=128,
                tile_n=128, blocks_per_step=8,
            ))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-5, (li, rel)


def test_routing_prefers_igathered_on_decode_rows(monkeypatch):
    """ternary_linear_apply routes gathered decode-size calls to the fused
    iota kernel when IGATHER_FUSED is on (checked by call interception;
    the kernel itself is covered above)."""
    p = random_ternary_linear(jax.random.PRNGKey(5), 1024, 512,
                              perm_mode="ssr")
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 512), jnp.float32)
    calls = {}

    def fake_igathered(x2, perm, packed, alpha, mu, **kw):
        calls["hit"] = True
        return jnp.zeros((x2.shape[0], packed.shape[-1]), jnp.float32)

    import pt2tpu.ops.kernels.pallas_ternary as pk

    monkeypatch.setattr(pk, "ternary_matmul_pallas_igathered",
                        fake_igathered)
    monkeypatch.setattr(tm, "IGATHER_FUSED", True)
    out = tm.ternary_linear_apply(p, x, impl="pallas")
    assert calls.get("hit") and out.shape == (4, 1024)
    # prefill-size rows keep the two-step path
    calls.clear()
    xl = jax.random.normal(jax.random.PRNGKey(7), (128, 512), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        tm.ternary_linear_apply(p, xl, impl="pallas")
    assert "hit" not in calls
