"""SSR perm folding (quant/fold.py) + packed one-hot gather correctness.

The fold is a pure layout transformation: every test pins the folded model
to the unfolded one (which tests/test_gptq.py pins to the NumPy oracle).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt2tpu.models import decoder as dec
from pt2tpu.ops.gather import (
    PackedGather,
    apply_input_perm,
    gather_apply,
    make_packed_gather,
)
from pt2tpu.ops.ternary_matmul import PackedTernaryLinear, ternary_linear_apply
from pt2tpu.quant.fold import fold_layer_perms, foldable_prefix_perm, permute_out
from pt2tpu.quant.pipeline import QuantConfig, quantize_model
from pt2tpu.utils.randmodel import random_ternary_linear

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


TINY = dec.ModelConfig(
    family="llama",
    vocab_size=256,
    dim=128,
    n_layers=2,
    n_heads=4,
    intermediate=256,
    max_seq_len=64,
)


def _perm(rng, m, K):
    p = rng.permutation(m).astype(np.int32)
    return np.concatenate([p, np.full(K - m, m, np.int32)])


# ------------------------------------------------------- one-hot gather ----
def test_packed_gather_matches_index_gather(rng):
    m, K = 384, 512
    perm = _perm(rng, m, K)
    g = make_packed_gather(perm, m)
    x = jnp.asarray(rng.standard_normal((5, m)), jnp.float32)
    got = gather_apply(g, x, impl="xla")
    want = apply_input_perm(x, jnp.asarray(perm), m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_gather_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.kernels.pallas_gather import onehot_matmul_pallas

    m, K = 256, 384
    perm = _perm(rng, m, K)
    g = make_packed_gather(perm, m)
    x = jnp.asarray(rng.standard_normal((3, m)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = onehot_matmul_pallas(x, g.packed, tile_n=128)
    want = apply_input_perm(x, jnp.asarray(perm), m)
    np.testing.assert_allclose(np.asarray(got[:, :K]), np.asarray(want), rtol=0, atol=0)


def test_packed_gather_pallas_stacked_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from pt2tpu.ops.kernels.pallas_gather import onehot_matmul_pallas_stacked

    m, K, L = 256, 256, 3
    perms = np.stack([_perm(rng, m, K) for _ in range(L)])
    packed = jnp.stack(
        [make_packed_gather(perms[i], m).packed for i in range(L)]
    )
    x = jnp.asarray(rng.standard_normal((2, m)), jnp.float32)
    for li in range(L):
        with pltpu.force_tpu_interpret_mode():
            got = onehot_matmul_pallas_stacked(
                x, packed, jnp.int32(li), tile_n=128
            )
        want = apply_input_perm(x, jnp.asarray(perms[li]), m)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_field_equals_perm_path(rng):
    """ternary apply with an attached PackedGather == the index-gather path."""
    key = jax.random.PRNGKey(0)
    p = random_ternary_linear(key, 128, 256, perm_mode="ssr")
    assert p.gather is not None and not p.identity_perm
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    got = ternary_linear_apply(p, x, impl="xla")
    # Same layer, gather stripped -> runtime index gather on p.perm.
    p_idx = dataclasses.replace(p, gather=None)
    want = ternary_linear_apply(p_idx, x, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ------------------------------------------------------------ fold unit ----
def test_foldable_prefix_perm(rng):
    p = random_ternary_linear(jax.random.PRNGKey(1), 64, 256, perm_mode="ssr")
    sigma = foldable_prefix_perm(p)
    assert sigma is not None
    np.testing.assert_array_equal(np.sort(sigma), np.arange(256))
    # Ragged layer (pad lanes interleave after the valid prefix breaks only
    # if valid lanes aren't a prefix; simulate a non-prefix perm):
    bad = dataclasses.replace(
        p, perm=jnp.roll(p.perm, 1), identity_perm=False
    )
    assert foldable_prefix_perm(bad) is None


def test_permute_out_ternary(rng):
    p = random_ternary_linear(jax.random.PRNGKey(2), 128, 128)
    sigma = rng.permutation(128)
    q = permute_out(p, sigma)
    x = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    y = ternary_linear_apply(p, x, impl="xla")
    yq = ternary_linear_apply(q, x, impl="xla")
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(y[:, sigma]))
    assert q.out_folded


def test_fold_layer_perms_down_fold(rng):
    """Down's perm folds into gateup output lanes; layer forward unchanged."""
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 4)
    D, I = 128, 256
    lp = {
        "ln1_w": jnp.ones((D,)),
        "ln1_b": None,
        "ln2_w": jnp.ones((D,)),
        "ln2_b": None,
        "qkv": random_ternary_linear(keys[0], 3 * D, D, perm_mode="ssr"),
        "o": random_ternary_linear(keys[1], D, D, perm_mode="ssr"),
        "gateup": random_ternary_linear(keys[2], 2 * I, D, perm_mode="ssr"),
        "down": random_ternary_linear(keys[3], D, I, perm_mode="ssr"),
    }
    # Strip down's pre-attached gather so fold sees the raw perm form.
    lp["down"] = dataclasses.replace(lp["down"], gather=None)
    cfg = TINY
    folded = fold_layer_perms(cfg, lp)
    assert folded["down"].input_folded
    assert folded["down"].gather is None
    assert folded["gateup"].out_folded

    x = jnp.asarray(rng.standard_normal((1, 8, D)), jnp.float32)
    cos, sin = dec.rope_tables(cfg.hd, 8)
    mask = dec.build_mask(cfg, 8, 8)
    y0, _ = dec.layer_forward(cfg, lp, x, cos, sin, mask, impl="xla")
    y1, _ = dec.layer_forward(cfg, folded, x, cos, sin, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=0, atol=1e-5)


# ------------------------------------------------------ end-to-end fold ----
@pytest.mark.parametrize("fuse", [True, False])
def test_pipeline_fold_preserves_logits(rng, fuse):
    """quantize_model(fold_perms=True) == quantize_model(fold_perms=False)."""
    cfg = TINY
    params = dec.init_params(cfg, jax.random.PRNGKey(7))
    calib = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32
    )
    qf, _ = quantize_model(
        cfg, params, calib,
        QuantConfig(fold_perms=True, fuse_projections=fuse, batch_size=4),
    )
    qn, _ = quantize_model(
        cfg, params, calib,
        QuantConfig(fold_perms=False, fuse_projections=fuse, batch_size=4),
    )
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    lf = dec.forward(cfg, qf, toks, impl="xla")
    ln = dec.forward(cfg, qn, toks, impl="xla")
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ln), rtol=0, atol=2e-4)
    # Folded structure: down folded, the rest carry packed gathers.
    layers = qf["layers"]
    assert layers["down"].input_folded
    gu = layers["gateup" if fuse else "gate"]
    assert gu.out_folded
    qkv = layers["qkv" if fuse else "q"]
    assert qkv.gather is not None


def test_fold_checkpoint_roundtrip(tmp_path, rng):
    from pt2tpu.utils.checkpoint import load_model, save_model

    cfg = TINY
    params = dec.init_params(cfg, jax.random.PRNGKey(9))
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    q, rep = quantize_model(cfg, params, calib, QuantConfig(batch_size=2))
    save_model(str(tmp_path / "art"), cfg, q, QuantConfig(), rep)
    cfg2, q2 = load_model(str(tmp_path / "art"))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    l1 = dec.forward(cfg, q, toks, impl="xla")
    l2 = dec.forward(cfg2, q2, toks, impl="xla")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert q2["layers"]["qkv"].gather is not None
    assert q2["layers"]["down"].input_folded


def test_fold_sharded_forward_matches(rng):
    """Folded params under a 2x4 mesh == single-device logits."""
    from pt2tpu.parallel.mesh import make_mesh
    from pt2tpu.parallel.sharding import shard_params

    cfg = TINY
    params = dec.init_params(cfg, jax.random.PRNGKey(11))
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    q, _ = quantize_model(cfg, params, calib, QuantConfig(batch_size=2))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    want = dec.forward(cfg, q, toks, impl="xla")
    mesh = make_mesh({"data": 2, "model": 4})
    qs = shard_params(q, mesh)
    got = dec.forward(cfg, qs, toks, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
