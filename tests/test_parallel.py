"""Sharding tests on the 8-device virtual CPU mesh: partitioned forward and
quantization must be numerically identical to single-device runs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.parallel.mesh import auto_mesh, make_mesh
from pt2tpu.parallel.sharding import batch_sharding, param_shardings, shard_params
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def test_mesh_construction():
    mesh = make_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = auto_mesh()
    assert np.prod(list(mesh2.shape.values())) == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "model": 5})


def test_sharded_dense_forward_matches_single_device():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    want = np.asarray(dec.forward(cfg, params, toks))

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_params(params, mesh)
    toks_s = jax.device_put(toks, batch_sharding(mesh))
    got = np.asarray(jax.jit(lambda p, t: dec.forward(cfg, p, t))(sp, toks_s))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_ternary_forward_matches_single_device():
    cfg = get_config("tiny-llama")
    qparams = random_ternary_params(
        cfg, jax.random.PRNGKey(2), dtype=jnp.float32, block_size=32,
        scale_dtype=jnp.float32,
    )
    toks = jax.random.randint(jax.random.PRNGKey(3), (4, 8), 0, cfg.vocab_size)
    want = np.asarray(dec.forward(cfg, qparams, toks, impl="xla"))

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_params(qparams, mesh)
    toks_s = jax.device_put(toks, batch_sharding(mesh))
    got = np.asarray(
        jax.jit(lambda p, t: dec.forward(cfg, p, t, impl="xla"))(sp, toks_s)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sharded_quantization_matches_single_device(rng):
    """ternary_gptq under GSPMD (W row-sharded over 'model') must equal the
    unsharded result bit-for-bit on codes."""
    from pt2tpu.quant import gptq, hessian

    W = rng.normal(0.02, 1.0, size=(32, 64)).astype(np.float32)
    X = rng.normal(size=(256, 64)).astype(np.float32)
    H = jnp.asarray(X.T @ X / 256)
    _, Hinv = hessian.damped_inverse(H)
    q_ref = gptq.ternary_gptq(jnp.asarray(W), H, Hinv, block_size=16)

    mesh = make_mesh({"data": 2, "model": 4})
    Ws = jax.device_put(jnp.asarray(W), NamedSharding(mesh, P("model", None)))
    Hs = jax.device_put(H, NamedSharding(mesh, P()))
    His = jax.device_put(Hinv, NamedSharding(mesh, P()))
    q_sh = jax.jit(
        lambda w, h, hi: gptq.ternary_gptq(w, h, hi, block_size=16)
    )(Ws, Hs, His)
    np.testing.assert_array_equal(np.asarray(q_sh.T), np.asarray(q_ref.T))
    np.testing.assert_allclose(
        np.asarray(q_sh.alpha), np.asarray(q_ref.alpha), rtol=1e-5
    )


def test_sharded_decode_runs():
    """Greedy decode on a TP+DP mesh: compiles, runs, matches unsharded."""
    from pt2tpu.serve import greedy_generate

    cfg = get_config("tiny-llama")
    qparams = random_ternary_params(
        cfg, jax.random.PRNGKey(4), dtype=jnp.float32, block_size=32,
        scale_dtype=jnp.float32,
    )
    prompt = jax.random.randint(jax.random.PRNGKey(5), (4, 4), 0, cfg.vocab_size)
    want = np.asarray(
        greedy_generate(cfg, qparams, prompt, max_new=4, max_len=16, impl="xla")
    )
    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_params(qparams, mesh)
    prompt_s = jax.device_put(prompt, batch_sharding(mesh))
    got = np.asarray(
        greedy_generate(cfg, sp, prompt_s, max_new=4, max_len=16, impl="xla")
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_pipeline_bit_identical():
    """quantize_model(mesh=...) must reproduce the single-device codes."""
    from pt2tpu.data import get_calibration_data
    from pt2tpu.quant import QuantConfig, quantize_model

    cfg = get_config("tiny-llama").with_(n_layers=1)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib, _ = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=8, seq_len=32, seed=0
    )
    qcfg = QuantConfig(block_size=32, batch_size=8)
    qp1, _ = quantize_model(cfg, params, jnp.asarray(calib), qcfg)
    mesh = make_mesh({"data": 2, "model": 4})
    qp2, _ = quantize_model(cfg, params, jnp.asarray(calib), qcfg, mesh=mesh)
    for name in ("qkv", "o", "gateup", "down"):
        a = np.asarray(dec.layer_slice(qp1["layers"], 0)[name].packed)
        b = np.asarray(dec.layer_slice(qp2["layers"], 0)[name].packed)
        np.testing.assert_array_equal(a, b)


def test_mesh_aware_artifact_load(tmp_path):
    """load_model(mesh=...) places parameters with the TP rules directly."""
    from pt2tpu.utils.checkpoint import load_model, save_model
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("tiny-llama")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, block_size=32,
        scale_dtype=jnp.float32,
    )
    save_model(str(tmp_path / "art"), cfg, params)
    mesh = make_mesh({"data": 2, "model": 4})
    cfg2, sp = load_model(str(tmp_path / "art"), mesh=mesh)
    qkv = sp["layers"]["qkv"]
    assert len(qkv.packed.sharding.device_set) == 8
    toks = jnp.zeros((2, 4), jnp.int32)
    want = np.asarray(dec.forward(cfg, params, toks, impl="xla"))
    got = np.asarray(dec.forward(cfg2, sp, toks, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
