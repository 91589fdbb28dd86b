"""Runnable demos — the TPU-native counterpart of the reference's
``examples.py`` (its only test-like artifact, ref examples.py:15-208), plus
demos for the subsystems the reference doesn't have.

    python examples.py            # run all
    python examples.py atq ssr    # run selected

Each demo prints the metrics a human would eyeball; the real assertions
live in tests/.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def example_atq_stages():
    """ATQ stage-by-stage error reduction (ref examples.py:15-48)."""
    import pt2tpu
    from pt2tpu.core import ternary as atq

    rng = np.random.default_rng(42)
    W = jnp.asarray(rng.normal(0.05, 1.0, (64, 256)).astype(np.float32))
    a, mu, T = atq.ternary_init(W)
    e0 = float(pt2tpu.quantization_error(W, a * T + mu))
    a, mu, T = atq.itf(W, a, mu, T)
    e1 = float(pt2tpu.quantization_error(W, a * T + mu))
    X = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    S = X.T @ X
    a2, mu2 = atq.aga_exact(W, T, S, fallback=(a, mu))
    e2 = float(pt2tpu.output_error(W, a2 * T + mu2, X))
    e2_itf = float(pt2tpu.output_error(W, a * T + mu, X))
    print(f"  init E_w={e0:.1f} -> ITF E_w={e1:.1f} ({e0 / e1:.2f}x better)")
    print(f"  output error: ITF grid {e2_itf:.1f} -> exact AGA {e2:.1f}")
    codes = np.unique(np.asarray(T), return_counts=True)
    print(f"  ternary histogram: {dict(zip(codes[0].astype(int), codes[1]))}")


def example_ssr():
    """SSR homogeneous-block effect on per-block ternarization error
    (ref examples.py:80-107, with the metric that actually matters: ATQ
    E_w per block, since per-row alpha/mu are shared across a block)."""
    from pt2tpu.core import ssr, ternary as atq

    rng = np.random.default_rng(42)
    # Two directional column clusters, shuffled: blocks mixing clusters
    # force one ternary grid to straddle both.
    a = rng.normal(size=(32, 1))
    b = rng.normal(size=(32, 1))
    W = np.concatenate(
        [a + 0.3 * rng.normal(size=(32, 64)), b + 0.3 * rng.normal(size=(32, 64))],
        axis=1,
    )[:, rng.permutation(128)].astype(np.float32)
    Wj = jnp.asarray(W)

    def blockwise_err(Wb):
        total = 0.0
        for i in range(0, 128, 32):
            blk = Wb[:, i : i + 32]
            r = atq.atq_quantize(blk, use_aga=False)
            total += float(jnp.sum((blk - (r.alpha * r.T + r.mu)) ** 2))
        return total

    perm = np.asarray(ssr.static_reorder_indices(Wj))
    e0, e1 = blockwise_err(Wj), blockwise_err(Wj[:, perm])
    print(f"  block-wise ATQ E_w: sequential {e0:.2f} -> SSR-reordered {e1:.2f}"
          f" ({e0 / e1:.2f}x better)")


def example_layer_quant():
    """Single-layer GPTQ ternarization (ref examples.py:110-147)."""
    import pt2tpu

    rng = np.random.default_rng(42)
    W = jnp.asarray(rng.normal(0.01, 0.8, (128, 256)).astype(np.float32))
    X = jnp.asarray(rng.normal(size=(2048, 256)).astype(np.float32))
    H = X.T @ X / 2048
    _, Hinv = pt2tpu.damped_inverse(H)
    q = pt2tpu.ternary_gptq(W, H, Hinv, block_size=64)
    W_hat = pt2tpu.dequantize_layer(q, 256)
    out_err = float(pt2tpu.output_error(W, W_hat, X) / pt2tpu.output_error(W, 0 * W, X))
    packed = pt2tpu.pack_ternary(q.T, block_size=64)
    ratio = W.size * 4 / (packed.size + (q.alpha.size + q.mu.size) * 2)
    print(f"  relative output error {out_err:.4f}; compression {ratio:.1f}x vs fp32")


def example_model_pipeline():
    """End-to-end tiny-model quantization + perplexity (the reference CLI
    flow, ref main.py:338-433, in-process)."""
    from pt2tpu.data import evaluate_perplexity, get_calibration_data
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.quant import QuantConfig, quantize_model
    from pt2tpu.utils.metrics import model_bits_per_weight

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib, prov = get_calibration_data(
        "synthetic", cfg.vocab_size, num_samples=8, seq_len=32
    )
    t0 = time.time()
    qp, report = quantize_model(
        cfg, params, jnp.asarray(calib), QuantConfig(block_size=32, batch_size=4)
    )
    stream = np.random.default_rng(1).integers(0, cfg.vocab_size, 512)
    ppl_f = evaluate_perplexity(cfg, params, stream, seq_len=32)["ppl"]
    ppl_q = evaluate_perplexity(cfg, qp, stream, seq_len=32)["ppl"]
    print(f"  quantized {cfg.n_layers} layers in {time.time()-t0:.1f}s [{prov}]")
    print(f"  bits/weight {model_bits_per_weight(qp):.2f}")
    print(f"  ppl fp32 {ppl_f:.2f} -> ternary {ppl_q:.2f}")


def example_serving():
    """Continuous batching over a ternary model (no reference counterpart)."""
    from pt2tpu.models import get_config
    from pt2tpu.serve.engine import ServeEngine
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("tiny-llama")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, block_size=32,
        scale_dtype=jnp.float32,
    )
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64)
    rng = np.random.default_rng(0)
    reqs = [
        eng.submit(rng.integers(0, cfg.vocab_size, size=l), m)
        for l, m in ((4, 6), (7, 5), (3, 8))
    ]
    eng.run()
    for r in reqs:
        print(f"  req {r.uid}: prompt[{len(r.prompt)}] -> {r.out}")
    print(f"  stats: {eng.stats}")


def example_sharding():
    """Mesh-sharded ternary forward (no reference counterpart)."""
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.parallel import auto_mesh, batch_sharding, shard_params
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("tiny-llama")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, block_size=32,
        scale_dtype=jnp.float32,
    )
    mesh = auto_mesh()
    sp = shard_params(params, mesh)
    toks = jax.device_put(
        jnp.zeros((max(2, mesh.shape["data"]), 8), jnp.int32), batch_sharding(mesh)
    )
    logits = jax.jit(lambda p, t: dec.forward(cfg, p, t, impl="xla"))(sp, toks)
    print(f"  mesh {dict(mesh.shape)}; sharded logits {logits.shape} finite="
          f"{bool(jnp.isfinite(logits).all())}")


def example_fold():
    """SSR perm folding: zero runtime index gathers (quant/fold.py)."""
    import dataclasses

    from pt2tpu.models import decoder as dec
    from pt2tpu.quant.fold import fold_layer_perms
    from pt2tpu.utils.randmodel import random_ternary_linear

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    D, I = 128, 256
    lp = {
        "ln1_w": jnp.ones((D,)), "ln1_b": None,
        "ln2_w": jnp.ones((D,)), "ln2_b": None,
        "qkv": random_ternary_linear(keys[0], 3 * D, D, perm_mode="ssr"),
        "o": random_ternary_linear(keys[1], D, D, perm_mode="ssr"),
        "gateup": random_ternary_linear(keys[2], 2 * I, D, perm_mode="ssr"),
        "down": dataclasses.replace(
            random_ternary_linear(keys[3], D, I, perm_mode="ssr"), gather=None
        ),
    }
    cfg = dec.ModelConfig(family="llama", vocab_size=64, dim=D, n_layers=1,
                          n_heads=4, intermediate=I)
    folded = fold_layer_perms(cfg, lp)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, D)),
                    jnp.float32)
    cos, sin = dec.rope_tables(cfg.hd, 4)
    mask = dec.build_mask(cfg, 4, 4)
    y0, _ = dec.layer_forward(cfg, lp, x, cos, sin, mask, impl="xla")
    y1, _ = dec.layer_forward(cfg, folded, x, cos, sin, mask, impl="xla")
    print(f"  down folded into gateup lanes: input_folded="
          f"{folded['down'].input_folded}; qkv gather via packed one-hot MXU "
          f"matmul; max |delta| = {float(jnp.max(jnp.abs(y1 - y0))):.2e}")


def example_manual_tp():
    """shard_map decode with explicit psum/all_gather (parallel/tp.py)."""
    from pt2tpu.models import get_config
    from pt2tpu.parallel import auto_mesh
    from pt2tpu.parallel.tp import prepare_tp_params, tp_generate
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("tiny-llama")
    params = random_ternary_params(cfg, jax.random.PRNGKey(5), perm_mode="ssr")
    mesh = auto_mesh()
    ways = mesh.shape["model"]
    if cfg.n_heads % ways or cfg.intermediate % ways:
        print(f"  skipped: mesh model={ways} incompatible with tiny config")
        return
    prompt = jnp.ones((2, 4), jnp.int32)
    tp_params = prepare_tp_params(cfg, params, ways)
    got = tp_generate(cfg, mesh, tp_params, prompt, max_new=4, max_len=16,
                      impl="xla")
    want = greedy_generate(cfg, params, prompt, max_new=4, max_len=16,
                           impl="xla")
    print(f"  mesh {dict(mesh.shape)}: TP tokens == single-device tokens: "
          f"{bool((got == want).all())}")


def example_speculative():
    """Speculative decoding: small draft proposes, target verifies (exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.serve.speculative import speculative_generate

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg_d = cfg.with_(n_layers=1)
    params_d = dec.init_params(cfg_d, jax.random.PRNGKey(7), dtype=jnp.float32)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 5)), jnp.int32
    )
    out, stats = speculative_generate(
        cfg, params, cfg_d, params_d, prompt, max_new=12, k=4, max_len=64
    )
    ref = greedy_generate(cfg, params, prompt, max_new=12, max_len=64)
    print(f"  {stats}")
    print(f"  spec tokens == greedy tokens: {bool((out == ref).all())}")


def example_ring_kv():
    """Ring KV cache: gemma3 sliding layers keep only window-sized caches."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.serve.ring import init_ring_caches, ring_generate

    cfg = get_config("tiny-gemma3")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 9)), jnp.int32
    )
    caches = init_ring_caches(cfg, 1, 96)
    print(f"  sliding cache {caches.ring.k.shape} vs global {caches.glob.k.shape}")
    got = ring_generate(cfg, params, prompt, max_new=24, max_len=96, impl="xla")
    ref = greedy_generate(cfg, params, prompt, max_new=24, max_len=96, impl="xla")
    print(f"  ring tokens == flat-cache tokens: {bool((got == ref).all())}")


def example_pipeline_parallel():
    """Pipeline parallelism: stage-sharded layers, microbatch rotation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.parallel import make_mesh, pp_forward

    if len(jax.devices()) < 2:
        print("  (needs >= 2 devices; run under the test conftest)")
        return
    cfg = get_config("tiny-llama").with_(n_layers=4)
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (4, 8)), jnp.int32
    )
    mesh = make_mesh({"stage": 2}, jax.devices()[:2])
    got = pp_forward(cfg, mesh, params, toks, n_micro=2, impl="xla")
    want = dec.forward(cfg, params, toks, impl="xla")
    import numpy as _np
    print(f"  pp logits match: {bool(_np.allclose(_np.asarray(got), _np.asarray(want), atol=1e-5))}")


def example_moe():
    """Routed mixture-of-experts: quantize per expert, serve, and shard
    experts over an 'expert' mesh axis (no reference counterpart — the
    reference is dense-only, ref model.py:162-171)."""
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.parallel.ep import ep_moe_mlp, shard_moe_layer
    from pt2tpu.parallel.mesh import make_mesh
    from pt2tpu.quant.pipeline import QuantConfig, quantize_model

    cfg = get_config("tiny-moe")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    calib = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, cfg.vocab_size)
    qp, report = quantize_model(cfg, params, calib, QuantConfig())
    gu = qp["layers"]["gateup"]
    print(f"  experts stacked: gateup packed {tuple(gu.packed.shape)} "
          f"(layers x experts x planes x lanes)")
    if len(jax.devices()) >= 4:
        mesh = make_mesh({"expert": 4}, jax.devices()[:4])
        lp = dec.layer_slice(qp["layers"], 0)
        lp_ep = shard_moe_layer(lp, mesh)
        h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.dim))
        y = ep_moe_mlp(cfg, lp_ep, h, mesh, impl="xla")
        want = dec._moe_mlp(cfg, lp, h, "xla", 0)
        print(f"  4-way expert-parallel == single-device: "
              f"{bool(np.allclose(np.asarray(y), np.asarray(want), atol=2e-4))}")


def example_engine_sampling():
    """Per-request sampling + speculative decoding inside the batcher."""
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.serve.engine import ServeEngine
    from pt2tpu.serve.sampling import SamplingConfig

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = ServeEngine(cfg, params, max_batch=2, max_len=64, seed=7)
    rng = np.random.default_rng(0)
    greedy = eng.submit(rng.integers(0, cfg.vocab_size, size=4), 6)
    sampled = eng.submit(
        rng.integers(0, cfg.vocab_size, size=5), 6,
        sampling=SamplingConfig(temperature=0.9, top_k=20),
    )
    eng.run()
    print(f"  greedy:  {greedy.out}")
    print(f"  sampled: {sampled.out}  (temp=0.9 top_k=20, seeded)")

    spec = ServeEngine(cfg, params, max_batch=2, max_len=64,
                       draft=(cfg, params), spec_k=3)
    r = spec.submit(rng.integers(0, cfg.vocab_size, size=4), 8)
    rs = spec.submit(
        rng.integers(0, cfg.vocab_size, size=5), 8,
        sampling=SamplingConfig(temperature=0.9, top_k=20),
    )  # speculative SAMPLING: rejection-scheme verify, target-distributed
    spec.run()
    s = spec.stats_spec
    print(f"  speculative engine (greedy): {r.out} accept "
          f"{s['accepted']}/{s['drafted']} in {spec.stats['steps']} steps")
    print(f"  speculative engine (sampled): {rs.out}")


def example_paged_kv():
    """Pooled paged KV cache: 3 requests through a 6-page pool."""
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.serve.paged import PagedServeEngine

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = PagedServeEngine(cfg, params, max_batch=2, max_len=64,
                           page_size=16, kv_pages=6)
    rng = np.random.default_rng(0)
    reqs = [eng.submit(rng.integers(0, cfg.vocab_size, size=l), m)
            for l, m in ((4, 6), (9, 5), (17, 6))]
    eng.run()
    for r in reqs:
        print(f"  req {r.uid}: prompt[{len(r.prompt)}] -> {r.out}")
    print(f"  pool drained back to {len(eng._free)} free pages")


def example_context_parallel():
    """Ring attention: sequence sharded over 4 devices, O(L/C) KV each."""
    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.parallel.cp import cp_forward
    from pt2tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        print("  (needs 4 devices; skipped)")
        return
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
    mesh = make_mesh({"context": 4}, jax.devices()[:4])
    got = cp_forward(cfg, mesh, params, toks, impl="xla")
    want = dec.forward(cfg, params, toks, impl="xla")
    print(f"  ring-attention logits match causal: "
          f"{bool(np.allclose(np.asarray(got), np.asarray(want), atol=5e-4))}")


EXAMPLES = {
    "atq": example_atq_stages,
    "ssr": example_ssr,
    "layer": example_layer_quant,
    "pipeline": example_model_pipeline,
    "serving": example_serving,
    "sharding": example_sharding,
    "fold": example_fold,
    "tp": example_manual_tp,
    "speculative": example_speculative,
    "ring": example_ring_kv,
    "pp": example_pipeline_parallel,
    "moe": example_moe,
    "engine_sampling": example_engine_sampling,
    "paged": example_paged_kv,
    "cp": example_context_parallel,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXAMPLES)
    for name in names:
        print(f"== {name} ==")
        EXAMPLES[name]()
