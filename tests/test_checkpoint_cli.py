"""Artifact save/load roundtrips, HF loader, journal resume, CLI smoke."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.utils.checkpoint import load_layers, load_model, save_layer, save_model
from pt2tpu.utils.randmodel import random_ternary_params

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def test_artifact_roundtrip_ternary(tmp_path):
    cfg = get_config("tiny-llama")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, block_size=32
    )
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    want = np.asarray(dec.forward(cfg, params, toks, impl="xla"))

    save_model(str(tmp_path / "art"), cfg, params, report={"note": "test"})
    cfg2, params2 = load_model(str(tmp_path / "art"))
    assert cfg2 == cfg
    got = np.asarray(dec.forward(cfg2, params2, toks, impl="xla"))
    np.testing.assert_array_equal(got, want)


def test_artifact_roundtrip_dense_bf16(tmp_path):
    cfg = get_config("tiny-opt")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    save_model(str(tmp_path / "art"), cfg, params)
    cfg2, params2 = load_model(str(tmp_path / "art"))
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(leaves1, leaves2):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_layer_journal_roundtrip(tmp_path):
    cfg = get_config("tiny-llama")
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, block_size=32
    )
    l0 = dec.layer_slice(params["layers"], 0)
    l1 = dec.layer_slice(params["layers"], 1)
    save_layer(str(tmp_path), 0, l0)
    save_layer(str(tmp_path), 1, l1)
    loaded = load_layers(str(tmp_path))
    assert len(loaded) == 2
    for orig, back in ((l0, loaded[0]), (l1, loaded[1])):
        for a, b in zip(
            jax.tree_util.tree_leaves(orig), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hf_loader_llama_roundtrip(tmp_path):
    """Write a tiny llama in HF-safetensors layout, load it back, and compare
    against the directly-constructed model."""
    from safetensors.numpy import save_file

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    t = {"model.embed_tokens.weight": np.asarray(params["embed"], np.float32)}
    t["model.norm.weight"] = np.asarray(params["lnf_w"], np.float32)
    t["lm_head.weight"] = np.asarray(params["lm_head"].w, np.float32)
    hfmap = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj",
        "v": "self_attn.v_proj", "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
    }
    for i in range(cfg.n_layers):
        lp = dec.layer_slice(params["layers"], i)
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.asarray(lp["ln1_w"], np.float32)
        t[p + "post_attention_layernorm.weight"] = np.asarray(lp["ln2_w"], np.float32)
        for ours, theirs in hfmap.items():
            t[p + theirs + ".weight"] = np.asarray(lp[ours].w, np.float32)

    d = tmp_path / "hfmodel"
    d.mkdir()
    save_file(t, str(d / "model.safetensors"))
    hf_config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "intermediate_size": cfg.intermediate,
        "max_position_embeddings": cfg.max_seq_len,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
    }
    (d / "config.json").write_text(json.dumps(hf_config))

    from pt2tpu.models.hf_loader import load_hf_model

    cfg2, params2 = load_hf_model(str(d), dtype=jnp.float32)
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers

    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    want = np.asarray(dec.forward(cfg, params, toks))
    got = np.asarray(dec.forward(cfg2, params2, toks))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _run_cli(*argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from pt2tpu.cli import main; main(%r)" % (list(argv),)
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )


def test_cli_quantize_eval_generate(tmp_path):
    out = str(tmp_path / "artifact")
    r = _run_cli(
        "quantize", "--model", "tiny-llama", "--output", out,
        "--block_size", "32", "--num_samples", "4", "--seq_len", "32",
        "--calib", "synthetic", "--eval", "--eval_dataset", "synthetic",
        "--max_windows", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "artifact saved" in r.stdout and "perplexity" in r.stdout
    assert os.path.exists(os.path.join(out, "manifest.json"))

    r2 = _run_cli("info", "--model", out)
    assert r2.returncode == 0 and "model_config" in r2.stdout

    r3 = _run_cli(
        "generate", "--model", out, "--prompt-ids", "1,2,3,4", "--max-new", "4"
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    ids = r3.stdout.strip().splitlines()[-1].split(",")
    assert len(ids) == 4
