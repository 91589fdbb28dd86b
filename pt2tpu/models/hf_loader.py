"""Load HuggingFace checkpoints (local safetensors / torch .bin) into the
functional param pytree.

TPU-native replacement for the reference's ``load_model_for_quantization``
(ref model.py:228-264): instead of instantiating a torch ``nn.Module`` via
``AutoModelForCausalLM`` and walking its submodules, we read raw tensors
from a local checkpoint directory and map them into the decoder pytree —
no torch runtime on the TPU path, no network (this environment is
zero-egress; point ``--model`` at a local download).

Supported families: llama/llama2/llama3/qwen (HF LlamaForCausalLM layout),
opt (OPTForCausalLM), gpt2 (GPT2LMHeadModel, fused Conv1D qkv split).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .common import DenseLinear
from .decoder import ModelConfig, stack_layers
from .registry import get_model_type

__all__ = ["load_hf_model", "read_hf_tensors", "config_from_hf"]


def read_hf_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all tensors from safetensors shards (preferred) or torch bins."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            tensors.update(load_file(os.path.join(model_dir, f)))
        return tensors
    bin_files = sorted(
        f
        for f in os.listdir(model_dir)
        if f.endswith(".bin") and "pytorch_model" in f
    )
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(
                os.path.join(model_dir, f), map_location="cpu", weights_only=True
            )
            for k, v in sd.items():
                tensors[k] = v.to(torch.float32).numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin checkpoints in {model_dir}")


def config_from_hf(model_dir: str) -> ModelConfig:
    """Build a ModelConfig from a local HF config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    arch = (hc.get("architectures") or [""])[0].lower()
    mt = hc.get("model_type", get_model_type(model_dir))
    if "llama" in arch or mt in ("llama", "mistral", "qwen2", "qwen3"):
        return ModelConfig(
            family=mt,
            vocab_size=hc["vocab_size"],
            dim=hc["hidden_size"],
            n_layers=hc["num_hidden_layers"],
            n_heads=hc["num_attention_heads"],
            n_kv_heads=hc.get("num_key_value_heads"),
            intermediate=hc["intermediate_size"],
            head_dim=hc.get("head_dim"),
            max_seq_len=hc.get("max_position_embeddings", 2048),
            norm="rmsnorm",
            norm_eps=hc.get("rms_norm_eps", 1e-5),
            pos="rope",
            rope_theta=hc.get("rope_theta", 10000.0),
            act="silu",
            gated_mlp=True,
            qkv_bias=bool(hc.get("attention_bias", False) or mt == "qwen2"),
            tie_embeddings=bool(hc.get("tie_word_embeddings", False)),
        )
    if "opt" in arch or mt == "opt":
        return ModelConfig(
            family="opt",
            vocab_size=hc["vocab_size"],
            dim=hc["hidden_size"],
            n_layers=hc["num_hidden_layers"],
            n_heads=hc["num_attention_heads"],
            intermediate=hc["ffn_dim"],
            max_seq_len=hc.get("max_position_embeddings", 2048),
            norm="layernorm",
            pos="learned",
            pos_offset=2,
            act="relu",
            gated_mlp=False,
            linear_bias=True,
            tie_embeddings=bool(hc.get("tie_word_embeddings", True)),
        )
    if "gpt2" in arch or mt == "gpt2":
        return ModelConfig(
            family="gpt2",
            vocab_size=hc["vocab_size"],
            dim=hc["n_embd"],
            n_layers=hc["n_layer"],
            n_heads=hc["n_head"],
            intermediate=hc.get("n_inner") or 4 * hc["n_embd"],
            max_seq_len=hc.get("n_positions", 1024),
            norm="layernorm",
            norm_eps=hc.get("layer_norm_epsilon", 1e-5),
            pos="learned",
            act="gelu",
            gated_mlp=False,
            linear_bias=True,
            tie_embeddings=True,
        )
    raise ValueError(f"unsupported architecture {arch or mt} in {model_dir}")


def _lin(t, wkey, bkey=None, dtype=jnp.bfloat16, transpose=False):
    w = np.asarray(t[wkey], np.float32)
    if transpose:  # GPT-2 Conv1D stores (in, out)
        w = w.T
    b = None
    if bkey and bkey in t:
        b = jnp.asarray(np.asarray(t[bkey], np.float32), dtype)
    return DenseLinear(w=jnp.asarray(w, dtype), b=b)


def _llama_layers(cfg, t, dtype):
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        lay = {
            "ln1_w": jnp.asarray(t[p + "input_layernorm.weight"], dtype),
            "ln1_b": None,
            "ln2_w": jnp.asarray(t[p + "post_attention_layernorm.weight"], dtype),
            "ln2_b": None,
        }
        for ours, theirs in (
            ("q", "self_attn.q_proj"),
            ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"),
            ("o", "self_attn.o_proj"),
            ("gate", "mlp.gate_proj"),
            ("up", "mlp.up_proj"),
            ("down", "mlp.down_proj"),
        ):
            lay[ours] = _lin(
                t, p + theirs + ".weight", p + theirs + ".bias", dtype
            )
        layers.append(lay)
    return layers


def _opt_layers(cfg, t, dtype):
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.decoder.layers.{i}."
        lay = {
            "ln1_w": jnp.asarray(t[p + "self_attn_layer_norm.weight"], dtype),
            "ln1_b": jnp.asarray(t[p + "self_attn_layer_norm.bias"], dtype),
            "ln2_w": jnp.asarray(t[p + "final_layer_norm.weight"], dtype),
            "ln2_b": jnp.asarray(t[p + "final_layer_norm.bias"], dtype),
            "gate": None,
        }
        for ours, theirs in (
            ("q", "self_attn.q_proj"),
            ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"),
            ("o", "self_attn.out_proj"),
            ("up", "fc1"),
            ("down", "fc2"),
        ):
            lay[ours] = _lin(t, p + theirs + ".weight", p + theirs + ".bias", dtype)
        layers.append(lay)
    return layers


def _gpt2_layers(cfg, t, dtype):
    D = cfg.dim
    layers = []
    for i in range(cfg.n_layers):
        p = f"h.{i}." if f"h.{i}.ln_1.weight" in t else f"transformer.h.{i}."
        qkv = np.asarray(t[p + "attn.c_attn.weight"], np.float32).T  # (3D, D)
        qkv_b = np.asarray(t[p + "attn.c_attn.bias"], np.float32)
        lay = {
            "ln1_w": jnp.asarray(t[p + "ln_1.weight"], dtype),
            "ln1_b": jnp.asarray(t[p + "ln_1.bias"], dtype),
            "ln2_w": jnp.asarray(t[p + "ln_2.weight"], dtype),
            "ln2_b": jnp.asarray(t[p + "ln_2.bias"], dtype),
            "gate": None,
            "q": DenseLinear(jnp.asarray(qkv[:D], dtype), jnp.asarray(qkv_b[:D], dtype)),
            "k": DenseLinear(
                jnp.asarray(qkv[D : 2 * D], dtype), jnp.asarray(qkv_b[D : 2 * D], dtype)
            ),
            "v": DenseLinear(
                jnp.asarray(qkv[2 * D :], dtype), jnp.asarray(qkv_b[2 * D :], dtype)
            ),
            "o": _lin(t, p + "attn.c_proj.weight", p + "attn.c_proj.bias", dtype, True),
            "up": _lin(t, p + "mlp.c_fc.weight", p + "mlp.c_fc.bias", dtype, True),
            "down": _lin(t, p + "mlp.c_proj.weight", p + "mlp.c_proj.bias", dtype, True),
        }
        layers.append(lay)
    return layers


def load_hf_model(
    model_dir: str, dtype=jnp.bfloat16
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """(ModelConfig, params) from a local HF checkpoint directory."""
    cfg = config_from_hf(model_dir)
    t = read_hf_tensors(model_dir)
    fam = cfg.family

    if fam == "opt":
        layers = _opt_layers(cfg, t, dtype)
        embed = t["model.decoder.embed_tokens.weight"]
        pos = t["model.decoder.embed_positions.weight"]
        lnf_w = t.get("model.decoder.final_layer_norm.weight")
        lnf_b = t.get("model.decoder.final_layer_norm.bias")
        head = None if cfg.tie_embeddings else t.get("lm_head.weight")
    elif fam == "gpt2":
        layers = _gpt2_layers(cfg, t, dtype)
        pre = "" if "wte.weight" in t else "transformer."
        embed = t[pre + "wte.weight"]
        pos = t[pre + "wpe.weight"]
        lnf_w = t[pre + "ln_f.weight"]
        lnf_b = t[pre + "ln_f.bias"]
        head = None
    else:  # llama family
        layers = _llama_layers(cfg, t, dtype)
        embed = t["model.embed_tokens.weight"]
        pos = None
        lnf_w = t["model.norm.weight"]
        lnf_b = None
        head = None if cfg.tie_embeddings else t.get("lm_head.weight")

    params = {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": None if pos is None else jnp.asarray(pos, dtype),
        "layers": stack_layers(layers),
        "lnf_w": jnp.asarray(lnf_w, dtype),
        "lnf_b": None if lnf_b is None else jnp.asarray(lnf_b, dtype),
        "lm_head": None if head is None else DenseLinear(jnp.asarray(head, dtype), None),
    }
    return cfg, params
