"""Load HuggingFace checkpoints (local safetensors / torch .bin) into the
functional param pytree.

TPU-native replacement for the reference's ``load_model_for_quantization``
(ref model.py:228-264): instead of instantiating a torch ``nn.Module`` via
``AutoModelForCausalLM`` and walking its submodules, we read raw tensors
from a local checkpoint directory and map them into the decoder pytree —
no torch runtime on the TPU path, no network (this environment is
zero-egress; point ``--model`` at a local download).

Supported families (the reference's dispatch set, ref model.py:139-159):
llama/llama2/llama3/qwen/mistral (HF LlamaForCausalLM layout), gemma v1
(incl. gemma3 multimodal checkpoints via the nested ``language_model.model``
prefix — text LM only), opt (OPTForCausalLM), bloom (BloomForCausalLM,
per-head fused qkv de-interleaved), gpt2 (GPT2LMHeadModel, Conv1D split).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
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


def _layer_globals_from_hf(hc, n_layers, mt):
    """Per-layer is-global flags from an HF config.

    Prefers the explicit ``layer_types`` list; falls back to the family
    pattern (gemma3: every ``sliding_window_pattern``-th layer global;
    gemma2: odd layers global)."""
    lt = hc.get("layer_types")
    if lt:
        return tuple(t != "sliding_attention" for t in lt)
    if mt.startswith("gemma3"):
        p = hc.get("sliding_window_pattern", 6)
        return tuple((i + 1) % p == 0 for i in range(n_layers))
    return tuple(bool(i % 2) for i in range(n_layers))  # gemma2


def config_from_hf(model_dir: str) -> ModelConfig:
    """Build a ModelConfig from a local HF config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    arch = (hc.get("architectures") or [""])[0].lower()
    mt = hc.get("model_type", get_model_type(model_dir))
    if mt == "gemma3" and "text_config" in hc:
        # gemma3 multimodal wrapper: quantize/serve the text LM only (the
        # reference does the same via language_model.layers, model.py:143-151)
        hc = {**hc["text_config"], "architectures": hc.get("architectures")}
        mt = "gemma3_text"
    if "llama" in arch or mt in (
        "llama", "mistral", "qwen2", "qwen3", "mixtral", "qwen3_moe"
    ):
        rs = hc.get("rope_scaling") or {}
        rtype = rs.get("rope_type") or rs.get("type")
        rope_scale, rope_llama3 = 1.0, None
        if rtype == "linear":
            rope_scale = float(rs.get("factor", 1.0))
        elif rtype == "llama3":
            rope_llama3 = (
                float(rs.get("factor", 8.0)),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        elif rtype not in (None, "default"):
            raise ValueError(f"unsupported rope_scaling type '{rtype}'")
        return ModelConfig(
            family=mt,
            rope_scale=rope_scale,
            rope_llama3=rope_llama3,
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
            qk_norm=(mt in ("qwen3", "qwen3_moe")),
            tie_embeddings=bool(hc.get("tie_word_embeddings", False)),
            # MoE (mixtral: num_local_experts/top-k renormalized;
            # qwen3_moe: num_experts + moe_intermediate_size + flag)
            n_experts=int(
                hc.get("num_local_experts") or hc.get("num_experts") or 0
            ),
            experts_per_token=int(hc.get("num_experts_per_tok", 2)),
            moe_inter=hc.get("moe_intermediate_size"),
            norm_topk=bool(hc.get("norm_topk_prob", True)),
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
    if "gemma" in arch or mt in ("gemma", "gemma2", "gemma3_text", "gemma3"):
        n_layers = hc["num_hidden_layers"]
        common = dict(
            vocab_size=hc["vocab_size"],
            dim=hc["hidden_size"],
            n_layers=n_layers,
            n_heads=hc["num_attention_heads"],
            n_kv_heads=hc.get("num_key_value_heads"),
            intermediate=hc["intermediate_size"],
            head_dim=hc.get("head_dim", 256),
            max_seq_len=hc.get("max_position_embeddings", 8192),
            norm="rmsnorm",
            norm_eps=hc.get("rms_norm_eps", 1e-6),
            pos="rope",
            rope_theta=hc.get("rope_theta", 10000.0),
            act="gelu",
            gated_mlp=True,
            tie_embeddings=True,
            embed_scale=float(hc["hidden_size"]) ** 0.5,
            norm_plus_one=True,
        )
        qpas = hc.get("query_pre_attn_scalar")
        if mt == "gemma2" or "gemma2" in arch:
            return ModelConfig(
                family="gemma2",
                sandwich_norm=True,
                sliding_window=hc.get("sliding_window", 4096),
                layer_globals=_layer_globals_from_hf(hc, n_layers, "gemma2"),
                attn_scale=None if qpas is None else qpas**-0.5,
                attn_softcap=hc.get("attn_logit_softcapping") or 0.0,
                final_softcap=hc.get("final_logit_softcapping") or 0.0,
                **common,
            )
        if mt in ("gemma3_text", "gemma3") or "gemma3" in arch:
            rs = hc.get("rope_scaling") or {}
            rtype = rs.get("rope_type") or rs.get("type")
            if rtype not in (None, "default", "linear"):
                raise ValueError(
                    f"unsupported gemma3 rope_scaling type '{rtype}'"
                )
            return ModelConfig(
                family="gemma3",
                qk_norm=True,
                sandwich_norm=True,
                sliding_window=hc.get("sliding_window", 1024),
                layer_globals=_layer_globals_from_hf(hc, n_layers, "gemma3"),
                rope_local_theta=hc.get("rope_local_base_freq", 10000.0),
                rope_scale=float(rs.get("factor", 1.0)),
                attn_scale=None if qpas is None else qpas**-0.5,
                **common,
            )
        return ModelConfig(family="gemma", **common)
    if "bloom" in arch or mt == "bloom":
        D = hc["hidden_size"]
        return ModelConfig(
            family="bloom",
            vocab_size=hc["vocab_size"],
            dim=D,
            n_layers=hc.get("num_hidden_layers", hc.get("n_layer")),
            n_heads=hc.get("num_attention_heads", hc.get("n_head")),
            intermediate=4 * D,
            max_seq_len=hc.get("seq_length", 2048),
            norm="layernorm",
            norm_eps=hc.get("layer_norm_epsilon", 1e-5),
            pos="alibi",
            act="gelu",
            gated_mlp=False,
            linear_bias=True,
            tie_embeddings=True,
            embed_norm=True,
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


def _bloom_layers(cfg, t, dtype):
    """Bloom: fused query_key_value is per-head [q_h|k_h|v_h] interleaved —
    de-interleave into our separate q/k/v (ref model.py:156-157 walks
    ``transformer.h``; the de-interleave is new here because we run the
    model ourselves instead of through HF)."""
    H, hd, D = cfg.n_heads, cfg.hd, cfg.dim
    layers = []
    pre = "transformer." if "transformer.h.0.input_layernorm.weight" in t else ""
    for i in range(cfg.n_layers):
        p = f"{pre}h.{i}."
        qkv_w = np.asarray(t[p + "self_attention.query_key_value.weight"], np.float32)
        qkv_b = np.asarray(t[p + "self_attention.query_key_value.bias"], np.float32)
        w3 = qkv_w.reshape(H, 3, hd, D)
        b3 = qkv_b.reshape(H, 3, hd)
        lay = {
            "ln1_w": jnp.asarray(t[p + "input_layernorm.weight"], dtype),
            "ln1_b": jnp.asarray(t[p + "input_layernorm.bias"], dtype),
            "ln2_w": jnp.asarray(t[p + "post_attention_layernorm.weight"], dtype),
            "ln2_b": jnp.asarray(t[p + "post_attention_layernorm.bias"], dtype),
            "gate": None,
            "q": DenseLinear(
                jnp.asarray(w3[:, 0].reshape(H * hd, D), dtype),
                jnp.asarray(b3[:, 0].reshape(H * hd), dtype),
            ),
            "k": DenseLinear(
                jnp.asarray(w3[:, 1].reshape(H * hd, D), dtype),
                jnp.asarray(b3[:, 1].reshape(H * hd), dtype),
            ),
            "v": DenseLinear(
                jnp.asarray(w3[:, 2].reshape(H * hd, D), dtype),
                jnp.asarray(b3[:, 2].reshape(H * hd), dtype),
            ),
            "o": _lin(t, p + "self_attention.dense.weight",
                      p + "self_attention.dense.bias", dtype),
            "up": _lin(t, p + "mlp.dense_h_to_4h.weight",
                       p + "mlp.dense_h_to_4h.bias", dtype),
            "down": _lin(t, p + "mlp.dense_4h_to_h.weight",
                         p + "mlp.dense_4h_to_h.bias", dtype),
        }
        layers.append(lay)
    return layers


def _llama_layers(cfg, t, dtype, prefix="model."):
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        lay = {
            "ln1_w": jnp.asarray(t[p + "input_layernorm.weight"], dtype),
            "ln1_b": None,
            "ln2_b": None,
        }
        if cfg.sandwich_norm:
            # gemma2/3: post_attention_layernorm normalizes the attention
            # OUTPUT (pre-residual); the MLP pre-norm is a separate tensor.
            lay["ln2_w"] = jnp.asarray(
                t[p + "pre_feedforward_layernorm.weight"], dtype
            )
            lay["post_attn_w"] = jnp.asarray(
                t[p + "post_attention_layernorm.weight"], dtype
            )
            lay["post_mlp_w"] = jnp.asarray(
                t[p + "post_feedforward_layernorm.weight"], dtype
            )
        else:
            lay["ln2_w"] = jnp.asarray(
                t[p + "post_attention_layernorm.weight"], dtype
            )
        if cfg.qk_norm:
            lay["q_norm_w"] = jnp.asarray(
                t[p + "self_attn.q_norm.weight"], dtype
            )
            lay["k_norm_w"] = jnp.asarray(
                t[p + "self_attn.k_norm.weight"], dtype
            )
        for ours, theirs in (
            ("q", "self_attn.q_proj"),
            ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"),
            ("o", "self_attn.o_proj"),
        ):
            lay[ours] = _lin(
                t, p + theirs + ".weight", p + theirs + ".bias", dtype
            )
        if cfg.is_moe:
            # mixtral: block_sparse_moe.gate + experts.N.{w1,w3,w2};
            # qwen3_moe: mlp.gate + mlp.experts.N.{gate,up,down}_proj
            if p + "block_sparse_moe.gate.weight" in t:
                rkey = p + "block_sparse_moe.gate.weight"
                ekeys = [
                    (p + f"block_sparse_moe.experts.{e}.w1.weight",
                     p + f"block_sparse_moe.experts.{e}.w3.weight",
                     p + f"block_sparse_moe.experts.{e}.w2.weight")
                    for e in range(cfg.n_experts)
                ]
            else:
                rkey = p + "mlp.gate.weight"
                ekeys = [
                    (p + f"mlp.experts.{e}.gate_proj.weight",
                     p + f"mlp.experts.{e}.up_proj.weight",
                     p + f"mlp.experts.{e}.down_proj.weight")
                    for e in range(cfg.n_experts)
                ]
            lay["router"] = DenseLinear(
                w=jnp.asarray(np.asarray(t[rkey], np.float32), dtype)
            )
            for name, j in (("gate", 0), ("up", 1), ("down", 2)):
                lay[name] = DenseLinear(
                    w=jnp.stack([
                        jnp.asarray(np.asarray(t[k[j]], np.float32), dtype)
                        for k in ekeys
                    ])
                )
        else:
            for ours, theirs in (
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
    model_dir: str, dtype=jnp.bfloat16, host: bool = False
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """(ModelConfig, params) from a local HF checkpoint directory.

    ``host=True`` builds every parameter on the CPU device instead of the
    default accelerator — for models near/over single-chip HBM (e.g. a
    bf16 7B on a 16 GB chip), quant.pipeline then STREAMS one layer at a
    time to the device (quantize_model auto-detects host residency).
    """
    if host:
        with jax.default_device(jax.devices("cpu")[0]):
            return _load_hf_model(model_dir, dtype)
    return _load_hf_model(model_dir, dtype)


def _load_hf_model(
    model_dir: str, dtype=jnp.bfloat16
) -> Tuple[ModelConfig, Dict[str, Any]]:
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
    elif fam == "bloom":
        layers = _bloom_layers(cfg, t, dtype)
        pre = (
            "transformer."
            if "transformer.word_embeddings.weight" in t
            else ""
        )
        embed = t[pre + "word_embeddings.weight"]
        pos = None
        lnf_w = t[pre + "ln_f.weight"]
        lnf_b = t[pre + "ln_f.bias"]
        head = None
        emb_ln = (
            t[pre + "word_embeddings_layernorm.weight"],
            t[pre + "word_embeddings_layernorm.bias"],
        )
    else:  # llama/gemma families (gemma3 multimodal nests the LM)
        prefix = (
            "language_model.model."
            if "language_model.model.embed_tokens.weight" in t
            else "model."
        )
        layers = _llama_layers(cfg, t, dtype, prefix)
        embed = t[prefix + "embed_tokens.weight"]
        pos = None
        lnf_w = t[prefix + "norm.weight"]
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
    if fam == "bloom":
        params["emb_ln_w"] = jnp.asarray(emb_ln[0], dtype)
        params["emb_ln_b"] = jnp.asarray(emb_ln[1], dtype)
    return cfg, params
