"""HF-checkpoint parity: our functional decoder vs transformers (torch CPU).

For each supported family, build a tiny random HF model, save_pretrained it,
load through models/hf_loader, and compare full-precision logits. This pins
the whole model path — config mapping, weight layout (bloom's per-head fused
qkv, gpt2's Conv1D transpose, gemma's (1+w) norm and embed scaling, OPT's
position offset, ALiBi slopes) — to the reference runtime the original repo
rides on (ref model.py:228-264 loads via AutoModelForCausalLM).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pt2tpu.models import decoder as dec
from pt2tpu.models.hf_loader import load_hf_model

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def _save(tmp_path, model):
    d = str(tmp_path / "ckpt")
    model.save_pretrained(d, safe_serialization=True)
    return d


def _compare(tmp_path, hf_model, atol=2e-3):
    hf_model.eval()
    d = _save(tmp_path, hf_model)
    cfg, params = load_hf_model(d, dtype=jnp.float32)
    B, L = 2, 7
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (B, L))
    with torch.no_grad():
        want = hf_model(torch.tensor(toks)).logits.float().numpy()
    got = np.asarray(dec.forward(cfg, params, jnp.asarray(toks, jnp.int32),
                                 impl="xla"))
    # compare log-softmax (logits may differ by a per-position constant for
    # tied-embedding scale conventions; they shouldn't, but normalize anyway)
    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(got), lsm(want), atol=atol)


def test_llama_parity(tmp_path):
    c = transformers.LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    _compare(tmp_path, transformers.LlamaForCausalLM(c))


def test_opt_parity(tmp_path):
    c = transformers.OPTConfig(
        vocab_size=99, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32,
    )
    _compare(tmp_path, transformers.OPTForCausalLM(c))


def test_gpt2_parity(tmp_path):
    c = transformers.GPT2Config(
        vocab_size=99, n_embd=32, n_layer=2, n_head=4, n_positions=64,
    )
    _compare(tmp_path, transformers.GPT2LMHeadModel(c))


def test_bloom_parity(tmp_path):
    c = transformers.BloomConfig(
        vocab_size=99, hidden_size=32, n_layer=2, n_head=4,
    )
    _compare(tmp_path, transformers.BloomForCausalLM(c))


def test_gemma_parity(tmp_path):
    c = transformers.GemmaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, max_position_embeddings=64,
    )
    _compare(tmp_path, transformers.GemmaForCausalLM(c))


def test_qwen3_parity(tmp_path):
    # qwen3: per-head q/k RMSNorm before RoPE, explicit head_dim
    c = transformers.Qwen3Config(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, tie_word_embeddings=False,
    )
    _compare(tmp_path, transformers.Qwen3ForCausalLM(c))


def test_gemma2_parity(tmp_path):
    # gemma2: sandwich norms, alternating sliding/global attention,
    # attention + final logit softcaps, query_pre_attn_scalar
    c = transformers.Gemma2Config(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, sliding_window=4,
        query_pre_attn_scalar=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    _compare(tmp_path, transformers.Gemma2ForCausalLM(c))


def test_gemma3_parity(tmp_path):
    # gemma3: qk-norm + sandwich norms + 5:1 sliding/global pattern with a
    # distinct local RoPE base and linear scaling on the global tables
    c = transformers.Gemma3TextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, sliding_window=4,
        sliding_window_pattern=2, query_pre_attn_scalar=8,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
    )
    _compare(tmp_path, transformers.Gemma3ForCausalLM(c))


def test_llama31_rope_scaling_parity(tmp_path):
    # llama-3.1 rope warping: long wavelengths scaled by 1/factor, short
    # kept, smooth ramp between (HF rope_type "llama3")
    c = transformers.LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16,
        },
    )
    _compare(tmp_path, transformers.LlamaForCausalLM(c))


def test_mixtral_parity(tmp_path):
    """Routed MoE vs transformers MixtralForCausalLM: router top-k
    renormalized combine + expert w1/w3/w2 layout."""
    c = transformers.MixtralConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    _compare(tmp_path, transformers.MixtralForCausalLM(c))


def test_qwen3_moe_parity(tmp_path):
    """qwen3_moe: qk-norm + mlp.experts.N.{gate,up,down}_proj layout +
    norm_topk_prob flag + distinct moe_intermediate_size."""
    c = transformers.Qwen3MoeConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    _compare(tmp_path, transformers.Qwen3MoeForCausalLM(c))
