"""Export tiny-LM params.npz to a HF LlamaForCausalLM checkpoint.

The exported directory is consumed by BOTH pipelines of the head-to-head
quality gate: pt2tpu's loader (`models/hf_loader.py`) and the torch
reference driver (ref main.py:232-311 loads via AutoModelForCausalLM,
ref model.py:228-264).  Weights are fp16 safetensors (the numpy-side
loader cannot read bf16) and the trained BPE tokenizer is bundled so the
reference's tokenizer-dependent paths work.

Ends with a logit-parity check: torch forward vs pt2tpu forward on the
same tokens must agree to fp16 tolerance.
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/root/tinylm/params.npz")
    ap.add_argument("--tokenizer", default="/root/tinylm/tokenizer")
    ap.add_argument("--out", default="/root/tinylm/ckpt")
    ap.add_argument("--heads", type=int, default=6,
                    help="n_heads of the trained config (61M model: 5)")
    args = ap.parse_args()

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    d = np.load(args.params)
    L, I, D = d["layers/gate/w"].shape
    V = d["embed"].shape[0]
    n_heads = args.heads
    cfg = LlamaConfig(
        vocab_size=V,
        hidden_size=D,
        num_hidden_layers=L,
        num_attention_heads=n_heads,
        num_key_value_heads=n_heads,
        intermediate_size=I,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    sd = {
        "model.embed_tokens.weight": d["embed"],
        "model.norm.weight": d["lnf_w"],
        "lm_head.weight": d["lm_head/w"],
    }
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = d["layers/ln1_w"][i]
        sd[p + "post_attention_layernorm.weight"] = d["layers/ln2_w"][i]
        for hf, ours in (
            ("self_attn.q_proj", "q"),
            ("self_attn.k_proj", "k"),
            ("self_attn.v_proj", "v"),
            ("self_attn.o_proj", "o"),
            ("mlp.gate_proj", "gate"),
            ("mlp.up_proj", "up"),
            ("mlp.down_proj", "down"),
        ):
            sd[p + hf + ".weight"] = d[f"layers/{ours}/w"][i]

    model = LlamaForCausalLM(cfg)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    # rotary buffers etc. may be "missing" — only parameters matter
    real_missing = [m for m in missing if "rotary" not in m and "inv_freq" not in m]
    assert not real_missing, real_missing
    model = model.half().eval()
    os.makedirs(args.out, exist_ok=True)
    model.save_pretrained(args.out, safe_serialization=True)
    for f in os.listdir(args.tokenizer):
        shutil.copy(os.path.join(args.tokenizer, f), os.path.join(args.out, f))
    print(f"saved fp16 checkpoint -> {args.out}")

    # ---- parity: torch vs pt2tpu forward on the same tokens -------------
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from pt2tpu.models import decoder as dec
    from pt2tpu.models.hf_loader import load_hf_model

    jcfg, jparams = load_hf_model(args.out, dtype=jnp.float32)
    toks = np.asarray(
        np.random.default_rng(0).integers(0, V, (2, 48)), np.int32
    )
    # parity forward in f32: the fp16 CPU forward overflows to NaN at
    # dim >= 896 (the saved checkpoint stays fp16 — only the check widens)
    model = model.float()
    with torch.no_grad():
        tlogits = model(torch.from_numpy(toks).long()).logits.float().numpy()
    jlogits = np.asarray(
        dec.forward(jcfg, jparams, jnp.asarray(toks), impl="xla"),
        np.float32,
    )
    err = np.abs(tlogits - jlogits).max()
    denom = np.abs(tlogits).max()
    print(f"logit parity: max abs diff {err:.4f} (max |logit| {denom:.2f})")
    assert err < 0.25, "torch/pt2tpu logit mismatch"
    # argmax agreement is the functional bar
    agree = (tlogits.argmax(-1) == jlogits.argmax(-1)).mean()
    print(f"argmax agreement: {agree:.3f}")


if __name__ == "__main__":
    main()
