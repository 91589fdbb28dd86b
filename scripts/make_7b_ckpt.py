"""Create a random-init Llama-2-7B-architecture HF checkpoint (fp16 safetensors).

Feeds the end-to-end artifact drive (RESULTS.md "7B end-to-end"): quantize a
genuinely-loaded HF checkpoint through the full CLI, then eval + bench the
same artifact. Saved in fp16 because the numpy-backed safetensors loader
(`pt2tpu/models/hf_loader.py`) cannot decode bf16.

Reference flow analogue: main.py:405-422 (model-size -> ppl report) operates
on a real on-disk checkpoint; this recreates that input in a zero-egress env.

Usage: python scripts/make_7b_ckpt.py --output /root/ckpt_llama7b
Needs ~28 GB host RAM transiently (fp32 init before the .half()).
"""
from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="/root/ckpt_llama7b")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--layers", type=int, default=32, help="32 = full 7B; smaller for smoke")
    args = p.parse_args()

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(args.seed)
    cfg = LlamaConfig(
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=args.layers,
        num_attention_heads=32,
        num_key_value_heads=32,
        vocab_size=32000,
        max_position_embeddings=4096,
        tie_word_embeddings=False,
    )
    with torch.no_grad():
        model = LlamaForCausalLM(cfg)
        model = model.half()
    model.save_pretrained(args.output, safe_serialization=True, max_shard_size="2GB")
    n_params = sum(t.numel() for t in model.state_dict().values())
    print(f"saved {args.output}: {n_params/1e9:.2f}B params, {args.layers} layers")


if __name__ == "__main__":
    main()
