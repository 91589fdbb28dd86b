"""Run the torch REFERENCE pipeline (PT2-LLM) on the tiny-LM checkpoint.

VERDICT r3 item 2: engine-level parity (tests/test_reference_parity.py)
never proved the end-to-end claim — this drives the reference's actual
model loop (ref main.py:232-311: hook-captured activations ->
quantize_layer -> fake-quant weight overwrite) on the SAME checkpoint and
the SAME calibration windows as our CLI run, then evaluates with the
reference's perplexity protocol (ref utils.py:128-186: non-overlapping
seq_len windows, -100 masking, ppl = exp(sum nll / tokens)) on the SAME
held-out token stream.  Output: fp ppl, reference-ternary ppl — to sit
next to pt2tpu's fp/ternary/a8 numbers.

Differences from the stock reference run (all forced by this offline
environment, none touching the math):
  - weights run fp32 on CPU (the reference's fp16 path assumes CUDA;
    fp32 only *reduces* its quantization error),
  - calibration windows are injected (ref get_calibration_data downloads
    WikiText-2; we pass identical windows to both pipelines),
  - eval text is the local held-out stream, not WikiText-2 test.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")


def ref_eval_ppl(model, token_stream: np.ndarray, seq_len: int) -> float:
    """Reference eval protocol (ref utils.py:162-186) on a given stream."""
    input_ids = torch.from_numpy(token_stream.astype(np.int64))[None]
    nlls = []
    prev_end_loc = 0
    seq_len = min(seq_len, input_ids.size(1))
    with torch.no_grad():
        for begin_loc in range(0, input_ids.size(1), seq_len):
            end_loc = min(begin_loc + seq_len, input_ids.size(1))
            trg_len = end_loc - prev_end_loc
            input_chunk = input_ids[:, begin_loc:end_loc]
            target_ids = input_chunk.clone()
            target_ids[:, :-trg_len] = -100
            out = model(input_chunk, labels=target_ids)
            nlls.append(out.loss * trg_len)
            prev_end_loc = end_loc
            if end_loc >= input_ids.size(1):
                break
    return float(torch.exp(torch.stack(nlls).sum() / prev_end_loc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/tinylm/ckpt")
    ap.add_argument("--data", default="/root/tinylm")
    ap.add_argument("--num-samples", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--eval-tokens", type=int, default=51200)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-ssr", action="store_true")
    ap.add_argument(
        "--engine", choices=["main", "gptq"], default="main",
        help="main: the CLI's driver loop (ref main.py:232-311 — its SSR "
        "path has the §2.4-1 layout quirk and NaNs); gptq: the standalone "
        "class (ref gptq.py:21-230 — consistent visit-order layout, AGA "
        "from the Hessian submatrix surrogate, ref gptq.py:147-150)",
    )
    ap.add_argument("--out", default="/root/tinylm/ref_results.json")
    args = ap.parse_args()

    from transformers import AutoModelForCausalLM

    from pt2tpu.data.calibration import sample_calibration_windows

    train_toks = np.load(os.path.join(args.data, "train_tokens.npy"))
    held = np.load(os.path.join(args.data, "heldout_tokens.npy"))
    held = held[: args.eval_tokens]
    windows = sample_calibration_windows(
        train_toks, args.num_samples, args.seq_len, args.seed
    )

    def load():
        m = AutoModelForCausalLM.from_pretrained(
            args.ckpt, torch_dtype=torch.float32
        )
        return m.eval()

    t0 = time.time()
    model = load()
    fp_ppl = ref_eval_ppl(model, held, args.seq_len)
    print(f"[{time.time()-t0:.1f}s] reference-protocol fp ppl: {fp_ppl:.4f}")

    # ---- reference quantization loop on the same model ------------------
    samples = [torch.from_numpy(w[None].astype(np.int64)) for w in windows]
    t0 = time.time()
    if args.engine == "main":
        from main import PT2LLMQuantizer  # /root/reference/main.py

        q = PT2LLMQuantizer(
            model=model,
            tokenizer=None,
            model_type="llama",
            block_size=128,
            num_calibration_samples=args.num_samples,
            seq_len=args.seq_len,
            use_ssr=not args.no_ssr,
            percdamp=0.01,
            seed=args.seed,
            device="cpu",
        )
        # inject the identical calibration windows (the stock loader
        # downloads WikiText-2, ref main.py:90-100 -> utils.py:24-75)
        q.get_calibration_data = lambda: samples
        q.quantize()
        n_proj = len(q.quantized_params)
    else:
        # Standalone-class loop: same hook-captured activations and
        # sequential fake-quant overwrite as ref main.py:257-299, but the
        # per-layer engine is ref gptq.py's GPTQ (consistent layout).
        from gptq import GPTQ  # /root/reference/gptq.py
        from model import find_linear_layers, get_llm_layers

        layers = get_llm_layers(model, "llama")
        n_proj = 0
        for layer in layers:
            acts = {}
            hooks = []
            lins = find_linear_layers(layer)
            for name, lin in lins.items():
                def mk(nm):
                    def hook(module, inp, out):
                        x = inp[0] if isinstance(inp, tuple) else inp
                        acts.setdefault(nm, []).append(x.detach())
                    return hook
                hooks.append(lin.register_forward_hook(mk(name)))
            with torch.no_grad():
                for s in samples:
                    model(s)
            for h in hooks:
                h.remove()
            for name, lin in lins.items():
                g = GPTQ(lin, block_size=128, percdamp=0.01)
                g.add_batch(torch.cat(acts[name], dim=0))
                g.quantize(use_ssr=not args.no_ssr)
                lin.weight.data = g.get_quantized_weight().to(
                    lin.weight.dtype
                )
                n_proj += 1
    quant_s = time.time() - t0
    print(f"reference quantization [{args.engine}]: {quant_s:.1f}s "
          f"({n_proj} projections)")

    ref_ppl = ref_eval_ppl(model, held, args.seq_len)
    print(f"reference-ternary ppl: {ref_ppl:.4f} "
          f"(delta {ref_ppl - fp_ppl:+.4f}, ratio {ref_ppl / fp_ppl:.4f})")

    rec = {
        "engine": args.engine,
        "fp_ppl": fp_ppl,
        "ref_ternary_ppl": ref_ppl,
        "ratio": ref_ppl / fp_ppl,
        "num_samples": args.num_samples,
        "seq_len": args.seq_len,
        "eval_tokens": int(len(held)),
        "use_ssr": not args.no_ssr,
        "quant_seconds": quant_s,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
