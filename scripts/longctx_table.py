"""Batched long-context serving table (VERDICT r4 item 2).

Decode slope (ms/step, tok/s) at batch x context x KV-dtype cells on the
real chip, through the production path (greedy_generate: chunked prefill
+ scan decode; int8 KV routes through the integer-domain Pallas
decode-attention kernel by default). Cells whose KV pool cannot fit HBM
alongside the 2.2 GB packed weights are reported as infeasible WITH the
arithmetic — a 7B MHA model's bf16 KV at batch 8 x 8k is 34 GB; that is
a physical wall of the model/chip pair, not a framework gap.

One process, cells timed sequentially with per-cell unique static args
(cross-process comparisons drift +-15%; within-process slope timing is
the round-3/4 methodology).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402

HBM_BUDGET = 13.5e9  # bytes usable next to runtime overheads (16 GB chip)


def kv_bytes(cfg, B, M, quant):
    per_elem = 1 if quant else 2
    base = 2 * cfg.n_layers * B * M * cfg.kv_heads * cfg.hd * per_elem
    scales = 2 * cfg.n_layers * B * M * cfg.kv_heads * 4 if quant else 0
    return base + scales


def weight_bytes(params):
    import jax.tree_util as jtu

    return sum(
        getattr(l, "nbytes", 0) for l in jtu.tree_leaves(params)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--ctxs", default="1024,4096,8192")
    ap.add_argument("--new", type=int, default=48)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "table runs on the real chip"

    from bench import _bench_call  # repo-root bench helpers
    from pt2tpu.models import get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params
    from pt2tpu.ops import ternary_matmul as _tm

    _tm.verify_fused_gather()
    _tm.verify_fused_mlp()
    _tm.verify_igather_fused()

    batches = [int(x) for x in args.batches.split(",")]
    ctxs = [int(x) for x in args.ctxs.split(",")]
    max_M = -(-(max(ctxs) + args.new) // 128) * 128

    cfg = get_config(args.model).with_(max_seq_len=max_M)
    params = random_ternary_params(
        cfg, jax.random.PRNGKey(0), perm_mode="ssr"
    )
    wb = weight_bytes(params)
    print(f"weights: {wb/1e9:.2f} GB", file=sys.stderr)

    short = max(8, args.new // 4)
    rows = []
    uniq = 0
    for B in batches:
        for ctx in ctxs:
            M = -(-(ctx + args.new) // 128) * 128
            for quant in (False, True):
                cell = {
                    "batch": B, "ctx": ctx, "M": M,
                    "kv": "int8" if quant else "bf16",
                    "kv_gb": round(kv_bytes(cfg, B, M, quant) / 1e9, 2),
                }
                need = wb + kv_bytes(cfg, B, M, quant)
                if need > HBM_BUDGET:
                    cell["status"] = (
                        f"infeasible: weights {wb/1e9:.1f} GB + KV "
                        f"{cell['kv_gb']} GB > {HBM_BUDGET/1e9:.1f} GB HBM"
                    )
                    rows.append(cell)
                    print(json.dumps(cell), flush=True)
                    continue
                prompt = jnp.ones((B, ctx), jnp.int32)
                uniq += 1

                def run(n, q=quant, M=M):
                    return lambda p: greedy_generate(
                        cfg, params, p, max_new=n, max_len=M, impl="a8",
                        kv_quant=q,
                    )

                t0 = time.time()
                try:
                    t_short = _bench_call(
                        run(short + 2 * uniq), prompt, reps=args.reps
                    )
                    t_long = _bench_call(
                        run(args.new + 2 * uniq), prompt, reps=args.reps
                    )
                except Exception as e:
                    cell["status"] = f"FAILED: {type(e).__name__}: {e}"
                    rows.append(cell)
                    print(json.dumps(cell)[:500], flush=True)
                    continue
                per_tok = (t_long - t_short) / (args.new - short)
                if per_tok <= 0:
                    per_tok = t_long / (args.new + 2 * uniq)
                cell.update(
                    status="ok",
                    ms_step=round(per_tok * 1e3, 3),
                    tok_s=round(B / per_tok, 1),
                    wall_s=round(time.time() - t0, 1),
                )
                rows.append(cell)
                print(json.dumps(cell), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
