"""Tokens/s scaling sweep across mesh shapes (BASELINE north star: report
scaling efficiency at 1 chip / 1 host / N hosts).

On real multi-chip hardware this measures true scaling; on a single chip or
the virtual CPU mesh it still validates that every mesh shape compiles and
produces identical tokens (functional scaling). Results print as JSONL.

    python scripts/scaling_sweep.py --model llama-2-7b --layers 4 \
        --meshes 1x1,1x4,2x4
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny-llama")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--meshes", default="1x1", help="comma list of DATAxMODEL")
    ap.add_argument("--prompt", type=int, default=16)
    ap.add_argument("--new", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--platform", default=None,
        help="force 'cpu' for virtual-mesh runs (env vars are too late: "
        "this environment's sitecustomize imports jax first)",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pt2tpu.models import get_config
    from pt2tpu.parallel import batch_sharding, make_mesh, shard_params
    from pt2tpu.serve import generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config(args.model)
    if args.layers:
        cfg = cfg.with_(n_layers=args.layers)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.prompt + args.new))
    small = cfg.dim < 512
    params = random_ternary_params(
        cfg,
        jax.random.PRNGKey(0),
        dtype=jnp.float32 if small else jnp.bfloat16,
        block_size=32 if small else 128,
        scale_dtype=jnp.float32 if small else jnp.bfloat16,
    )
    impl = "auto" if jax.default_backend() == "tpu" else "xla"

    base_tokens = None
    for spec in args.meshes.split(","):
        d, m = map(int, spec.split("x"))
        if d * m > len(jax.devices()):
            print(json.dumps({"mesh": spec, "skipped": "not enough devices"}))
            continue
        mesh = make_mesh({"data": d, "model": m}, jax.devices()[: d * m])
        sp = shard_params(params, mesh)
        B = max(args.batch, d)
        prompt = jax.device_put(
            jnp.ones((B, args.prompt), jnp.int32), batch_sharding(mesh)
        )

        def run():
            return generate(
                cfg, sp, prompt, max_new=args.new,
                max_len=args.prompt + args.new, impl=impl,
            )

        out = np.asarray(run())
        if base_tokens is None:
            base_tokens = out[0].tolist()
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(run())
            best = min(best, time.time() - t0)
        tok_s = B * args.new / best
        print(
            json.dumps(
                {
                    "mesh": spec,
                    "devices": d * m,
                    "batch": B,
                    "tok_s_total": round(tok_s, 2),
                    "tokens_match_1chip": out[0].tolist() == base_tokens,
                }
            )
        )


if __name__ == "__main__":
    main()
