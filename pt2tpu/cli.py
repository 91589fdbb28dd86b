"""Command-line interface: quantize / eval / generate / info.

Mirrors the reference CLI contract (ref main.py:338-433 — flags --model
--output --block_size --num_samples --seq_len --no_ssr --percdamp --eval
--eval_dataset --seed) as subcommands of ``python -m pt2tpu.cli``:

  quantize  — load model (local HF dir, or a registry config with random
              init), calibrate + ternarize, save a packed artifact, report
              size/bits, optionally evaluate perplexity. Resumable via the
              per-layer journal in the output directory.
  eval      — perplexity of an artifact (or dense model) on a token stream.
  generate  — greedy decode from a prompt (token ids, or text when a local
              tokenizer is available).
  info      — inspect an artifact's manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _resolve_model(name_or_path: str, dtype, seed: int = 0):
    """Local HF dir -> real weights; registry name -> random init."""
    from .models import decoder as dec
    from .models import get_config

    if os.path.isdir(name_or_path):
        from .models.hf_loader import load_hf_model

        # Checkpoints near/over single-chip HBM load host-resident; the
        # quantization pipeline then streams one layer at a time to the
        # device (quant/pipeline.py 'stream' path).
        ckpt_bytes = sum(
            os.path.getsize(os.path.join(name_or_path, f))
            for f in os.listdir(name_or_path)
            if f.endswith((".safetensors", ".bin"))
        )
        host = ckpt_bytes > 4 << 30 and jax.default_backend() != "cpu"
        return load_hf_model(name_or_path, dtype=dtype, host=host) + ("hf",)
    cfg = get_config(name_or_path)
    params = dec.init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    return cfg, params, "random-init"


def _load_tokenizer(path_or_none):
    if not path_or_none:
        return None
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path_or_none, local_files_only=True)
    except Exception as e:
        print(f"tokenizer unavailable ({e}); token-id IO only", file=sys.stderr)
        return None


def cmd_quantize(args):
    from .data import get_calibration_data
    from .quant import QuantConfig, quantize_model
    from .utils.checkpoint import save_model
    from .utils.metrics import MetricsLogger, model_bits_per_weight

    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    cfg, params, provenance = _resolve_model(args.model, dtype, args.seed)
    print(f"model: {args.model} [{provenance}] {cfg.n_layers}L dim={cfg.dim}")

    tok = _load_tokenizer(args.tokenizer or (args.model if provenance == "hf" else None))
    calib, calib_prov = get_calibration_data(
        args.calib,
        cfg.vocab_size,
        num_samples=args.num_samples,
        seq_len=min(args.seq_len, cfg.max_seq_len),
        seed=args.seed,
        tokenizer=tok,
    )
    print(f"calibration: {calib_prov} {calib.shape}")

    qcfg = QuantConfig(
        block_size=args.block_size,
        percdamp=args.percdamp,
        use_ssr=not args.no_ssr,
        use_aga=args.aga != "off",
        aga_mode=args.aga if args.aga != "off" else "exact",
        batch_size=args.batch_size,
        fuse_projections=not args.no_fuse,
        fold_perms=not args.no_fold,
        ssr_skip=tuple(s for s in args.ssr_skip.split(",") if s),
        ssr_scope=args.ssr_scope,
        quantize_lm_head=args.quantize_lm_head,
    )
    log = MetricsLogger(
        os.path.join(args.output, "quantize_metrics.jsonl"), verbose=True
    )
    t0 = time.time()
    qparams, report = quantize_model(
        cfg, params, jnp.asarray(calib), qcfg, log=log, journal_dir=args.output
    )
    elapsed = time.time() - t0
    bpw = model_bits_per_weight(qparams)
    print(f"quantized in {elapsed:.1f}s; bits/weight {bpw:.3f}")

    report["provenance"] = {"model": provenance, "calibration": calib_prov}
    report["elapsed_s"] = elapsed
    save_model(args.output, cfg, qparams, quant_config=qcfg, report=report)
    print(f"artifact saved to {args.output}")

    if args.eval:
        _eval_params(cfg, qparams, args, tok)


def _eval_params(cfg, params, args, tok):
    from .data import evaluate_perplexity, get_token_stream

    stream, prov = get_token_stream(
        args.eval_dataset, cfg.vocab_size, split="test", tokenizer=tok,
        seed=args.seed,
    )
    impl = "a8" if getattr(args, "a8", False) else "auto"
    res = evaluate_perplexity(
        cfg,
        params,
        stream,
        seq_len=min(args.seq_len, cfg.max_seq_len),
        max_windows=args.max_windows,
        impl=impl,
    )
    tag = " (a8)" if impl == "a8" else ""
    print(
        f"perplexity{tag} [{prov}]: {res['ppl']:.4f} over "
        f"{res['tokens']} tokens"
    )
    return res


def cmd_eval(args):
    from .utils.checkpoint import load_model

    if os.path.exists(os.path.join(args.model, "manifest.json")):
        cfg, params = load_model(args.model)
        tok = _load_tokenizer(args.tokenizer)
    else:
        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        cfg, params, _ = _resolve_model(args.model, dtype, args.seed)
        tok = _load_tokenizer(args.tokenizer)
    _eval_params(cfg, params, args, tok)


def _maybe_shard(params, tp: int):
    if tp <= 1:
        return params
    from .parallel import make_mesh, shard_params

    n = len(jax.devices())
    if n % tp != 0:
        raise SystemExit(f"--tp {tp} does not divide {n} devices")
    mesh = make_mesh({"data": n // tp, "model": tp})
    print(f"sharding over mesh {dict(mesh.shape)}", file=sys.stderr)
    return shard_params(params, mesh)


def cmd_generate(args):
    from .utils.checkpoint import load_model

    if os.path.exists(os.path.join(args.model, "manifest.json")):
        cfg, params = load_model(args.model)
    else:
        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        cfg, params, _ = _resolve_model(args.model, dtype, args.seed)
    params = _maybe_shard(params, args.tp)

    tok = _load_tokenizer(args.tokenizer)
    if args.prompt_ids:
        ids = [int(x) for x in args.prompt_ids.split(",")]
    elif args.prompt and tok:
        ids = tok(args.prompt)["input_ids"]
    else:
        raise SystemExit("need --prompt-ids, or --prompt with a local tokenizer")
    prompt = jnp.asarray(np.asarray(ids, np.int32)[None, :])

    from .serve import SamplingConfig, generate

    if args.draft:
        if args.temperature > 0:
            raise SystemExit("--draft (speculative) is greedy-only")
        from .serve.speculative import speculative_generate
        from .utils.checkpoint import load_model

        if os.path.exists(os.path.join(args.draft, "manifest.json")):
            cfg_d, params_d = load_model(args.draft)
        else:
            dtype = (
                jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
            )
            cfg_d, params_d, _ = _resolve_model(args.draft, dtype, args.seed)
        out, stats = speculative_generate(
            cfg, params, cfg_d, params_d, prompt,
            max_new=args.max_new, k=args.spec_k,
            impl="a8" if args.a8 else "auto", kv_quant=args.kv_int8,
        )
        print(f"speculative: {stats}", file=sys.stderr)
        ids_out = np.asarray(out)[0].tolist()
        if tok:
            print(tok.decode(ids_out))
        else:
            print(",".join(map(str, ids_out)))
        return

    if args.ring_kv:
        if args.temperature > 0:
            raise SystemExit("--ring-kv is greedy-only for now")
        if args.kv_int8:
            raise SystemExit(
                "--ring-kv caches are bf16; combine with --kv-int8 is not "
                "supported (drop one of the flags)"
            )
        from .serve.ring import ring_generate

        out = ring_generate(
            cfg, params, prompt, max_new=args.max_new,
            max_len=min(cfg.max_seq_len, prompt.shape[1] + args.max_new),
            impl="a8" if args.a8 else "auto",
        )
        ids_out = np.asarray(out)[0].tolist()
        print(tok.decode(ids_out) if tok else ",".join(map(str, ids_out)))
        return

    scfg = SamplingConfig(
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p
    )
    out = generate(
        cfg,
        params,
        prompt,
        max_new=args.max_new,
        max_len=min(cfg.max_seq_len, prompt.shape[1] + args.max_new),
        impl="a8" if args.a8 else "auto",
        kv_quant=args.kv_int8,
        sampling=scfg,
        key=jax.random.PRNGKey(args.seed),
    )
    ids_out = np.asarray(out)[0].tolist()
    if tok:
        print(tok.decode(ids_out))
    else:
        print(",".join(map(str, ids_out)))


def cmd_serve(args):
    from .serve.server import ServingServer
    from .utils.checkpoint import load_model

    if os.path.exists(os.path.join(args.model, "manifest.json")):
        cfg, params = load_model(args.model)
    else:
        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        cfg, params, _ = _resolve_model(args.model, dtype, args.seed)
    params = _maybe_shard(params, args.tp)
    engine = None
    if getattr(args, "paged", False):
        from .serve.paged import PagedServeEngine

        engine = PagedServeEngine(
            cfg, params, max_batch=args.max_batch, max_len=args.max_len,
            page_size=args.page_size, kv_pages=args.kv_pages,
            kv_quant=args.kv_int8, decode_quantum=args.quantum,
        )
    elif getattr(args, "draft", None):
        from .serve.engine import ServeEngine

        if os.path.exists(os.path.join(args.draft, "manifest.json")):
            cfg_d, params_d = load_model(args.draft)
        else:
            dtype = (
                jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
            )
            cfg_d, params_d, _ = _resolve_model(args.draft, dtype, args.seed)
        engine = ServeEngine(
            cfg, params, max_batch=args.max_batch, max_len=args.max_len,
            draft=(cfg_d, params_d), spec_k=args.spec_k,
        )
    srv = ServingServer(
        cfg, params, host=args.host, port=args.port,
        max_batch=args.max_batch, max_len=args.max_len, kv_quant=args.kv_int8,
        engine=engine, decode_quantum=args.quantum,
    ).start()
    print(f"serving on http://{args.host}:{srv.port} "
          f"(POST /generate, GET /health); ctrl-c to stop")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        srv.stop()


def cmd_info(args):
    with open(os.path.join(args.model, "manifest.json")) as f:
        manifest = json.load(f)
    manifest.pop("structure", None)
    print(json.dumps(manifest, indent=2))


def build_parser():
    ap = argparse.ArgumentParser(
        prog="pt2tpu", description="TPU-native ternary post-training quantization"
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize", help="ternarize a model")
    q.add_argument("--model", required=True, help="local HF dir or config name")
    q.add_argument("--output", default="./quantized_model")
    q.add_argument("--block_size", type=int, default=128)
    q.add_argument("--num_samples", type=int, default=128)
    q.add_argument("--seq_len", type=int, default=2048)
    q.add_argument("--no_ssr", action="store_true")
    q.add_argument("--no_fold", action="store_true",
                   help="keep runtime index gathers instead of folding SSR "
                   "perms into the packed layout (quant/fold.py)")
    q.add_argument("--ssr_skip", default="",
                   help="comma-separated quant groups to quantize without "
                   "SSR (e.g. 'o' -> one fewer gather per layer)")
    q.add_argument("--ssr_scope", default="auto",
                   choices=["auto", "all", "down"],
                   help="which groups SSR covers: all (reference recipe), "
                   "down (gather-free serving layout — SSR only where its "
                   "perm folds for free), auto (default: all below dim "
                   "640, down at/above — the 61M gate measured the skip "
                   "quality-FREE there; RESULTS round 5)")
    q.add_argument("--quantize_lm_head", action="store_true",
                   help="also ternarize the lm_head (cuts ~vocab*dim*1.75 "
                   "bytes/token of decode HBM traffic; costs perplexity)")
    q.add_argument("--percdamp", type=float, default=0.01)
    q.add_argument("--aga", choices=["exact", "reference", "off"], default="exact")
    q.add_argument("--no_fuse", action="store_true",
                   help="quantize q/k/v and gate/up separately (reference layout)")
    q.add_argument("--calib", default="wikitext", help="wikitext|c4|ptb|synthetic|<file>")
    q.add_argument("--batch_size", type=int, default=8)
    q.add_argument("--eval", action="store_true")
    q.add_argument("--eval_dataset", default="wikitext")
    q.add_argument("--max_windows", type=int, default=None)
    q.add_argument("--seed", type=int, default=42)
    q.add_argument("--tokenizer", default=None)
    q.set_defaults(fn=cmd_quantize)

    e = sub.add_parser("eval", help="perplexity of an artifact or model")
    e.add_argument("--model", required=True)
    e.add_argument("--eval_dataset", default="wikitext")
    e.add_argument("--seq_len", type=int, default=2048)
    e.add_argument("--max_windows", type=int, default=None)
    e.add_argument("--seed", type=int, default=42)
    e.add_argument("--tokenizer", default=None)
    e.add_argument("--a8", action="store_true",
                   help="evaluate through the W2A8 kernel path (quality "
                   "gate for bench --a8)")
    e.set_defaults(fn=cmd_eval)

    g = sub.add_parser("generate", help="greedy decode")
    g.add_argument("--model", required=True)
    g.add_argument("--prompt", default=None)
    g.add_argument("--prompt-ids", default=None)
    g.add_argument("--max-new", type=int, default=64)
    g.add_argument("--kv-int8", action="store_true")
    g.add_argument("--ring-kv", action="store_true",
                   help="window-sized ring KV caches on sliding layers "
                        "(gemma2/3; greedy only, exact)")
    g.add_argument("--a8", action="store_true",
                   help="W2A8: int8 activations in the fused TPU kernels")
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top_k", type=int, default=0)
    g.add_argument("--top_p", type=float, default=1.0)
    g.add_argument("--tp", type=int, default=1, help="tensor-parallel ways")
    g.add_argument("--draft", default=None,
                   help="draft model/artifact for speculative decoding "
                        "(greedy only; exact vs plain greedy)")
    g.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per speculative round")
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--tokenizer", default=None)
    g.set_defaults(fn=cmd_generate)

    sv = sub.add_parser("serve", help="HTTP serving front-end")
    sv.add_argument("--model", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8471)
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--max-len", type=int, default=2048)
    sv.add_argument("--kv-int8", action="store_true")
    sv.add_argument("--tp", type=int, default=1)
    sv.add_argument("--seed", type=int, default=42)
    sv.add_argument("--paged", action="store_true",
                    help="pooled paged KV cache (serve/paged.py)")
    sv.add_argument("--page-size", type=int, default=64)
    sv.add_argument("--kv-pages", type=int, default=None,
                    help="total pages in the pool (default: dense-equivalent)")
    sv.add_argument("--draft", default=None,
                    help="draft model artifact/config: per-row speculative "
                    "decoding inside the batcher (greedy requests only)")
    sv.add_argument("--spec-k", type=int, default=4)
    sv.add_argument("--quantum", type=int, default=1,
                    help="decode steps batched per host dispatch "
                    "(multi-step scheduling; token-identical — trades "
                    "admission latency for dispatch amortization)")
    sv.set_defaults(fn=cmd_serve)

    i = sub.add_parser("info", help="inspect an artifact")
    i.add_argument("--model", required=True)
    i.set_defaults(fn=cmd_info)
    return ap


def main(argv=None):
    # Honor JAX_PLATFORMS even when a sitecustomize imported jax before this
    # process saw the env var (observed on the TPU-tunnel image: the env var
    # alone is silently ignored and CLI subprocesses land on the TPU).
    want = os.environ.get("JAX_PLATFORMS")
    if want:  # don't probe default_backend(): that would initialize it
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized: keep it
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
