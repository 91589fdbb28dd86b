"""Headline benchmark: ternary Llama-2-7B greedy-decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": tok/s, "unit": "tok/s", "vs_baseline": speedup}

``vs_baseline`` is the speedup over dense bf16 decode of the SAME
architecture on the same chip — the reference's effective inference mode
(its TernaryLinear dequantizes to full fp16 before every matmul,
ref model.py:75-110, so dense is a *generous* stand-in for it). If the dense
model doesn't fit in HBM, its time is extrapolated from shallower variants
(per-layer cost is linear in depth).

Methodology notes (this environment): per-dispatch latency through the
device tunnel is large and noisy, so everything measured is a single jitted
program (prefill + lax.scan over decode steps); best-of-N wall times.
"""

import argparse
import json
import os
import sys
import time

import jax

# Honor JAX_PLATFORMS even when a sitecustomize imported jax before this
# process's env var could take effect (same pattern as pt2tpu/cli.py:407).
_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except Exception:
        pass

import jax.numpy as jnp


def _bench_call(fn, *args, reps=3):
    import numpy as np

    # CRITICAL on this platform: jax.block_until_ready does NOT wait for
    # remote execution through the device tunnel — only a host fetch does.
    # Always materialize the (small) output to get true completion times.
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        best = min(best, time.time() - t0)
    return best


def bench_decode(cfg, params, prompt_len, max_new, impl, reps=3, batch=1,
                 kv_quant=False):
    """Per-token decode throughput via two-length slope timing.

    Dispatch latency through the device tunnel is large and wildly variable
    (70 us - 25 ms), so single-run timing is meaningless; timing the SAME
    program at two decode lengths and taking the slope cancels dispatch +
    prefill exactly.
    """
    from pt2tpu.serve import greedy_generate

    short = max(8, max_new // 4)
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    M = prompt_len + max_new
    M = -(-M // 128) * 128  # 128-align the cache: unaligned M measures
    # cache-padding luck, not attention (RESULTS.md round-4 post-mortem)

    def run(n):
        return lambda p: greedy_generate(
            cfg, params, p, max_new=n, max_len=M, impl=impl,
            kv_quant=kv_quant,
        )

    t_short = _bench_call(run(short), prompt, reps=reps)
    t_long = _bench_call(run(max_new), prompt, reps=reps)
    per_tok = (t_long - t_short) / (max_new - short)
    if per_tok <= 0:  # throttle noise swamped the slope; fall back
        per_tok = t_long / max_new
    return batch / per_tok


def bench_spec(cfg, params, cfg_d, params_d, prompt_len, max_new, k, impl,
               reps=3):
    """Speculative batch-1 decode tok/s (serve/speculative: one compiled
    draft+verify while_loop program)."""
    import numpy as np

    from pt2tpu.serve.speculative import speculative_generate

    prompt = jnp.zeros((1, prompt_len), jnp.int32)

    def run():
        out, stats = speculative_generate(
            cfg, params, cfg_d, params_d, prompt, max_new, k=k, impl=impl,
        )
        np.asarray(out)
        return stats

    stats = run()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        stats = run()
        best = min(best, time.time() - t0)
    return max_new / best, stats


def bench_prefill(cfg, params, seq_len, impl, reps=3, batch=1):
    """Prefill tokens/s via slope between two sequence lengths (cancels
    dispatch; prefill is one jitted forward, MXU-bound at these shapes)."""
    from pt2tpu.models import decoder as dec

    l_short = max(128, seq_len // 4)

    # params must be jit ARGUMENTS: closing over them bakes the packed
    # model in as 2.8 GB of lowered constants (measured; glacial compiles).
    # Reduce to a scalar on device: fetching (B, L, V) logits through the
    # tunnel costs ~0.5 s at L=512 and corrupts the slope.
    f = jax.jit(
        lambda p, t: jnp.sum(
            dec.forward(cfg, p, t, impl=impl).astype(jnp.float32)
        )
    )

    def run(L):
        toks = jnp.ones((batch, L), jnp.int32)
        return _bench_call(f, params, toks, reps=reps)

    t_short = run(l_short)
    t_long = run(seq_len)
    per_tok = (t_long - t_short) / (batch * (seq_len - l_short))
    if per_tok <= 0:
        per_tok = t_long / (batch * seq_len)
    return 1.0 / per_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument(
        "--mode", default="decode",
        choices=["decode", "prefill", "spec", "engine"],
        help="decode (default): batch-N greedy decode tok/s; prefill: "
        "causal forward tok/s at --prompt length; spec: speculative "
        "decoding (draft+verify, batch 1) — with --draft-layers 0 the "
        "draft IS the target (acceptance 1: the mechanism's ceiling); "
        "engine: continuous-batching ServeEngine under mixed "
        "prefill/decode load (scripts/engine_bench.py subprocess) — "
        "steady tok/s + TTFT/ITL percentiles",
    )
    ap.add_argument(
        "--draft-layers", type=int, default=0,
        help="spec mode: draft model depth (0 = use the target as its own "
        "draft — ideal acceptance)",
    )
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--layers", type=int, default=None, help="override n_layers")
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument(
        "--batch", type=int, default=1,
        help="decode batch size (weight reads amortize across rows — the "
        "continuous-batching serving operating point)",
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--perms", default="auto",
        choices=["auto", "ssr", "identity", "down"],
        help="auto (default): the layout the quantization pipeline's "
        "default ssr_scope='auto' emits for this model — 'down' (SSR only "
        "on the down projection, perm folded at pack time, zero runtime "
        "gathers) at dim >= 640 where the 61M quality gate measured the "
        "skip FREE, 'ssr' below; ssr: full-SSR post-fold layout (packed "
        "one-hot MXU gathers on qkv/o/gateup, ~0.55 ms/tok at 7B); "
        "identity: no permutations (upper bound)",
    )
    ap.add_argument(
        "--lm-head", default="bf16", choices=["bf16", "ternary"],
        help="ternary: quantized lm_head (QuantConfig.quantize_lm_head) — "
        "cuts the ~0.26 GB/token bf16 head read to ~33 MB",
    )
    ap.add_argument(
        "--a8", action="store_true",
        help="W2A8: per-row int8 activations + int8 MXU dots in the fused "
        "kernel (skips the full-volume int32->bf16 unpack cast). DEFAULT "
        "on TPU decode since round 4: the real-language quality gate "
        "passed (ppl 19.32 exact vs 19.38 a8, RESULTS.md) and a8 measures "
        "+8%% end-to-end. --exact restores the bf16-exact kernels.",
    )
    ap.add_argument(
        "--exact", action="store_true",
        help="force the exact bf16 kernel path (disable the a8 default)",
    )
    ap.add_argument(
        "--kv-quant", action="store_true",
        help="decode with the INT8 KV cache (long-context serving mode; "
        "reads stream through the integer-domain Pallas decode-attention "
        "kernel)",
    )
    ap.add_argument("--no-dense", action="store_true", help="skip dense baseline")
    ap.add_argument(
        "--time-budget", type=float, default=1500.0,
        help="skip the dense baseline if the ternary phase already consumed "
        "this many seconds (tunnel compile latency is highly variable)",
    )
    ap.add_argument(
        "--artifact", default=None,
        help="benchmark a REAL quantized artifact directory "
        "(utils/checkpoint.load_model) instead of the layout-realistic "
        "random model — the one-artifact quality+speed protocol",
    )
    ap.add_argument("--dense-probe", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.dense_probe:
        return _dense_probe_main(args)
    if args.mode == "engine":
        return _engine_mode(args)
    t_start = time.time()

    # Backend watchdog: if the device tunnel is dead, backend init HANGS
    # forever (observed after a tunnel-relay crash). Self-limit so the
    # round pipeline records an honest null row instead of hanging.
    import os as _os
    import threading as _th

    _backend_up = _th.Event()

    def _watch():
        if not _backend_up.wait(300.0):
            print(
                "device backend failed to initialize within 300 s "
                "(device tunnel down?); emitting null metric",
                file=sys.stderr,
            )
            print(json.dumps({
                "metric": "ternary llama-2-7b greedy decode tokens/s/chip "
                "(batch 1)",
                "value": None,
                "unit": "tok/s",
                "vs_baseline": None,
                "error": "device backend unavailable",
            }), flush=True)
            _os._exit(0)

    _th.Thread(target=_watch, daemon=True).start()

    from pt2tpu.models import decoder as dec
    from pt2tpu.models import get_config
    from pt2tpu.utils.randmodel import random_ternary_params

    on_tpu = jax.default_backend() == "tpu"
    _backend_up.set()  # tunnel answered; cancel the watchdog
    if not on_tpu and not args.artifact:
        # (an --artifact run keeps the artifact's own config on any backend:
        # its depth/dims supersede the model/layers defaults)
        print(
            "warning: not on TPU, benchmarking tiny config on "
            + jax.default_backend(),
            file=sys.stderr,
        )
        args.model, args.layers = "tiny-llama", 2

    if args.artifact:
        from pt2tpu.utils.checkpoint import load_model

        if args.layers:
            raise SystemExit("--layers cannot override a real artifact's depth")
        if args.perms != "auto" or args.lm_head != "bf16":
            print(
                "warning: --perms/--lm-head describe the random layout model "
                "and are ignored for a real --artifact (its packed layout is "
                "whatever quantization produced)",
                file=sys.stderr,
            )
        cfg, tparams = load_model(args.artifact)
        args.model = os.path.basename(os.path.normpath(args.artifact))
    else:
        cfg = get_config(args.model)
        if args.layers:
            cfg = cfg.with_(n_layers=args.layers)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.prompt + args.new))
    if args.perms == "auto":  # what the pipeline emits for this width
        from pt2tpu.utils.randmodel import default_perm_mode

        args.perms = default_perm_mode(cfg)
    if args.exact:
        args.a8 = False
    elif on_tpu and args.mode == "decode" and not args.a8:
        args.a8 = True  # quality-gated default serving mode (see --a8 help)
        print(
            "note: W2A8 activation-quantized kernels auto-applied (TPU "
            "decode default; +0.3% ppl on the tiny-LM gate) — pass --exact "
            "for numerically exact bf16 kernels",
            file=sys.stderr,
        )
    impl = "a8" if args.a8 else "auto"

    # On-chip self-check of the fused gather+matmul kernel (disables it
    # and falls back to the two-step path on compile failure or mismatch)
    if on_tpu:
        from pt2tpu.ops import ternary_matmul as _tm

        _tm.verify_fused_gather()
        _tm.verify_fused_mlp()
        _tm.verify_igather_fused()

    if not args.artifact:
        tparams = random_ternary_params(
            cfg,
            jax.random.PRNGKey(0),
            perm_mode=args.perms,
            ternary_lm_head=args.lm_head == "ternary",
        )
    spec_stats = None
    if args.mode == "prefill":
        tok_s = bench_prefill(
            cfg, tparams, max(args.prompt, 256), impl, args.reps, args.batch
        )
    elif args.mode == "spec":
        if args.draft_layers:
            cfg_d = cfg.with_(n_layers=args.draft_layers)
            dparams = random_ternary_params(
                cfg_d, jax.random.PRNGKey(0), perm_mode=args.perms,
                ternary_lm_head=args.lm_head == "ternary",
            )
        else:
            cfg_d, dparams = cfg, tparams  # self-draft: acceptance == 1
        tok_s, spec_stats = bench_spec(
            cfg, tparams, cfg_d, dparams, args.prompt, args.new,
            args.spec_k, impl, args.reps,
        )
        # vs_baseline for spec = speedup over this run's own plain decode
        plain = bench_decode(
            cfg, tparams, args.prompt, args.new, impl, args.reps, batch=1
        )
        args.no_dense = True
        args._spec_vs = tok_s / plain if plain else None
        dlabel = "self" if not args.draft_layers else f"{args.draft_layers}L"
        print(
            f"speculative k={args.spec_k} (draft={dlabel}): "
            f"{tok_s:.2f} tok/s vs plain {plain:.2f} "
            f"(accept {spec_stats.accepted}/{spec_stats.drafted})",
            file=sys.stderr,
        )
    else:
        tok_s = bench_decode(
            cfg, tparams, args.prompt, args.new, impl, args.reps,
            batch=args.batch, kv_quant=args.kv_quant,
        )
    layout = (
        f"artifact {args.artifact}" if args.artifact else f"{args.perms} perms"
    )
    print(
        f"ternary {cfg.n_layers}L ({layout}, {args.mode}): "
        f"{tok_s:.2f} tok/s",
        file=sys.stderr,
    )
    pct_roofline = None
    pct_mxu = None
    floor_tok_s = None
    rec_prefill = None
    if args.mode == "decode" and on_tpu:
        # _HBM_STREAM_GBS is this chip's measured rate — meaningless on CPU
        pct_roofline = _pct_of_roofline(tparams, tok_s, args.batch)
        # Structural floor (round 5): the SAME decode program with the
        # wrong-math no-unpack kernels (impl="floor8") — the ceiling any
        # unpack formulation could reach on THIS machine state. Same-
        # process slope, so the ratio is drift-immune (scripts/floor_ab.py
        # methodology; chained kernel microbenches drift 2.4x between runs
        # and overstate attainable rates).
        try:
            floor_tok_s = bench_decode(
                cfg, tparams, args.prompt, args.new, "floor8",
                max(1, args.reps - 1), batch=args.batch,
                kv_quant=args.kv_quant,
            )
        except Exception as e:
            print(f"floor probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        # Prefill row (VERDICT r4 item 6): MXU-bound causal forward at
        # L=2048 (slope vs L=512 cancels dispatch), reported alongside the
        # decode headline so every BENCH round carries a prefill MFU%.
        if args.batch == 1 and time.time() - t_start < args.time_budget:
            try:
                prefill_tok_s = bench_prefill(
                    cfg, tparams, 2048, impl, max(1, args.reps - 1), 1
                )
                rec_prefill = {
                    "tok_s": round(prefill_tok_s, 1),
                    "pct_mxu_roofline": _pct_of_mxu_roofline(
                        cfg, prefill_tok_s
                    ),
                }
                print(
                    f"prefill 512->2048 slope: {prefill_tok_s:.1f} tok/s "
                    f"({rec_prefill['pct_mxu_roofline']}% of bf16 MXU peak)",
                    file=sys.stderr,
                )
            except Exception as e:
                print(f"prefill probe failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
    elif args.mode == "prefill" and on_tpu:
        pct_mxu = _pct_of_mxu_roofline(cfg, tok_s)
        print(f"prefill MFU: {pct_mxu}% of bf16 MXU peak", file=sys.stderr)
    del tparams
    # Release the ternary model + compiled programs before the dense probes
    # (otherwise the 7B dense baseline OOMs next to retained state).
    import gc

    gc.collect()
    jax.clear_caches()
    gc.collect()

    vs = None
    if args.mode == "prefill":
        args.no_dense = True  # dense extrapolation path is decode-only
    if time.time() - t_start > args.time_budget:
        print("time budget exhausted; skipping dense baseline", file=sys.stderr)
        args.no_dense = True
    if not args.no_dense:
        try:
            base_tok_s = _dense_baseline(cfg, args)
            vs = tok_s / base_tok_s if base_tok_s else None
        except Exception as e:  # OOM etc. — report without baseline
            print(f"dense baseline failed: {type(e).__name__}: {e}", file=sys.stderr)

    what = {
        "decode": "greedy decode",
        "prefill": "prefill",
        "spec": f"speculative decode (k={args.spec_k}, "
        f"{'self-draft ceiling' if not args.draft_layers else str(args.draft_layers) + 'L draft'})",
    }[args.mode]
    if args.mode == "spec":
        vs = getattr(args, "_spec_vs", None)  # speedup vs plain decode
    rec = {
        "metric": f"ternary {args.model} {what} tokens/s/chip "
        f"(batch {args.batch})",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "kernel": "w2a8" if args.a8 else "exact-bf16",
    }
    if args.kv_quant:
        rec["kv"] = "int8"
    if pct_roofline is not None:
        rec["pct_weight_roofline"] = pct_roofline
    if floor_tok_s:
        rec["floor_tok_s"] = round(floor_tok_s, 2)
        rec["pct_of_floor"] = round(100.0 * tok_s / floor_tok_s, 1)
    if pct_mxu is not None:
        rec["pct_mxu_roofline"] = pct_mxu
    if rec_prefill is not None:
        rec["prefill"] = rec_prefill
    print(json.dumps(rec))


# Measured dense-matvec HBM stream rate on this chip (RESULTS.md kernel
# microbenchmarks): the per-token weight-read roofline divides this by the
# bytes one decode token must stream.
_HBM_STREAM_GBS = 770.0

# bf16 MXU peak of this chip (TPU v5e: 197 TFLOP/s bf16) — the prefill
# roofline denominator (prefill is compute-bound at batch*L >> 1).
_MXU_PEAK_FLOPS = 197e12


def _prefill_flops_per_tok(cfg) -> float:
    """Projection MACs*2 per token (attention score/context FLOPs excluded
    — they are O(L) per token and regime-dependent; this is the classic
    2*N_active approximation)."""
    D, I = cfg.dim, cfg.intermediate
    H, Hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    per_layer = D * H * hd + 2 * D * Hkv * hd + H * hd * D
    if cfg.is_moe:
        per_layer += (
            3 * D * cfg.expert_inter * cfg.experts_per_token
            + D * cfg.n_experts
        )
    elif cfg.gated_mlp:
        per_layer += 3 * D * I
    else:
        per_layer += 2 * D * I
    return 2.0 * (cfg.n_layers * per_layer + cfg.vocab_size * D)


def _pct_of_mxu_roofline(cfg, tok_s) -> float:
    return round(
        100.0 * tok_s * _prefill_flops_per_tok(cfg) / _MXU_PEAK_FLOPS, 1
    )


def _pct_of_roofline(tparams, tok_s, batch):
    """Self-reported %-of-roofline for decode runs (north star: >=85%).

    Roofline = every parameter byte except the token-embedding table (one
    row read per token) streamed once per step, at the measured dense HBM
    rate; batch rows amortize the stream. Attention/KV reads are excluded
    (this is a weight-read ceiling, not an attainable bound at long
    context).
    """
    import jax.tree_util as jtu

    leaves = [
        (jtu.keystr(p), leaf)
        for p, leaf in jtu.tree_flatten_with_path(tparams)[0]
    ]
    tied = not any("lm_head" in n for n, _ in leaves)
    total = 0
    for name, leaf in leaves:
        if "embed" in name and "pos" not in name and not tied:
            continue  # one-row gather, not a full-table stream
        total += getattr(leaf, "nbytes", 0)
    if not total:
        return None
    roofline = batch * _HBM_STREAM_GBS * 1e9 / total
    return round(100.0 * tok_s / roofline, 1)


def _engine_mode(args):
    """--mode engine: run the continuous-batching benchmark (VERDICT r4
    item 5) as a subprocess of scripts/engine_bench.py and re-emit its
    measurements as the standard one-line JSON record."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "engine_bench.py")
    cmd = [sys.executable, script, "--model", args.model,
           "--n", "32", "--new", str(args.new),
           "--max-batch", str(max(args.batch, 8))]
    if args.layers:
        cmd += ["--layers", str(args.layers)]
    if args.kv_quant:
        cmd.append("--kv-quant")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=2400)
    sys.stderr.write(r.stderr[-2000:])
    rec_in = None
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            rec_in = json.loads(line)
    if rec_in is None:
        raise SystemExit(
            f"engine bench subprocess failed: {r.stderr[-500:]}"
        )
    model = rec_in.get("config", {}).get("model", args.model)
    print(json.dumps({
        "metric": f"ternary {model} continuous-batching engine "
        f"steady tokens/s/chip (max_batch {max(args.batch, 8)})",
        "value": rec_in["tok_s_steady"],
        "unit": "tok/s",
        "vs_baseline": None,
        "ttft_mean_s": rec_in["ttft_mean_s"],
        "itl_p50_ms": rec_in["itl_p50_ms"],
        "itl_p99_ms": rec_in["itl_p99_ms"],
    }))


def _dense_probe(cfg, args, n_layers):
    from pt2tpu.models import decoder as dec

    c = cfg.with_(n_layers=n_layers)
    p = dec.init_params(c, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    return bench_decode(
        c, p, args.prompt, args.new, "xla", args.reps, batch=args.batch
    )


def _dense_baseline(cfg, args):
    """Dense bf16 decode tok/s, measured in a SUBPROCESS: the experimental
    device backend does not reliably release the ternary model's buffers in
    this process (two 7B probes OOMed after jax.clear_caches + gc)."""
    import json as _json
    import subprocess

    l1, l2 = 2, 6
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--model", args.model, "--prompt", str(args.prompt),
        "--new", str(args.new), "--reps", str(args.reps),
        "--batch", str(args.batch),
        "--dense-probe", f"{l1},{l2},{cfg.n_layers}",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=2400)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            rec = _json.loads(line)
            print(
                f"dense extrapolated {cfg.n_layers}L: "
                f"{rec['dense_tok_s']:.2f} tok/s (subprocess)",
                file=sys.stderr,
            )
            return rec["dense_tok_s"]
    raise RuntimeError(f"dense probe subprocess failed: {r.stderr[-500:]}")


def _dense_probe_main(args):
    """Hidden mode: measure dense decode at two depths, extrapolate, print."""
    from pt2tpu.models import get_config

    l1, l2, full = map(int, args.dense_probe.split(","))
    cfg = get_config(args.model)
    cfg = cfg.with_(max_seq_len=max(cfg.max_seq_len, args.prompt + args.new))
    t1 = _dense_probe(cfg, args, l1)
    t2 = _dense_probe(cfg, args, l2)
    s1, s2 = args.new / t1, args.new / t2  # seconds per args.new tokens
    per_layer_s = (s2 - s1) / (l2 - l1)
    s_full = s1 + per_layer_s * (full - l1)
    print(json.dumps({"dense_tok_s": args.new / s_full}))


if __name__ == "__main__":
    main()
