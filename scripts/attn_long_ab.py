"""Long-context int8-KV attention A/B: bf16 vs int8 x score layouts.

Same-process interleaved slope timing of the full decode program at the
long-context serving cells, flipping pallas_attention.QUANT_SCORE_LAYOUT
between compiles (trace-time flag; per-combo unique max_new statics give
distinct jit entries). The round-5 question: does the transposed (H, bm)
score layout make int8 KV beat bf16 where HBM halving must dominate?
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cells", default="1:4096,1:8192,8:1024,8:4096")
    ap.add_argument("--new", type=int, default=48)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from pt2tpu.models import get_config
    from pt2tpu.ops import ternary_matmul as _tm
    from pt2tpu.ops.kernels import pallas_attention as pa
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    _tm.verify_fused_gather()
    _tm.verify_fused_mlp()
    _tm.verify_igather_fused()

    cells = [tuple(map(int, c.split(":"))) for c in args.cells.split(",")]
    max_M = max(-(-(c + args.new) // 128) * 128 for _, c in cells)
    cfg = get_config("llama-2-7b").with_(max_seq_len=max_M)
    params = random_ternary_params(cfg, jax.random.PRNGKey(0),
                                   perm_mode="ssr")

    HBM = 13.5e9
    wb = 2.9e9

    def kv_gb(B, M, quant):
        per = 1 if quant else 2
        return (2 * 32 * B * M * 32 * 128 * per
                + (2 * 32 * B * M * 32 * 4 if quant else 0))

    from pt2tpu.models import common

    # (name, kv_quant, pallas-kernel?, integer-domain-XLA?)
    combos = [
        ("bf16    ", False, False, False),
        ("int8-cvt", True, False, False),  # XLA convert-based (round 4)
        ("int8-int", True, False, True),   # XLA integer-domain (round 5)
        ("int8-knl", True, True, False),   # pallas hb kernel
    ]
    short = max(8, args.new // 4)
    progs, lens = {}, {}
    uniq = 0
    for B, ctx in cells:
        M = -(-(ctx + args.new + 8) // 128) * 128
        for name, kvq, kern, intd in combos:
            if wb + kv_gb(B, M, kvq) > HBM:
                print(f"B{B} ctx{ctx} {name}: infeasible", flush=True)
                continue
            pa.QUANT_SCORE_LAYOUT = "hb"
            common.INT8_DECODE_ATTN_KERNEL = kern
            common.INT8_INTEGER_DOMAIN = intd
            prompt = jnp.ones((B, ctx), jnp.int32)
            for li, n0 in enumerate((short, args.new)):
                uniq += 1
                n = n0 + 2 * uniq
                f = (lambda p, n=n, kvq=kvq, M=M: greedy_generate(
                    cfg, params, p, max_new=n, max_len=M, impl="a8",
                    kv_quant=kvq))
                np.asarray(f(prompt))
                progs[(B, ctx, name, li)] = (f, prompt)
                lens[(B, ctx, name, li)] = n
            print(f"compiled B{B} ctx{ctx} {name}", file=sys.stderr)

    best = {k: float("inf") for k in progs}
    for r in range(args.rounds):
        for k, (f, prompt) in progs.items():
            t0 = time.time()
            np.asarray(f(prompt))
            best[k] = min(best[k], time.time() - t0)
        print(f"round {r} done", file=sys.stderr)

    for B, ctx in cells:
        for name, kvq, kern, intd in combos:
            k0, k1 = (B, ctx, name, 0), (B, ctx, name, 1)
            if k0 not in best:
                continue
            per = (best[k1] - best[k0]) / (lens[k1] - lens[k0])
            print(f"B{B} ctx{ctx} {name}: {per*1e3:8.3f} ms/step "
                  f"{B/per:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
