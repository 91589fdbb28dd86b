"""On-chip correctness smoke: Pallas kernels vs XLA reference on the REAL TPU.

The test suite runs kernels in interpret mode on CPU (tests/conftest.py);
this script is the hardware gate — run it whenever kernels change:

    python scripts/tpu_smoke.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def check(name, got, want, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    rel = err / max(1e-9, float(np.max(np.abs(want))))
    ok = rel <= atol
    print(f"  {'OK ' if ok else 'FAIL'} {name}: max rel err {rel:.2e}")
    return ok


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    from pt2tpu.ops.gather import apply_input_perm, gather_apply, make_packed_gather
    from pt2tpu.ops.ternary_matmul import (
        ternary_linear_apply,
        ternary_linear_apply_stacked,
        ternary_matmul_xla,
    )
    from pt2tpu.ops.kernels.pallas_ternary import (
        ternary_matmul_pallas,
        ternary_matmul_pallas_stacked,
    )
    from pt2tpu.utils.randmodel import random_ternary_linear

    rng = np.random.default_rng(0)
    ok = True

    # 1. fused kernel vs XLA blockwise, several shapes (incl. ragged nb=96)
    for K, n in [(4096, 4096), (4096, 12288), (12288, 4096), (2048, 22016)]:
        packed = jnp.asarray(rng.integers(-128, 128, (K // 4, n)), jnp.int8)
        nb = K // 128
        alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.bfloat16)
        mu = jnp.asarray(rng.normal(0, 0.001, (nb, n)), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
        got = ternary_matmul_pallas(x, packed, alpha, mu)
        want = ternary_matmul_xla(x, packed, alpha, mu)
        ok &= check(f"kernel {K}x{n}", got, want, 2e-2)

    # 1b. telescoped-unpack tolerance contract (ADVICE r1): the mask-free
    # decode path vs the masked path on-chip at the production decode row
    # tile. Measured 2026-08: NOT bit-equal (98% of elements differ by 1-2
    # f32 ulps from dot accumulation order; the round-1 "exact" claim held
    # only at the shapes probed then) — max rel 2.5e-6 at both llama-7b
    # projection shapes. Contract pinned at 1e-5 relative; if a tile-shape
    # change breaks it, gate the telescope off for that shape.
    for K, n in [(4096, 12288), (12288, 4096)]:
        packed = jnp.asarray(rng.integers(-128, 128, (K // 4, n)), jnp.int8)
        nb = K // 128
        alpha = jnp.asarray(rng.uniform(0.01, 0.02, (nb, n)), jnp.bfloat16)
        mu = jnp.asarray(rng.normal(0, 0.001, (nb, n)), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
        tele = ternary_matmul_pallas(x, packed, alpha, mu, _telescope=True)
        mask = ternary_matmul_pallas(x, packed, alpha, mu, _telescope=False)
        ok &= check(f"telescoped vs masked {K}x{n}", tele, mask, 1e-5)

    # 2. one-hot gather kernel: bit-exact
    m = 4096
    perm = np.concatenate(
        [rng.permutation(m), np.full(0, m)]
    ).astype(np.int32)
    g = make_packed_gather(jnp.asarray(perm), m)
    x = jnp.asarray(rng.standard_normal((3, m)), jnp.bfloat16)
    got = gather_apply(g, x, impl="pallas")
    want = apply_input_perm(x, jnp.asarray(perm), m)
    exact = bool((np.asarray(got) == np.asarray(want)).all())
    print(f"  {'OK ' if exact else 'FAIL'} gather exact")
    ok &= exact

    # 2b. fused gather+matmul kernel vs two-step (gather kernel -> matmul)
    from pt2tpu.ops.kernels.pallas_ternary import (
        ternary_matmul_pallas,
        ternary_matmul_pallas_gathered,
    )

    # n=4096 is a single output tile; n=12288 (qkv) forces n//tn > 1, the
    # grid pattern whose o_ref revisits broke on hardware (2026-08) while
    # every single-tile probe passed. Keep both.
    for n_out in (4096, 12288):
        p7 = random_ternary_linear(
            jax.random.PRNGKey(9), n_out, 4096, perm_mode="ssr"
        )
        x7 = jnp.asarray(rng.standard_normal((5, 4096)), jnp.bfloat16)
        for a8f in (False, True):
            xg7 = gather_apply(p7.gather, x7, impl="pallas")
            want = ternary_matmul_pallas(
                jnp.asarray(xg7, jnp.bfloat16), p7.packed, p7.alpha, p7.mu,
                block_size=128, a8=a8f,
            )
            got = ternary_matmul_pallas_gathered(
                x7, p7.gather.packed, p7.packed, p7.alpha, p7.mu,
                block_size=128, a8=a8f,
            )
            ok &= check(
                f"fused gather+matmul {4096}x{n_out} a8={a8f}", got, want, 1e-5
            )

    # 2c. fused iota-gather+matmul (v2, safe grid) vs two-step, and the
    # fused MLP megakernel vs the two-call path — on hardware at 7B-like
    # shapes (multi-output-tile + multi-j grids for the revisit pattern).
    from pt2tpu.ops.kernels.pallas_ternary import (
        ternary_matmul_pallas_igathered,
        ternary_mlp_pallas,
    )

    for n_out in (4096, 12288):
        p8 = random_ternary_linear(
            jax.random.PRNGKey(11), n_out, 4096, perm_mode="ssr"
        )
        x8 = jnp.asarray(rng.standard_normal((5, 4096)), jnp.bfloat16)
        for a8f in (False, True):
            xg8 = gather_apply(p8.gather, x8, impl="pallas")
            want = ternary_matmul_pallas(
                jnp.asarray(xg8, jnp.bfloat16), p8.packed, p8.alpha, p8.mu,
                block_size=128, a8=a8f,
            )
            got = ternary_matmul_pallas_igathered(
                x8, p8.perm, p8.packed, p8.alpha, p8.mu,
                block_size=128, a8=a8f,
            )
            ok &= check(
                f"igather fused 4096x{n_out} a8={a8f}", got, want, 1e-4
            )

    from pt2tpu.quant import fold as foldmod

    class _GCfg:
        gated_mlp = True

    D_m, I_m, n_m = 4096, 11008, 4096  # llama-2-7b MLP dims
    lpm = foldmod.fold_layer_perms(_GCfg(), {
        "gateup": random_ternary_linear(
            jax.random.PRNGKey(12), 2 * I_m, D_m, perm_mode="ssr"
        ),
        "down": random_ternary_linear(
            jax.random.PRNGKey(13), n_m, I_m, perm_mode="ssr"
        ),
    })
    gum, dnm = lpm["gateup"], lpm["down"]
    xm = jnp.asarray(rng.standard_normal((2, D_m)), jnp.bfloat16)
    guo = ternary_linear_apply(gum, xm, impl="pallas",
                               out_dtype=jnp.float32)
    midm = (jax.nn.silu(guo[..., :I_m]) * guo[..., I_m:]).astype(jnp.bfloat16)
    want = ternary_linear_apply(dnm, midm, impl="pallas",
                                out_dtype=jnp.float32)
    got = ternary_mlp_pallas(
        xm, gum.perm, gum.packed, gum.alpha, gum.mu,
        dnm.packed, dnm.alpha, dnm.mu, act="silu", intermediate=I_m,
    )
    # two-call rounds mid through bf16; fused keeps f32 -> tolerance
    ok &= check("fused MLP 7B dims", got, want, 5e-3)

    # 3. stacked layer-indexed kernel vs per-layer apply (with SSR gathers)
    L = 3
    ps = [
        random_ternary_linear(jax.random.PRNGKey(i), 512, 1024, perm_mode="ssr")
        for i in range(L)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
    x = jnp.asarray(rng.standard_normal((2, 1024)), jnp.bfloat16)
    for li in range(L):
        got = ternary_linear_apply_stacked(stacked, x, jnp.int32(li), impl="pallas")
        want = ternary_linear_apply(ps[li], x, impl="pallas")
        ok &= check(f"stacked layer {li}", got, want, 1e-6)

    # 4. short greedy decode: pallas tokens == xla tokens
    from pt2tpu.models import get_config
    from pt2tpu.serve import greedy_generate
    from pt2tpu.utils.randmodel import random_ternary_params

    cfg = get_config("llama-2-7b").with_(n_layers=2, max_seq_len=64)
    params = random_ternary_params(cfg, jax.random.PRNGKey(7), perm_mode="ssr")
    prompt = jnp.ones((1, 8), jnp.int32)
    tp = greedy_generate(cfg, params, prompt, max_new=8, max_len=32, impl="pallas")
    tx = greedy_generate(cfg, params, prompt, max_new=8, max_len=32, impl="xla")
    same = bool((np.asarray(tp) == np.asarray(tx)).all())
    print(f"  {'OK ' if same else 'FAIL'} decode tokens pallas == xla: "
          f"{np.asarray(tp).tolist()} vs {np.asarray(tx).tolist()}")
    ok &= same

    # 5. decode-attention kernel (round 4): bf16 + int8-KV vs XLA ref
    from pt2tpu.models.common import attention
    from pt2tpu.ops.kernels.pallas_attention import decode_attention_pallas

    rng = np.random.default_rng(3)
    B, M, H, hd = 2, 256, 4, 128
    qa = jnp.asarray(rng.normal(size=(B, 1, H, hd)), jnp.bfloat16)
    kf = rng.normal(size=(B, M, H, hd)).astype(np.float32)
    vf = rng.normal(size=(B, M, H, hd)).astype(np.float32)
    ksc = np.abs(kf).max(-1, keepdims=True).astype(np.float32) / 127
    vsc = np.abs(vf).max(-1, keepdims=True).astype(np.float32) / 127
    k8 = jnp.asarray(np.clip(np.round(kf / ksc), -127, 127).astype(np.int8))
    v8 = jnp.asarray(np.clip(np.round(vf / vsc), -127, 127).astype(np.int8))
    valid = jnp.asarray(np.arange(M)[None] < np.array([100, 256])[:, None])
    for nm, (kk, vv, kss, vss) in (
        ("bf16", (jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16), None, None)),
        ("int8", (k8, v8, jnp.asarray(ksc), jnp.asarray(vsc))),
    ):
        got = decode_attention_pallas(qa, kk, vv, valid, 0.0883883,
                                      k_scale=kss, v_scale=vss)
        # attn_kernel=False: the XLA reference must NOT route back into
        # the kernel (INT8_DECODE_ATTN_KERNEL defaults the int8 path on)
        want = attention(qa, kk, vv, None, valid, scale=0.0883883,
                         k_scale=kss, v_scale=vss, attn_kernel=False)
        ok &= check(f"decode-attn kernel {nm}", got, want, 3e-2)

    print("SMOKE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
