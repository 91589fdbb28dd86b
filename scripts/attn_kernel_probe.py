"""On-chip exactness + speed of the decode-attention kernel vs XLA
(pallas_attention.py). Slope-timed chained layers, interleaved rounds."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main(B=8, M=640, H=32, Hkv=32, hd=128, reps=3):
    assert jax.default_backend() == "tpu"
    from pt2tpu.models import common
    from pt2tpu.models.common import attention
    from pt2tpu.ops.kernels.pallas_attention import decode_attention_pallas

    common.DECODE_ATTN_KERNEL = False  # XLA cases stay XLA in this probe

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, H, hd)), jnp.bfloat16)
    kf = rng.normal(size=(B, M, Hkv, hd)).astype(np.float32)
    vf = rng.normal(size=(B, M, Hkv, hd)).astype(np.float32)
    ks = np.abs(kf).max(-1, keepdims=True).astype(np.float32) / 127
    vs = np.abs(vf).max(-1, keepdims=True).astype(np.float32) / 127
    k8 = jnp.asarray(np.clip(np.round(kf / ks), -127, 127).astype(np.int8))
    v8 = jnp.asarray(np.clip(np.round(vf / vs), -127, 127).astype(np.int8))
    kb = jnp.asarray(kf, jnp.bfloat16)
    vb = jnp.asarray(vf, jnp.bfloat16)
    ks, vs = jnp.asarray(ks), jnp.asarray(vs)
    valid = jnp.asarray(np.arange(M)[None] < M - 7) | jnp.zeros(
        (B, 1), bool
    )
    sc = 1.0 / float(np.sqrt(hd))

    # --- exactness on-chip -------------------------------------------
    for name, (kk, vv, kss, vss) in (
        ("bf16", (kb, vb, None, None)),
        ("int8", (k8, v8, ks, vs)),
    ):
        f = jax.jit(
            lambda q_, k_, v_, kss=kss, vss=vss: decode_attention_pallas(
                q_, k_, v_, valid, sc, k_scale=kss, v_scale=vss
            )
        )
        got = np.asarray(f(q, kk, vv), np.float32)
        want = np.asarray(
            attention(q, kk, vv, None, valid, scale=sc,
                      k_scale=kss, v_scale=vss),
            np.float32,
        )
        err = np.abs(got - want).max()
        print(f"exactness {name}: max abs err {err:.5f}")
        assert err < 3e-2, err

    # --- chained slope timing ----------------------------------------
    def chain(fn, n, *ops):
        def body(c, _):
            out = fn(c, *ops)
            return (q + out.astype(q.dtype) * 1e-6), None

        return jax.jit(lambda: jax.lax.scan(body, q, None, length=n)[0])

    def xla_bf16(q_, k_, v_):
        return attention(q_, k_, v_, None, valid, scale=sc)

    def xla_int8(q_, k_, v_, ks_, vs_):
        return attention(q_, k_, v_, None, valid, scale=sc,
                         k_scale=ks_, v_scale=vs_)

    def pk_bf16(q_, k_, v_):
        return decode_attention_pallas(q_, k_, v_, valid, sc)

    def pk_int8(q_, k_, v_, ks_, vs_):
        return decode_attention_pallas(q_, k_, v_, valid, sc,
                                       k_scale=ks_, v_scale=vs_)

    n_s, n_l = 8, 32
    cases = {
        "xla  bf16": (xla_bf16, (kb, vb)),
        "pallas bf16": (pk_bf16, (kb, vb)),
        "xla  int8": (xla_int8, (k8, v8, ks, vs)),
        "pallas int8": (pk_int8, (k8, v8, ks, vs)),
    }
    progs = {
        n: (chain(f, n_s, *ops), chain(f, n_l, *ops))
        for n, (f, ops) in cases.items()
    }
    for fs in progs.values():
        for f in fs:
            np.asarray(f())
    best = {}
    for _ in range(reps):
        for n, (fs, fl) in progs.items():
            for li, f in ((0, fs), (1, fl)):
                t0 = time.time()
                np.asarray(f())
                best[(n, li)] = min(
                    best.get((n, li), float("inf")), time.time() - t0
                )
    for n in progs:
        per = (best[(n, 1)] - best[(n, 0)]) / (n_l - n_s)
        bytes_kv = 2 * B * M * Hkv * hd * (1 if "int8" in n else 2)
        print(f"{n}: {per*1e6:8.1f} us/layer "
              f"({bytes_kv/per/1e9:6.0f} GB/s KV)")


if __name__ == "__main__":
    main()
