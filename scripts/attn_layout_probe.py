"""Decode-attention layout probe (chip): is the 3.9 ms/step batch-8
attention cost (scripts/decode_budget.py, RESULTS round 4) the cache
layout's fault?

Hypothesis: with the cache stored (B, M, Hkv, hd), the scores einsum
"blhrd,bmhd->bhrlm" forces XLA to transpose 2 x B*M*H*hd bytes of
KV to head-major EVERY step (and back for probs @ V), and the transpose
runs far below stream rate. A head-major (B, Hkv, M, hd) cache needs no
transposes: both dots consume it natively.

Times one full attention read (scores -> masked softmax -> ctx) at the
batch-8 decode point in both layouts, plus the int8-KV variant of each
(scale folding included), chained x n_layers to amortize dispatch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def run(B=8, M=640, H=32, hd=128, layers=32, reps=3):
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, hd), jnp.bfloat16)
    k_mh = jax.random.normal(kk, (B, M, H, hd), jnp.bfloat16)  # cache layout
    v_mh = jax.random.normal(kv, (B, M, H, hd), jnp.bfloat16)
    k_hm = jnp.transpose(k_mh, (0, 2, 1, 3)).copy()  # head-major
    v_hm = jnp.transpose(v_mh, (0, 2, 1, 3)).copy()
    k8_mh = (k_mh * 16).astype(jnp.int8)
    v8_mh = (v_mh * 16).astype(jnp.int8)
    ks_mh = jnp.abs(jax.random.normal(kk, (B, M, H, 1), jnp.float32))
    k8_hm = jnp.transpose(k8_mh, (0, 2, 1, 3)).copy()
    v8_hm = jnp.transpose(v8_mh, (0, 2, 1, 3)).copy()
    ks_hm = jnp.transpose(ks_mh, (0, 2, 1, 3)).copy()  # (B, H, 1, M)->?
    valid = jnp.arange(M)[None, :] < (M - 7)

    def attn_mh(q_, k_, v_, ks=None, vs=None):
        s = jnp.einsum("bhd,bmhd->bhm", q_, k_.astype(q_.dtype),
                       preferred_element_type=jnp.float32)
        if ks is not None:
            s = s * jnp.transpose(ks, (0, 2, 3, 1))[:, :, 0, :]
        s = jnp.where(valid[:, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        if vs is not None:
            p = p * jnp.transpose(vs, (0, 2, 3, 1))[:, :, 0, :]
        return jnp.einsum("bhm,bmhd->bhd", p.astype(q_.dtype),
                          v_.astype(q_.dtype),
                          preferred_element_type=jnp.float32)

    def attn_hm(q_, k_, v_, ks=None, vs=None):
        s = jnp.einsum("bhd,bhmd->bhm", q_, k_.astype(q_.dtype),
                       preferred_element_type=jnp.float32)
        if ks is not None:
            s = s * ks[..., 0]
        s = jnp.where(valid[:, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        if vs is not None:
            p = p * vs[..., 0]
        return jnp.einsum("bhm,bhmd->bhd", p.astype(q_.dtype),
                          v_.astype(q_.dtype),
                          preferred_element_type=jnp.float32)

    def attn_vpu(q_, k_, v_, ks=None, vs=None):
        # broadcast-multiply-reduce in the cache's NATIVE (B, M, H, hd)
        # layout: no transposes, two streaming passes over K and V
        kf = k_.astype(jnp.float32)
        s = jnp.sum(kf * q_.astype(jnp.float32)[:, None], axis=-1)  # (B,M,H)
        if ks is not None:
            s = s * ks[..., 0]
        s = jnp.where(valid[:, :, None], s, -1e30)
        p = jax.nn.softmax(s, axis=1)  # over M
        if vs is not None:
            p = p * vs[..., 0]
        ctx = jnp.sum(
            v_.astype(jnp.float32) * p[..., None], axis=1
        )  # (B,H,hd)
        return ctx

    def chain(fn, n, *ops):
        def body(c, _):
            out = fn(c, *ops)
            # feed a data dependence back into q so layers serialize
            return (q + out.astype(q.dtype) * 1e-6), None
        return jax.jit(lambda: jax.lax.scan(body, q, None, length=n)[0])

    # Two-length slope (dispatch through the tunnel is 70 us - 25 ms and
    # would otherwise swamp per-layer costs — RESULTS.md methodology).
    n_short, n_long = max(4, layers // 4), layers
    cases = {
        "bf16 (B,M,H,hd) cache-layout": (attn_mh, (k_mh, v_mh)),
        "bf16 (B,H,M,hd) head-major  ": (attn_hm, (k_hm, v_hm)),
        "bf16 (B,M,H,hd) vpu-reduce  ": (attn_vpu, (k_mh, v_mh)),
        "int8 (B,M,H,hd) cache-layout": (attn_mh, (k8_mh, v8_mh, ks_mh, ks_mh)),
        "int8 (B,H,M,hd) head-major  ": (attn_hm, (k8_hm, v8_hm, ks_hm, ks_hm)),
        "int8 (B,M,H,hd) vpu-reduce  ": (attn_vpu, (k8_mh, v8_mh, ks_mh, ks_mh)),
    }
    progs = {
        name: (chain(fn, n_short, *ops), chain(fn, n_long, *ops))
        for name, (fn, ops) in cases.items()
    }
    for fs in progs.values():  # compile everything first
        for f in fs:
            np.asarray(f())
    best = {}
    for _ in range(reps):  # interleave rounds across cases
        for name, (f_s, f_l) in progs.items():
            for li, f in ((0, f_s), (1, f_l)):
                t0 = time.time()
                np.asarray(f())
                key = (name, li)
                best[key] = min(best.get(key, float("inf")), time.time() - t0)
    for name in progs:
        per_layer = (best[(name, 1)] - best[(name, 0)]) / (n_long - n_short)
        kv_bytes = 2 * B * M * H * hd * (1 if "int8" in name else 2)
        print(f"{name}: {per_layer*1e6:8.1f} us/layer "
              f"({kv_bytes / per_layer / 1e9:6.0f} GB/s KV stream)")


if __name__ == "__main__":
    run()
