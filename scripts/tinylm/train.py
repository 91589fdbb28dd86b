"""Train a tiny real language model on the local corpus (JAX, TPU or CPU).

Purpose (VERDICT r3 item 1): every perplexity the framework has ever
produced came from random-init weights; this trains a ~17 M-param
llama-architecture model on real local text so the fp-vs-ternary ppl
*degradation delta* finally means something.  The forward pass is
pt2tpu's own `models.decoder.forward` (the exact code the quantized model
runs through), so the trained weights are parity-exact with the stack by
construction; `export_hf.py` converts them to a HF LlamaForCausalLM
checkpoint both pipelines (ours and the torch reference driver,
ref main.py:232-311) can load.

Training loop: whole token corpus device-resident, `lax.scan` over K
steps per dispatch (the axon tunnel's per-dispatch latency makes
step-per-dispatch loops pointless), AdamW + cosine schedule, bf16
compute over fp32 master params.
"""

import argparse
import os
import time

import jax

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np
import optax

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pt2tpu.models import ModelConfig, decoder as dec


def tiny_config(
    vocab: int,
    n_layers: int = 6,
    dim: int = 384,
    n_heads: int = 6,
    intermediate: int = 1024,
) -> ModelConfig:
    # dims are all multiples of 128 so the quantizer's 128-col blocks and
    # the ternary lm_head (vocab % 128 == 0) apply cleanly. Defaults are
    # the 17M round-4 model; the round-5 scaling point uses
    # --dim 640 --heads 5 --inter 1792 --layers 10 (~61M params).
    return ModelConfig(
        family="llama2",
        vocab_size=vocab,
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        intermediate=intermediate,
        max_seq_len=512,
        rope_theta=10000.0,
        norm_eps=1e-5,
    )


def save_params_npz(path, params):
    flat = {}

    def walk(obj, pre):
        from pt2tpu.models.common import DenseLinear

        if obj is None:
            return
        if isinstance(obj, DenseLinear):
            walk(obj.w, pre + "/w")
            walk(obj.b, pre + "/b")
        elif isinstance(obj, dict):
            for k, v in obj.items():
                walk(v, pre + "/" + k)
        else:
            flat[pre.lstrip("/")] = np.asarray(obj)

    walk(params, "")
    np.savez(path, **flat)
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/tinylm")
    ap.add_argument("--out", default="/root/tinylm/params.npz")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=200, help="steps per dispatch")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--layers", type=int, default=6,
                    help="decoder depth (2 for a speculative draft model)")
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--inter", type=int, default=1024)
    args = ap.parse_args()

    train_toks = np.load(os.path.join(args.data, "train_tokens.npy"))
    held_toks = np.load(os.path.join(args.data, "heldout_tokens.npy"))
    vocab = 8192
    assert train_toks.max() < vocab
    cfg = tiny_config(vocab, args.layers, args.dim, args.heads, args.inter)
    print(f"backend={jax.default_backend()} corpus={len(train_toks)/1e6:.1f}M "
          f"heldout={len(held_toks)/1e6:.2f}M")

    key = jax.random.PRNGKey(args.seed)
    params = dec.init_params(cfg, key, dtype=jnp.float32)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f} M")

    warmup = min(args.warmup, args.steps // 2)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.1
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.1),
    )
    opt_state = opt.init(params)

    toks_dev = jnp.asarray(train_toks)
    S = args.seq

    def loss_fn(p, windows):
        pb = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2
            else x,
            p,
        )
        logits = dec.forward(cfg, pb, windows[:, :-1], impl="xla")
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = windows[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return nll.mean()

    def step(carry, k):
        p, s = carry
        off = jax.random.randint(k, (args.batch,), 0, len(train_toks) - S - 1)
        windows = toks_dev[off[:, None] + jnp.arange(S + 1)[None, :]]
        loss, g = jax.value_and_grad(loss_fn)(p, windows)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    @jax.jit
    def run_chunk(p, s, key):
        keys = jax.random.split(key, args.chunk)
        (p, s), losses = jax.lax.scan(step, (p, s), keys)
        return p, s, losses.mean(), losses[-10:].mean()

    # fixed heldout windows for monitoring (the real eval goes through the CLI)
    n_val = 32
    stride = (len(held_toks) - S - 1) // n_val
    val_windows = np.stack(
        [held_toks[i * stride : i * stride + S + 1] for i in range(n_val)]
    ).astype(np.int32)
    val_dev = jnp.asarray(val_windows)

    @jax.jit
    def val_loss(p):
        return loss_fn(p, val_dev)

    t0 = time.time()
    kroot = jax.random.PRNGKey(args.seed + 1)
    done = 0
    while done < args.steps:
        kroot, kc = jax.random.split(kroot)
        params, opt_state, mloss, tail = run_chunk(params, opt_state, kc)
        done += args.chunk
        vl = val_loss(params) if done % (args.chunk * 5) == 0 or done >= args.steps else None
        msg = (f"[{time.time()-t0:7.1f}s] step {done}/{args.steps} "
               f"loss {float(mloss):.4f} (tail {float(tail):.4f})")
        if vl is not None:
            msg += f" val {float(vl):.4f} (ppl {float(jnp.exp(vl)):.2f})"
        print(msg, flush=True)

    flat = save_params_npz(args.out, jax.device_get(params))
    print(f"saved {len(flat)} arrays -> {args.out}")
    final_val = float(val_loss(params))
    print(f"final val loss {final_val:.4f} ppl {np.exp(final_val):.2f}")


if __name__ == "__main__":
    main()
