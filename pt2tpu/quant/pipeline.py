"""Model-level ternarization pipeline: sequential calibration + GPTQ.

The reference's driver (``PT2LLMQuantizer.quantize``, ref main.py:232-311)
re-runs the *full model* over all calibration samples for every transformer
layer (O(L²) model forwards — SURVEY.md §2.4-4). This pipeline uses the
standard sequential GPTQ scheme instead:

  1. embed all calibration batches once;
  2. per decoder layer: run just that layer with activation taps, stream
     the taps into per-projection Hessian accumulators (quant/hessian.py),
     quantize each projection (quant/gptq.py), pack it
     (ops/ternary_matmul.pack_layer), then recompute the layer's outputs
     *with the quantized weights* as the next layer's inputs — matching the
     reference's semantics (it overwrites weights as it goes,
     ref main.py:297-299) at O(L) total layer forwards.

Per-layer quantization artifacts are journaled through ``MetricsLogger``,
and the per-layer loop is naturally resumable (SURVEY.md §5 failure
handling): `quantize_model` can be pointed at a partially-quantized params
pytree and a `start_layer`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models.common import DenseLinear
from ..ops.ternary_matmul import pack_layer
from ..utils.metrics import MetricsLogger
from .gptq import dequantize_layer, ternary_gptq
from .hessian import HessianAccumulator, damped_inverse

__all__ = ["QuantConfig", "quantize_model", "quantize_linear"]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Quantization hyperparameters (reference defaults: main.py:50-60)."""

    block_size: int = 128
    percdamp: float = 0.01
    use_ssr: bool = True
    ssr_skip: Tuple[str, ...] = ()  # quant groups quantized WITHOUT SSR
    # (sequential block order -> identity perm -> no runtime gather). E.g.
    # ("o",) trades o-proj's SSR quality gain for one fewer MXU gather per
    # layer; a group name here only matters while use_ssr is True.
    ssr_scope: str = "auto"  # which groups SSR covers:
    # "all"  — every group (the reference's recipe; runtime perms on
    #          qkv/gateup/o are realized as packed one-hot MXU gathers,
    #          ~0.55 ms/token at 7B);
    # "down" — SSR only on the down projection, whose perm FOLDS into
    #          gate/up output lanes at pack time (quant/fold.py) — the
    #          gather-free serving layout, zero runtime permutation cost;
    # "auto" — "all" below dim 640, "down" at dim >= 640. Evidence
    #          (RESULTS round 5, 61M gate): skipping SSR on qkv/gateup/o
    #          is quality-FREE at dim 640 (ppl 11.65 vs 11.69 full-SSR)
    #          while costing +7.9% ppl at dim 384 — SSR's value
    #          concentrates in `down` as width grows, and the skip buys
    #          ~+12% decode throughput at 7B. Quality-gate per model when
    #          it matters; explicit ssr_skip entries are unioned in.
    use_aga: bool = True
    aga_mode: str = "exact"  # "exact" (robust, default) | "reference"
    max_iter: int = 100
    scale_dtype: Any = jnp.bfloat16
    batch_size: int = 8  # calibration sequences per device batch
    skip: Tuple[str, ...] = ()  # projection names to keep dense
    fuse_projections: bool = True  # quantize qkv (and gate+up) jointly:
    # they share inputs hence Hessians; one matrix -> one perm -> one
    # fused kernel call at inference (7 -> 4 calls per decoder layer)
    fold_perms: bool = True  # bake SSR perms into the packed layout at pack
    # time (quant/fold.py): down's perm folds into gate/up output lanes for
    # free; the rest become packed one-hot MXU gathers instead of VPU
    # lane gathers. Exact — changes layout, not math.
    quantize_lm_head: bool = False  # ALSO ternarize the lm_head (beyond the
    # reference's scope — it only quantizes decoder-layer linears,
    # ref main.py:272). Cuts batch-1 decode HBM traffic by ~vocab*dim*1.75
    # bytes/token at a measurable perplexity cost; calibrated against the
    # final-norm outputs. Ignored for tied-embedding models.


# every group name except "down" (fused and unfused spellings)
_NON_DOWN_GROUPS = ("q", "k", "v", "qkv", "o", "gate", "up", "gateup")


def resolve_ssr_skip(qcfg: "QuantConfig", dim: int) -> Tuple[str, ...]:
    """Effective ssr_skip for a model of width ``dim`` (see ssr_scope)."""
    scope = qcfg.ssr_scope
    if scope == "auto":
        scope = "all" if dim < 640 else "down"
    if scope == "all":
        return qcfg.ssr_skip
    if scope == "down":
        return tuple(sorted(set(qcfg.ssr_skip) | set(_NON_DOWN_GROUPS)))
    raise ValueError(f"ssr_scope must be all|down|auto, got {scope!r}")


def quantize_linear(
    lin: DenseLinear,
    H_acc: HessianAccumulator,
    qcfg: QuantConfig,
    use_ssr: Optional[bool] = None,
):
    """Quantize one projection from its accumulated Hessian.

    ``use_ssr`` overrides ``qcfg.use_ssr`` (per-projection ``ssr_skip``).
    Returns (PackedTernaryLinear, stats dict).
    """
    W = lin.w.astype(jnp.float32)
    H = H_acc.normalized()
    _, H_inv = damped_inverse(H, qcfg.percdamp)
    q = ternary_gptq(
        W,
        H,
        H_inv,
        block_size=qcfg.block_size,
        use_ssr=qcfg.use_ssr if use_ssr is None else use_ssr,
        use_aga=qcfg.use_aga,
        max_iter=qcfg.max_iter,
        aga_mode=qcfg.aga_mode,
    )
    packed = pack_layer(
        q, in_features=W.shape[1], bias=lin.b, scale_dtype=qcfg.scale_dtype
    )
    # Hessian-weighted relative output error: tr(dW H dW^T) / tr(W H W^T).
    W_hat = dequantize_layer(q, W.shape[1])
    dW = W - W_hat
    num = jnp.einsum("ij,jk,ik->", dW, H, dW)
    den = jnp.maximum(jnp.einsum("ij,jk,ik->", W, H, W), 1e-12)
    # Weight-conditioning signal: excess kurtosis of the normalized weight
    # matrix. A per-row 3-level grid cannot represent heavy-tailed rows,
    # and rel_out_err does NOT catch it — GPTQ pushes the error onto
    # low-Hessian directions that fire at eval time (measured: a
    # kurtosis-6.3 gate/up quantized at rel_out_err 0.002 and detonated
    # end-to-end ppl 100x, RESULTS round 5 '120M collapse'). Gaussian
    # weights sit at ~3; > ~5 predicts a poor ternary fit.
    rms = jnp.sqrt(jnp.maximum(jnp.mean(W**2), 1e-24))
    kurt = float(jnp.mean((W / rms) ** 4))
    stats = {
        "rel_out_err": float(num / den),
        "rel_w_err": float(
            jnp.linalg.norm(dW) / jnp.maximum(jnp.linalg.norm(W), 1e-12)
        ),
        "w_kurt": round(kurt, 2),
        "nsamples": H_acc.nsamples,
    }
    if kurt > 5.0:
        import sys

        print(
            f"warning: heavy-tailed weights (kurtosis {kurt:.1f} > 5; "
            "gaussian ~3) — the ternary grid fits such rows poorly and "
            "per-layer rel_out_err will NOT show it; expect end-to-end "
            "quality loss (consider leaving this projection dense via "
            "QuantConfig.skip, or fixing the checkpoint's training)",
            file=sys.stderr,
        )
    return packed, stats


def _tap_dims(cfg: dec.ModelConfig) -> Dict[str, int]:
    return {
        "attn_in": cfg.dim,
        "o_in": cfg.n_heads * cfg.hd,
        "mlp_in": cfg.dim,
        "down_in": cfg.intermediate,
    }


def quantize_model(
    cfg: dec.ModelConfig,
    params: Dict[str, Any],
    calib_tokens: jax.Array,  # (N, L) int32
    qcfg: QuantConfig = QuantConfig(),
    log: Optional[MetricsLogger] = None,
    start_layer: int = 0,
    prequantized_layers: Optional[List[Any]] = None,
    journal_dir: Optional[str] = None,
    mesh=None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Ternarize every decoder-layer projection of a model.

    Embeddings, final norm and lm_head stay dense — the same scope as the
    reference, which only quantizes linears inside transformer layers
    (ref main.py:272, find_linear_layers over each layer).

    ``journal_dir``: if set, each quantized layer is written there as it
    completes and any journaled prefix is loaded on entry — a preempted run
    resumes at the first un-journaled layer.

    ``mesh``: optional Mesh — calibration batches shard over 'data' and
    weight matrices over 'model' during quantization (GSPMD partitions the
    Hessian accumulation and the GPTQ engine; results are bit-identical to
    the single-device run, see tests/test_parallel.py).

    Returns (quantized params, report dict).
    """
    log = log or MetricsLogger(verbose=False)
    if mesh is not None:
        from ..parallel.sharding import batch_sharding, shard_params

        params = shard_params(params, mesh)
        calib_tokens = jax.device_put(
            jnp.asarray(calib_tokens), batch_sharding(mesh)
        )
    if journal_dir and prequantized_layers is None and start_layer == 0:
        from ..utils.checkpoint import load_layers

        prequantized_layers = load_layers(journal_dir)
        start_layer = len(prequantized_layers)
        if start_layer:
            log.emit("resume_from_journal", layers=start_layer)
    # Host-resident params (hf_loader.load_hf_model(host=True)) stream one
    # layer at a time to the accelerator — a bf16 7B never fits next to
    # calibration state on a 16 GB chip, but one 0.4 GB layer always does.
    stream = (
        mesh is None
        and jax.default_backend() != "cpu"
        and all(
            d.platform == "cpu" for d in params["embed"].devices()
        )
    )
    dev = jax.devices()[0] if stream else None
    if stream:
        log.emit("streaming_quantization", device=str(dev))

    N, L = calib_tokens.shape
    bs = min(qcfg.batch_size, N)

    # Embed params pass as jit ARGUMENTS (a closed-over array lowers to an
    # inlined MLIR constant — a full extra copy of the embedding table).
    emb_keys = ("embed", "pos_embed", "emb_ln_w", "emb_ln_b")
    emb_params = {k: params.get(k) for k in emb_keys}
    if stream:
        emb_params = jax.device_put(emb_params, dev)
    emb = jax.jit(lambda p, toks: dec.embed_tokens(cfg, p, toks))
    hidden = [
        emb(emb_params, calib_tokens[i : i + bs]) for i in range(0, N, bs)
    ]
    del emb_params  # streaming: free the device copy before the layer loop

    cos, sin, cos_l, sin_l = dec.pos_tables(cfg, L)
    mask = dec.build_mask(cfg, L, L)

    @functools.partial(jax.jit, static_argnames=("taps",))
    def run_layer(lp, x, li, taps: bool):
        y, io = dec.layer_forward(
            cfg, lp, x, cos, sin, mask, return_taps=taps, impl="xla",
            layer_idx=li, cos_loc=cos_l, sin_loc=sin_l,
        )
        return y, io.taps

    all_names = [
        n
        for n in dec.LINEAR_NAMES
        if (cfg.gated_mlp or n != "gate") and n not in qcfg.skip
    ]
    # Quantization groups: members share one weight matrix / Hessian / perm.
    fuse = qcfg.fuse_projections
    ssr_skip = resolve_ssr_skip(qcfg, cfg.dim)
    groups = []
    if fuse and all(n in all_names for n in ("q", "k", "v")):
        groups.append(("qkv", ("q", "k", "v"), "attn_in"))
    else:
        groups += [(n, (n,), dec.TAP_OF_LINEAR[n]) for n in ("q", "k", "v") if n in all_names]
    if "o" in all_names:
        groups.append(("o", ("o",), "o_in"))
    if fuse and cfg.gated_mlp and "gate" in all_names and "up" in all_names:
        groups.append(("gateup", ("gate", "up"), "mlp_in"))
    else:
        groups += [(n, (n,), dec.TAP_OF_LINEAR[n]) for n in ("gate", "up") if n in all_names]
    if "down" in all_names:
        groups.append(("down", ("down",), "down_in"))
    if cfg.is_moe:
        # Expert MLPs take the routed per-expert path below; only the
        # attention projections go through the standard groups. (The
        # reference has no MoE at all — ref model.py:162-171 — so this
        # branch is new-framework scope, SURVEY.md §2.3 EP row.)
        groups = [g for g in groups if g[0] in ("qkv", "q", "k", "v", "o")]
    tap_dims = _tap_dims(cfg)

    new_layers: List[Any] = list(prequantized_layers or [])
    if start_layer != len(new_layers):
        raise ValueError(
            f"resume mismatch: start_layer={start_layer} but "
            f"{len(new_layers)} prequantized layers supplied"
        )
    # Resume: replay the already-quantized prefix so layer `start_layer`
    # calibrates against the same inputs it would have seen in the full run.
    for pre_li, pre_lp in enumerate(new_layers):
        hidden = [
            run_layer(pre_lp, h, jnp.int32(pre_li), False)[0] for h in hidden
        ]

    report: Dict[str, Any] = {"layers": []}

    E = cfg.n_experts
    if cfg.is_moe:
        # Expert mid-activations are recomputed per expert during Hessian
        # accumulation (returning (B, L, E, I) taps would multiply
        # calibration memory by n_experts).
        @jax.jit
        def _expert_mid(gate_w, up_w, x):
            g = x.astype(jnp.float32) @ gate_w.T.astype(jnp.float32)
            u = x.astype(jnp.float32) @ up_w.T.astype(jnp.float32)
            return dec._act(cfg, g) * u

    for li in range(start_layer, cfg.n_layers):
        lp = dec.layer_slice(params["layers"], li)
        if stream:
            lp = jax.device_put(lp, dev)  # one dense layer on-chip at a time

        needed_taps = {tap for _, _, tap in groups}
        if cfg.is_moe:
            needed_taps.add("mlp_in")
        accs = {t: HessianAccumulator(tap_dims[t]) for t in needed_taps}
        if cfg.is_moe:
            # Routed per-expert Hessians: the layer output contribution of
            # expert e on token t is w_te * E_e(x_t), so quantization error
            # in E_e's weights enters the output scaled by w_te — the
            # output-error-optimal statistic is H_e = sum_t w_te^2 x_t x_t^T,
            # accumulated as rows w_te * x_t (unrouted tokens have w = 0 and
            # drop out). gate/up see the shared mlp_in; down sees expert e's
            # own mid-activations.
            accs_gu = [HessianAccumulator(cfg.dim) for _ in range(E)]
            accs_dn = [HessianAccumulator(cfg.expert_inter) for _ in range(E)]
        for h in hidden:
            _, taps = run_layer(lp, h, jnp.int32(li), True)
            for t in needed_taps:
                accs[t].update(taps[t])
            if cfg.is_moe:
                x = taps["mlp_in"]
                w = taps["moe_w"]  # (B, L, E) f32 combine weights
                for e in range(E):
                    xe = x.astype(jnp.float32) * w[..., e : e + 1]
                    accs_gu[e].update(xe)
                    mid = _expert_mid(lp["gate"].w[e], lp["up"].w[e], x)
                    accs_dn[e].update(mid * w[..., e : e + 1])

        new_lp = dict(lp)
        layer_report = {}
        if cfg.is_moe:
            expert_lps = []
            moe_stats = {"gateup": [], "down": []}
            for e in range(E):
                lin_gu = DenseLinear(
                    w=jnp.concatenate(
                        [lp["gate"].w[e], lp["up"].w[e]], axis=0
                    )
                )
                p_gu, st_gu = quantize_linear(
                    lin_gu, accs_gu[e], qcfg,
                    use_ssr=qcfg.use_ssr and "gateup" not in ssr_skip,
                )
                p_dn, st_dn = quantize_linear(
                    DenseLinear(w=lp["down"].w[e]), accs_dn[e], qcfg,
                    use_ssr=qcfg.use_ssr and "down" not in ssr_skip,
                )
                expert_lps.append({"gateup": p_gu, "down": p_dn})
                moe_stats["gateup"].append(st_gu)
                moe_stats["down"].append(st_dn)
            if qcfg.fold_perms:
                from .fold import fold_moe_expert_perms

                expert_lps = fold_moe_expert_perms(cfg, expert_lps)
            for name in ("gateup", "down"):
                new_lp[name] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[elp[name] for elp in expert_lps],
                )
            new_lp.pop("gate", None)
            new_lp.pop("up", None)
            for name in ("gateup", "down"):
                layer_report[name] = {
                    k: float(np.mean([s[k] for s in moe_stats[name]]))
                    for k in moe_stats[name][0]
                }
                log.emit(
                    "layer_quantized", layer=li, proj=name + f"[x{E}]",
                    **layer_report[name],
                )
        for gname, members, tap in groups:
            if len(members) == 1:
                lin = lp[members[0]]
            else:
                ws = [lp[m].w for m in members]
                bs_ = [lp[m].b for m in members]
                bias = (
                    None
                    if all(b is None for b in bs_)
                    else jnp.concatenate(
                        [
                            b if b is not None else jnp.zeros(w.shape[0], w.dtype)
                            for b, w in zip(bs_, ws)
                        ]
                    )
                )
                lin = DenseLinear(w=jnp.concatenate(ws, axis=0), b=bias)
            packed, stats = quantize_linear(
                lin,
                accs[tap],
                qcfg,
                use_ssr=qcfg.use_ssr and gname not in ssr_skip,
            )
            new_lp[gname] = packed
            for m in members:
                if m != gname:
                    new_lp.pop(m, None)
            layer_report[gname] = stats
            log.emit("layer_quantized", layer=li, proj=gname, **stats)
        if qcfg.fold_perms:
            from .fold import fold_layer_perms

            new_lp = fold_layer_perms(cfg, new_lp)
        report["layers"].append(layer_report)

        # Propagate quantized outputs as the next layer's inputs.
        hidden = [run_layer(new_lp, h, jnp.int32(li), False)[0] for h in hidden]
        new_layers.append(new_lp)
        if journal_dir:
            from ..utils.checkpoint import save_layer

            save_layer(journal_dir, li, new_lp)

    out_params = dict(params)
    if stream:
        # Non-layer leaves (embeddings, final norm, lm_head) move to the
        # device now: with the dense layers gone the quantized model fits,
        # and mixed host/device committed leaves would break later jits.
        for k, v in out_params.items():
            if k != "layers" and v is not None:
                out_params[k] = jax.device_put(v, dev)
    from .fold import pad_gateup_blocks

    out_params["layers"] = dec.stack_layers(
        [pad_gateup_blocks(lp) for lp in new_layers]
    )

    if qcfg.quantize_lm_head and out_params.get("lm_head") is not None:
        # Calibrate against what actually feeds the head: final-norm outputs.
        lnf = jax.jit(
            lambda h: dec.layer_norm(
                h, out_params["lnf_w"], out_params["lnf_b"], cfg.norm_eps
            )
            if cfg.norm == "layernorm"
            else dec.rms_norm(h, out_params["lnf_w"], cfg.norm_eps)
        )
        acc = HessianAccumulator(cfg.dim)
        for h in hidden:
            acc.update(lnf(h))
        packed, stats = quantize_linear(out_params["lm_head"], acc, qcfg)
        if qcfg.fold_perms:
            from .fold import fold_head_perm

            packed = fold_head_perm(packed)
        out_params["lm_head"] = packed
        report["lm_head"] = stats
        log.emit("lm_head_quantized", **stats)

    from ..utils.metrics import model_bits_per_weight

    report["bits_per_weight"] = model_bits_per_weight(out_params)
    log.emit("model_quantized", bits_per_weight=report["bits_per_weight"])
    return out_params, report
