"""KV-cache containers: bf16 and INT8-quantized, as registered pytrees.

The reference never touches attention internals or caching (SURVEY.md §2.3 /
§5 — HF ``transformers`` does everything). For a serving engine the KV cache
is a first-class object: static max-length buffers (XLA-friendly
``dynamic_update_slice`` writes, no reallocation), stacked across layers so
the decode step scans over them, and optionally INT8-quantized per
(position, head) with f32 scales — halving HBM traffic of long-context
decode against bf16.

INT8 scheme: symmetric per-vector absmax over the head dim,
``scale = max|x| / 127``; dequant on read. Write/read are jit-traceable
methods on the pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["KVCache", "KVStackedView", "init_cache"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Stacked-layer KV cache.

    k/v: (n_layers, B, M, Hkv, hd) in ``store_dtype`` (bf16 or int8).
    k_scale/v_scale: (n_layers, B, M, Hkv, 1) f32 — only for int8.
    length: () int32 — tokens written so far (same for all batch rows).
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    length: jax.Array

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- static properties -------------------------------------------
    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    # ---- per-layer access (inside the layer scan) --------------------
    def layer(self, i) -> "KVLayerView":
        return KVLayerView(
            k=self.k[i],
            v=self.v[i],
            k_scale=None if self.k_scale is None else self.k_scale[i],
            v_scale=None if self.v_scale is None else self.v_scale[i],
        )

    def with_layers(self, stacked: "KVLayerView", new_length) -> "KVCache":
        """Rebuild from scan-stacked per-layer views + new length."""
        return KVCache(
            k=stacked.k,
            v=stacked.v,
            k_scale=stacked.k_scale,
            v_scale=stacked.v_scale,
            length=jnp.asarray(new_length, jnp.int32),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVLayerView:
    """One layer's cache slice: (B, M, Hkv, hd) (+ scales)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def write(self, k_new: jax.Array, v_new: jax.Array, pos) -> "KVLayerView":
        """Insert (B, L, Hkv, hd) new keys/values at position ``pos``."""
        if self.k_scale is None:
            k = jax.lax.dynamic_update_slice(
                self.k, k_new.astype(self.k.dtype), (0, pos, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                self.v, v_new.astype(self.v.dtype), (0, pos, 0, 0)
            )
            return KVLayerView(k, v, None, None)
        kq, ks = _quantize_i8(k_new)
        vq, vs = _quantize_i8(v_new)
        return KVLayerView(
            k=jax.lax.dynamic_update_slice(self.k, kq, (0, pos, 0, 0)),
            v=jax.lax.dynamic_update_slice(self.v, vq, (0, pos, 0, 0)),
            k_scale=jax.lax.dynamic_update_slice(
                self.k_scale, ks, (0, pos, 0, 0)
            ),
            v_scale=jax.lax.dynamic_update_slice(
                self.v_scale, vs, (0, pos, 0, 0)
            ),
        )

    def write_rows(
        self, k_new: jax.Array, v_new: jax.Array, positions: jax.Array
    ) -> "KVLayerView":
        """Per-row windowed write: (B, Lw, Hkv, hd) starting at per-row
        ``positions`` (B,) — the continuous-batching decode path (Lw == 1:
        every slot at its own position) and the speculative verify path
        (Lw == k+1 draft window per slot)."""
        B, Lw = k_new.shape[:2]
        rows = jnp.arange(B)[:, None]  # (B, 1)
        cols = positions[:, None] + jnp.arange(Lw)[None, :]  # (B, Lw)
        if self.k_scale is None:
            k = self.k.at[rows, cols].set(k_new.astype(self.k.dtype))
            v = self.v.at[rows, cols].set(v_new.astype(self.v.dtype))
            return KVLayerView(k, v, None, None)
        kq, ks = _quantize_i8(k_new)
        vq, vs = _quantize_i8(v_new)
        return KVLayerView(
            k=self.k.at[rows, cols].set(kq),
            v=self.v.at[rows, cols].set(vq),
            k_scale=self.k_scale.at[rows, cols].set(ks),
            v_scale=self.v_scale.at[rows, cols].set(vs),
        )

    def read(self, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
        """Full (B, M, Hkv, hd) keys/values, dequantized to ``dtype``."""
        if self.k_scale is None:
            return self.k.astype(dtype), self.v.astype(dtype)
        k = (self.k.astype(jnp.float32) * self.k_scale).astype(dtype)
        v = (self.v.astype(jnp.float32) * self.v_scale).astype(dtype)
        return k, v

    def read_raw(self):
        """(k, v, k_scale, v_scale) WITHOUT dequantization — the native
        int8-KV attention path (scales fold into scores/probs inside
        models.common.attention instead of materializing a bf16 cache
        copy in HBM)."""
        return self.k, self.v, self.k_scale, self.v_scale


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVStackedView:
    """In-place layer view over the FULL stacked cache arrays.

    Same duck-typed contract as :class:`KVLayerView` (``write`` /
    ``write_rows`` / ``read``) but holds the (n_layers, B, M, Hkv, hd)
    arrays plus a traced layer index, and updates them with
    ``dynamic_update_slice`` at ``li``.

    Why this exists (round-2 decode-budget finding): passing per-layer
    views through ``lax.scan`` xs/ys re-stacks the WHOLE cache into a fresh
    buffer every decode step — at M=1088 on llama-2-7b that is ~1.1 GB of
    pure copy per token, measured +4.1 ms/tok vs the ~0.7 ms HBM-mandatory
    KV read (scripts/decode_budget.py). Threading the full arrays through
    the scan *carry* and updating in place writes one token row instead;
    XLA aliases the carry buffers across iterations.
    """

    k: jax.Array  # (L, B, M, Hkv, hd)
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    li: jax.Array  # scalar int32 layer index

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.li), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def of(cls, cache: "KVCache", li) -> "KVStackedView":
        return cls(cache.k, cache.v, cache.k_scale, cache.v_scale,
                   jnp.asarray(li, jnp.int32))

    def carry(self):
        """The pytree threaded through the scan carry."""
        return (self.k, self.v, self.k_scale, self.v_scale)

    def write(self, k_new: jax.Array, v_new: jax.Array, pos) -> "KVStackedView":
        """Insert (B, L, Hkv, hd) at token position ``pos`` of layer li."""
        idx = (self.li, 0, pos, 0, 0)
        if self.k_scale is None:
            k = jax.lax.dynamic_update_slice(
                self.k, k_new[None].astype(self.k.dtype), idx
            )
            v = jax.lax.dynamic_update_slice(
                self.v, v_new[None].astype(self.v.dtype), idx
            )
            return KVStackedView(k, v, None, None, self.li)
        kq, ks = _quantize_i8(k_new)
        vq, vs = _quantize_i8(v_new)
        return KVStackedView(
            k=jax.lax.dynamic_update_slice(self.k, kq[None], idx),
            v=jax.lax.dynamic_update_slice(self.v, vq[None], idx),
            k_scale=jax.lax.dynamic_update_slice(self.k_scale, ks[None], idx),
            v_scale=jax.lax.dynamic_update_slice(self.v_scale, vs[None], idx),
            li=self.li,
        )

    def write_rows(
        self, k_new: jax.Array, v_new: jax.Array, positions: jax.Array
    ) -> "KVStackedView":
        """Per-row windowed write: (B, Lw, Hkv, hd) starting at per-row
        ``positions`` (B,) of layer li (see KVLayerView.write_rows)."""
        B, Lw = k_new.shape[:2]
        rows = jnp.arange(B)[:, None]  # (B, 1)
        cols = positions[:, None] + jnp.arange(Lw)[None, :]  # (B, Lw)
        li = jnp.broadcast_to(self.li, (B, Lw))
        if self.k_scale is None:
            k = self.k.at[li, rows, cols].set(k_new.astype(self.k.dtype))
            v = self.v.at[li, rows, cols].set(v_new.astype(self.v.dtype))
            return KVStackedView(k, v, None, None, self.li)
        kq, ks = _quantize_i8(k_new)
        vq, vs = _quantize_i8(v_new)
        return KVStackedView(
            k=self.k.at[li, rows, cols].set(kq),
            v=self.v.at[li, rows, cols].set(vq),
            k_scale=self.k_scale.at[li, rows, cols].set(ks),
            v_scale=self.v_scale.at[li, rows, cols].set(vs),
            li=self.li,
        )

    def read(self, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
        """Layer li's (B, M, Hkv, hd) keys/values, dequantized to ``dtype``."""
        k = jax.lax.dynamic_index_in_dim(self.k, self.li, 0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(self.v, self.li, 0, keepdims=False)
        if self.k_scale is None:
            return k.astype(dtype), v.astype(dtype)
        ks = jax.lax.dynamic_index_in_dim(
            self.k_scale, self.li, 0, keepdims=False
        )
        vs = jax.lax.dynamic_index_in_dim(
            self.v_scale, self.li, 0, keepdims=False
        )
        return (
            (k.astype(jnp.float32) * ks).astype(dtype),
            (v.astype(jnp.float32) * vs).astype(dtype),
        )

    def read_raw(self):
        """Layer li's raw (k, v, k_scale, v_scale) — see KVLayerView.read_raw."""
        k = jax.lax.dynamic_index_in_dim(self.k, self.li, 0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(self.v, self.li, 0, keepdims=False)
        if self.k_scale is None:
            return k, v, None, None
        ks = jax.lax.dynamic_index_in_dim(
            self.k_scale, self.li, 0, keepdims=False
        )
        vs = jax.lax.dynamic_index_in_dim(
            self.v_scale, self.li, 0, keepdims=False
        )
        return k, v, ks, vs


def _quantize_i8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-(batch, pos, head) absmax INT8: (..., hd) -> int8 + f32."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def init_cache(
    cfg,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    """Allocate an empty cache for ``cfg`` (models.decoder.ModelConfig)."""
    L, Hkv, hd = cfg.n_layers, cfg.kv_heads, cfg.hd
    shape = (L, batch, max_len, Hkv, hd)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros((L, batch, max_len, Hkv, 1), jnp.float32),
            v_scale=jnp.zeros((L, batch, max_len, Hkv, 1), jnp.float32),
            length=jnp.int32(0),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        k_scale=None,
        v_scale=None,
        length=jnp.int32(0),
    )
