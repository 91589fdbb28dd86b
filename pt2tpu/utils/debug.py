"""Numerical-safety and debugging toggles (SURVEY.md §5 "race detection /
sanitizers" — what that means in a single-program XLA world: NaN tracing,
deterministic collectives, and assertion helpers, not thread sanitizers).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp

__all__ = ["nan_debug", "assert_finite_tree", "deterministic_mode"]


@contextlib.contextmanager
def nan_debug() -> Iterator[None]:
    """Enable jax_debug_nans inside the context (errors at the op that first
    produces a NaN instead of propagating it)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side check that every floating leaf of a pytree is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


@contextlib.contextmanager
def deterministic_mode() -> Iterator[None]:
    """Bit-reproducible runs: disables the remat/dot nondeterminism knobs
    that matter on TPU (matmul precision stays as requested; XLA TPU
    reductions are deterministic by default)."""
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
