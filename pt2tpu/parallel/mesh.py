"""Device mesh construction (ICI/DCN-aware via jax mesh utils).

The reference has no distributed execution of any kind (SURVEY.md §2.3);
this is the from-scratch TPU-native scaling layer: a named-axis
``jax.sharding.Mesh`` ('data', 'model') over which GSPMD partitions both
the quantization pass and the serving path (parallel/sharding.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "auto_mesh", "initialize_distributed"]


def make_mesh(
    axes: Dict[str, int], devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a mesh with named axes, e.g. ``make_mesh({"data": 2, "model": 4})``.

    Uses ``mesh_utils.create_device_mesh`` so the physical layout follows
    ICI topology when running on real slices; falls back to a plain reshape
    for host-platform (CPU test) devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def auto_mesh(
    n_devices: Optional[int] = None, model_parallel: Optional[int] = None
) -> Mesh:
    """Heuristic mesh: largest power-of-two model axis up to 8, rest data."""
    n = n_devices or len(jax.devices())
    if model_parallel is None:
        model_parallel = 1
        while model_parallel * 2 <= min(n, 8) and n % (model_parallel * 2) == 0:
            model_parallel *= 2
    return make_mesh({"data": n // model_parallel, "model": model_parallel})


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry: ``jax.distributed.initialize`` passthrough.

    On a pod slice each host calls this before any jax op; single-host and
    already-initialized cases are no-ops.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized
