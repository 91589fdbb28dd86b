"""Test harness config: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test process —
pytest imports conftest.py before collecting test modules, which is early
enough. This is the standard fake-multichip trick (SURVEY.md §4) so sharding
tests exercise real GSPMD partitioning without TPU hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup (before
# conftest runs) with JAX_PLATFORMS=axon, so the env var alone is too late —
# override through the live config before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
