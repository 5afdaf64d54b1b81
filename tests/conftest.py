"""Test harness config: run everything on CPU with 8 virtual devices.

The image's sitecustomize force-registers the tunneled TPU backend (platform
"axon") and imports jax at interpreter start, so env vars alone are not
enough: we also override ``jax_platforms`` via jax.config before any backend
initializes.  Sharding tests then see an 8-device CPU mesh.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_numpy():
    """Deterministic global np.random for every test (the reference's RNG)."""
    np.random.seed(0)
    yield
