"""Test harness config.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: the reference has no
multi-node tests; our distributed paths are validated the JAX way with
--xla_force_host_platform_device_count).  x64 is enabled so CPU oracle
comparisons against scipy are exact-precision.
Env vars must be set before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU); tests run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon site hook (PYTHONPATH=/root/.axon_site) forces
# jax_platforms="axon,cpu" regardless of JAX_PLATFORMS; override it so tests
# run on the virtual CPU mesh, never over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
