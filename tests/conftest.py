"""Test env: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding tests run on this virtual mesh (SURVEY §4: multiprocess
CPU simulation via xla_force_host_platform_device_count).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin pins jax_platforms programmatically; override back to
# CPU before any backend initialization so tests run on the virtual 8-CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
