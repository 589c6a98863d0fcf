"""Test configuration: force CPU with an 8-device virtual mesh.

Sharding-invariance and multi-chip tests run on a fake mesh via
xla_force_host_platform_device_count, per the build plan (SURVEY.md §4).
jax may already be imported by the interpreter's sitecustomize (axon
environments), so the platform is forced via jax.config, not env vars.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("JAX_TPU_TESTS") == "1":
    # real-chip mode: run tests/test_tpu_only.py against the TPU backend
    # (f32; x64 is unsupported on TPU)
    jax.config.update("jax_platforms", "axon,cpu")
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
