"""Test configuration: run everything on a simulated 8-device CPU mesh.

This sandbox registers the remote-TPU (axon) PJRT backend in every Python
process via sitecustomize and force-sets JAX_PLATFORMS, so plain env vars are
not enough — we must override the jax config before any backend is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
