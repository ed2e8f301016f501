"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh (the driver
separately dry-runs the real multi-chip path); numerics tests run in f32 to
match TPU behavior.
"""

import os

# Hard-override: the ambient environment pins JAX_PLATFORMS to the
# (single-chip, remotely-compiled) TPU tunnel, which is the bench target but
# far too slow for a test matrix. The interpreter's sitecustomize imports jax
# before this file runs, so the env var alone is too late — we must also flip
# the already-read jax config. XLA_FLAGS is still read at first CPU-client
# creation, so setting it here (before any jax.devices() call) works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
