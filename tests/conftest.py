"""Test harness: run everything on a CPU-simulated 8-device mesh.

The sandbox pre-imports jax with platforms "axon,cpu" (the TPU tunnel),
so env vars alone are too late; we switch the platform through
jax.config before any backend is initialized. Sharded training and
rendering are therefore testable without TPU hardware (SURVEY.md
section 4's strategy). Tests that specifically exercise compiled Pallas
kernels run them in interpreter mode on CPU; the real-TPU path is
covered by bench.py and the drivers.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the simulated CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
