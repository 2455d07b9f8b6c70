"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world answer to "test multi-node without a cluster"
(SURVEY.md §4): sharding/pjit paths are exercised on
xla_force_host_platform_device_count virtual devices.
"""

import os

# Force-set: the session environment pins JAX_PLATFORMS to the TPU plugin
# (and a sitecustomize hook initializes it before user code), where every jit
# compile round-trips a tunnel — tests must stay local on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
