"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (DP/TP collectives) are validated without a pod
by running JAX on host CPU with 8 virtual devices — the SURVEY.md §4 test
strategy. This must run before jax is imported anywhere in the test
process.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel)
# and a sitecustomize imports jax at interpreter start, so env vars are
# too late — override via jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
