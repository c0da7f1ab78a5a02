"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that sharding code paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). The flags must be set before JAX initializes its backend.
"""

import os
import sys

# Force CPU: the ambient environment points JAX_PLATFORMS at the axon TPU
# tunnel, whose per-dispatch latency makes tests ~100x slower; tests must be
# hermetic and run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config-level
# setting below wins as long as it runs before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(42)
