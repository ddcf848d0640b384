"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test run so
multi-chip sharding logic is testable without TPU hardware (SURVEY.md §4).
"""

import os

# Force CPU: the ambient env pins JAX_PLATFORMS=axon (the real TPU tunnel)
# and sitecustomize force-registers the axon PJRT plugin whenever
# PALLAS_AXON_POOL_IPS is set — clear both BEFORE any jax import so tests
# run on a virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize registers the axon TPU plugin at interpreter startup (before
# conftest) and pins jax_platforms; backends init lazily, so overriding the
# config here still wins as long as no array op ran yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1702)
