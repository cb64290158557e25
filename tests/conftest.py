"""Test configuration: force a deterministic 8-device virtual CPU mesh.

Tests never require a TPU; multi-chip sharding tests run on virtual CPU
devices (the same mechanism the driver uses for dryrun_multichip). The
environment may pre-import jax pinned to a TPU platform (JAX_PLATFORMS=axon via
sitecustomize), so we must override through jax.config before any backend is
initialised, not just via environment variables.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from multimotionfusion_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
