"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding tests exercise real
multi-device paths without TPU hardware. Set MAGPIE_TEST_TPU=1 to run on
whatever platform JAX picks up.
"""

import os

if not os.environ.get("MAGPIE_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The env var alone is not honored when a TPU plugin is installed; the
    # config flag takes priority.
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
