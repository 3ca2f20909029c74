"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding tests execute on N virtual CPU devices via
``--xla_force_host_platform_device_count``, so the full pjit/shard_map path
is exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(8886)
