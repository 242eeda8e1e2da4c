"""Test configuration: force an 8-device virtual CPU platform before JAX init.

Multi-chip hardware is not available in CI; all sharding tests run on a virtual
8-device CPU mesh (the TPU-native analog of a fake distributed backend — see
SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
