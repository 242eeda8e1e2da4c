"""Test configuration: force an 8-device virtual CPU platform before JAX init.

Multi-chip hardware is not available in CI; all sharding tests run on a virtual
8-device CPU mesh (the TPU-native analog of a fake distributed backend — see
SURVEY.md §4).
"""
import os

# Hard override (the environment may pre-set an accelerator platform, e.g.
# the axon TPU tunnel, whose sitecustomize register() also calls
# jax.config.update("jax_platforms", ...), trumping env vars): the unit suite
# always runs on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
