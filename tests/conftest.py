"""Test rig: force CPU backend with 8 virtual devices.

Per SURVEY.md §4.4: only one physical TPU chip exists in this environment, so
all distributed code paths (Mesh/shard_map/collectives) are exercised on an
8-fake-device CPU backend. This conftest must run before jax is imported
anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin in this environment ignores the JAX_PLATFORMS env var;
# the config update after import does take effect.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator makes every
    # test's data depend on which rng-consuming tests ran BEFORE it, so
    # adding a test anywhere could flip an unlucky draw in an unrelated
    # file (review r3: the k-means blob test flaked exactly this way).
    return np.random.default_rng(0)
