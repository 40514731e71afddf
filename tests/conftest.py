"""Test configuration.

All tests run on CPU with a virtual 8-device mesh so that sharding tests work
without real multi-chip hardware (SURVEY.md §4: the reference has no test
suite; this pyramid is ours).

NOTE: the jaxtyping pytest plugin imports jax before this conftest runs, and
jax snapshots env vars at import — so JAX_PLATFORMS must be applied through
jax.config, not os.environ. XLA_FLAGS is still read at (lazy) backend init,
so setting it here works as long as no test touched a device yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
