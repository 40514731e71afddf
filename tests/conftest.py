"""Test configuration.

All tests run on CPU with a virtual 8-device mesh so that sharding tests work
without real multi-chip hardware (SURVEY.md §4: the reference has no test suite;
this pyramid is ours).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
