"""Profiling helpers: device-accurate timers and jax.profiler traces.

Replaces vision3d's CudaRuntimeProfiler/CpuRuntimeProfiler context managers
(vision3d/utils/profiling.py:6-70). Device timing blocks until ready (the
cuda-synchronize equivalent); trace() wraps jax.profiler for xprof/
tensorboard viewing.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class DeviceTimer:
    """Context manager timing a block including device completion."""

    def __init__(self, name: str = "", sync_value=None):
        self.name = name
        self.elapsed = 0.0
        self._sync_value = sync_value

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_value is not None:
            jax.block_until_ready(self._sync_value)
        self.elapsed = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def runtime_profiler(name: str, timers=None):
    """Keyed timing block feeding a diffreg_tpu.utils.logging.Timers."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if timers is not None:
            timers.meters[name].update(dt)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/diffreg_trace"):
    """jax.profiler trace context (view with xprof / tensorboard)."""
    with jax.profiler.trace(log_dir):
        yield
