"""Tracing / profiling helpers.

The reference's only instrumentation is per-iteration wall-clock prints
(``/root/reference/train.py:209,227-237``).  Here: `jax.profiler` trace
capture around training steps (viewable in TensorBoard / Perfetto), named
trace annotations, and a step timer that distinguishes host time from
device time via ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_capture(logdir: str):
    """Capture a device trace for the enclosed block:

        with trace_capture(run_dir + "/profile"):
            for _ in range(10): train_step(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall/device step timing: ``with timer.step(): ...`` then
    ``timer.last_host``, ``timer.last_device`` (device time requires passing
    the step output to ``stop``)."""

    def __init__(self):
        self.last_host = 0.0
        self.last_device = 0.0

    @contextlib.contextmanager
    def step(self, block_on=None):
        t0 = time.perf_counter()
        yield
        self.last_host = time.perf_counter() - t0
        if block_on is not None:
            jax.block_until_ready(block_on)
            self.last_device = time.perf_counter() - t0
