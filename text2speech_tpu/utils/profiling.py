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
    """Wall/device step timing::

        with timer.step() as t:
            out = step_fn(...)
            t.block_on(out)          # register what to sync on
        timer.last_host, timer.last_device

    ``last_host`` is dispatch-to-yield wall time; ``last_device``
    additionally blocks on whatever the block registered via
    ``t.block_on`` (the step's OUTPUT — it does not exist before the
    block runs, which is why block-on cannot be a ``step()`` argument)."""

    def __init__(self):
        self.last_host = 0.0
        self.last_device = 0.0

    class _Handle:
        def __init__(self):
            self.out = None

        def block_on(self, out):
            self.out = out

    @contextlib.contextmanager
    def step(self):
        h = self._Handle()
        t0 = time.perf_counter()
        yield h
        self.last_host = time.perf_counter() - t0
        if h.out is not None:
            jax.block_until_ready(h.out)
            self.last_device = time.perf_counter() - t0
