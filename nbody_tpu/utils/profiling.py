"""Profiling hooks (SURVEY.md 5.1).

The reference's profiling is chrono bracketing + static ptxas register
counts (project.cu:71-73).  Here: the two-tier Stopwatch/RunTiming
(utils.timing) is the chrono analogue, and this module adds the JAX
profiler (TensorBoard-viewable traces of XLA ops, fusion, and collective
timing) as the deep-inspection tier.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a code block:

        with profiling.trace("/tmp/nbody-trace"):
            sim.run_scan(10)

    View with: tensorboard --logdir /tmp/nbody-trace
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
