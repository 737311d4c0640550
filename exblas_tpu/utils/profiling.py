"""Tracing / profiling helpers.

TPU analog of the reference's compile-time EXBLAS_TIMING instrumentation
(SURVEY §5): wall-clock harnesses live in utils.timing / utils.bench_utils;
this module adds device-level traces via the JAX profiler, viewable in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace around a block of work.

    Example::

        with profiling.trace("/tmp/exblas_trace"):
            xb.exsum(x)
    """
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named sub-span inside a trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)
