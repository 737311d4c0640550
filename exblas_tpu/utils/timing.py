"""Benchmark harness: min-of-k timing with GB/s / GFLOPS reporting.

TPU analog of the reference's EXBLAS_TIMING instrumentation (rdtsc min-of-50
on CPU, clEnqueueMarker min-of-NUM_ITER on GPU; reference
src/gpu/blas/blas1/ExSUM.cpp:149-185, src/cpu/blas/blas1/ExSUM.cpp:124-165).
"""

from __future__ import annotations

import time

import jax


def bench_min(fn, *args, iters: int = 20, warmup: int = 2):
    """Return the minimum wall-clock seconds over ``iters`` runs of fn(*args).

    The result of fn is blocked on (jax.block_until_ready) so device work is
    included, mirroring the reference's event-based GPU timing.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def gb_per_s(nbytes: int, seconds: float) -> float:
    return 1e-9 * nbytes / seconds


def gflops(nflops: int, seconds: float) -> float:
    return 1e-9 * nflops / seconds
