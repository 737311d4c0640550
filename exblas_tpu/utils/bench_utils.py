"""Amortized device timing.

The TPU in this environment sits behind a high-latency tunnel (~35 ms per
host round trip) and ``block_until_ready`` does not actually block, so naive
per-call timing is meaningless.  We therefore time R dependent iterations of
the computation inside one jitted program (input perturbed per iteration to
defeat CSE; results XOR-folded to keep the dependency) and report
``(t(R) - t(1)) / (R - 1)``.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _timed(fn, *args, reps=3):
    np.asarray(jax.block_until_ready(fn(*args)))  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args)))  # asarray forces fetch
        best = min(best, time.perf_counter() - t0)
    return best


def amortized_seconds(make_repeat_fn, args, R: int = 8, reps: int = 3):
    """make_repeat_fn(R) -> jitted fn(*args) running R dependent iterations.

    Returns estimated seconds per iteration.
    """
    f1 = make_repeat_fn(1)
    fR = make_repeat_fn(R)
    t1 = _timed(f1, *args, reps=reps)
    tR = _timed(fR, *args, reps=reps)
    return max(tR - t1, 1e-9) / (R - 1)
