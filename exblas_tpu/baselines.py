"""Non-reproducible fp64 controls.

Mirrors the reference's baseline dispatch (fpe == 1 selects DGEMV.cl /
DTRSV.*.cl, reference ExGEMV.cpp:92-94, ExTRSV.cpp:80-81): plain jnp
sum / dot / matmul / triangular solve.  On TPU these run in the emulated
"f64" (f32-pair) arithmetic -- they are the performance *and* accuracy
controls, not reproducible and not correctly rounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _dev64(x):
    return jnp.asarray(np.asarray(x, np.float64))


def sum_baseline(x) -> float:
    return float(jax.jit(jnp.sum)(_dev64(x)))


def dot_baseline(a, b) -> float:
    return float(jax.jit(jnp.dot)(_dev64(a), _dev64(b)))


def gemv_baseline(trans: str, alpha: float, a, x, beta: float = 0.0, y=None):
    a = _dev64(a)
    x = _dev64(x)
    op = a.T if trans.upper() == "T" else a

    @jax.jit
    def f(op, x, y):
        return alpha * (op @ x) + (beta * y if y is not None else 0.0)

    y = _dev64(y) if (y is not None and beta != 0.0) else None
    return np.asarray(f(op, x, y))


def gemm_baseline(a, b, c=None):
    a = _dev64(a)
    b = _dev64(b)

    @jax.jit
    def f(a, b, c):
        r = a @ b
        return r if c is None else c + r

    return np.asarray(f(a, b, _dev64(c) if c is not None else None))


def trsv_baseline(uplo: str, trans: str, diag: str, a, b):
    a = _dev64(a)
    b = _dev64(b)
    if trans.upper() == "T":
        a = a.T
        uplo = "U" if uplo.upper() == "L" else "L"

    @jax.jit
    def f(a, b):
        return jax.scipy.linalg.solve_triangular(
            a, b, lower=(uplo.upper() == "L"),
            unit_diagonal=(diag.upper() == "U"),
        )

    return np.asarray(f(a, b))
