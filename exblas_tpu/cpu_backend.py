"""Native C++ CPU backend (ctypes) for ExSUM.

Parity component for the reference's CPU library, which ships blas1/ExSUM
only (reference src/cpu/blas/CMakeLists.txt:61; TBB/OpenMP orchestration in
src/cpu/blas/blas1/ExSUM.cpp).  Our implementation (csrc/exsum_cpu.cpp) uses
a per-thread size-8 floating-point expansion over an integer superaccumulator
in the same 112-limb base-2^20 format as the TPU kernels, merged exactly
across OpenMP threads -- bit-identical for any thread count/schedule, and
bit-identical to the TPU backends (all are correctly rounded exact sums).

The final rounding here goes through exact Python big-int rationals, so this
backend is also an independent oracle for the JAX rounding code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from fractions import Fraction

import numpy as np

from .core.types import L_SUM, LIMB_BITS

_LIB = None


def _build_library() -> str:
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "exsum_cpu.cpp")
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "exblas_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, "libexsum_cpu.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        tmp = tempfile.mktemp(suffix=".so", dir=cache_dir)
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", src, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    return out


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_library())
        lib.exsum_cpu_acc.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.exsum_cpu_acc.restype = None
        lib.exsum_cpu_num_limbs.restype = ctypes.c_int
        assert lib.exsum_cpu_num_limbs() == L_SUM
        _LIB = lib
    return _LIB


def exsum_cpu_acc(x, num_threads: int = 0):
    """Exact sum via the native backend -> (limbs int64 (L_SUM,), special)."""
    x = np.ascontiguousarray(x, dtype=np.float64).ravel()
    limbs = np.zeros(L_SUM, np.int64)
    special = np.zeros(3, np.int64)
    _lib().exsum_cpu_acc(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(x.size),
        limbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        special.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(num_threads),
    )
    return limbs, special


def round_limbs_exact(limbs, special) -> float:
    """Correctly rounded conversion via exact big-int rationals."""
    nan_c, pinf, ninf = (int(v) for v in special)
    if nan_c > 0 or (pinf > 0 and ninf > 0):
        return float("nan")
    if pinf > 0:
        return float("inf")
    if ninf > 0:
        return float("-inf")
    v = 0
    for j, limb in enumerate(limbs):
        v += int(limb) << (LIMB_BITS * j)
    if v == 0:
        return 0.0
    # Exact value is v / 2^1074.  float(Fraction) raises OverflowError past
    # DBL_MAX instead of rounding to inf; the round-to-nearest-even overflow
    # boundary is 2^1024 - 2^970 (midpoint above DBL_MAX = 2^1024 - 2^971,
    # tie rounds away since DBL_MAX's mantissa is odd).
    overflow_num = (1 << 2098) - (1 << 2044)  # (2^1024 - 2^970) * 2^1074
    if v >= overflow_num:
        return float("inf")
    if v <= -overflow_num:
        return float("-inf")
    return float(Fraction(v, 1 << 1074))


def exsum_cpu(x, num_threads: int = 0) -> float:
    """Reproducible, correctly rounded sum on the host CPU (OpenMP)."""
    limbs, special = exsum_cpu_acc(x, num_threads)
    return round_limbs_exact(limbs, special)
