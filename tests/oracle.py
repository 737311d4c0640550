"""Exact oracles built on Python Fractions.

``float(Fraction)`` in CPython is correctly rounded (it reduces to big-int
true division, which is correctly rounded), so an exact rational sum/dot
followed by a single float() conversion is precisely the semantics ExBLAS
promises -- the Python equivalent of the reference's MPFR-2098-bit oracle
(tests/test.exsum.cpu.cpp:24-38).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np


# Round-to-nearest overflow boundary: values with |v| >= 2^1024 - 2^970
# round to infinity (the midpoint above DBL_MAX rounds away since DBL_MAX's
# mantissa is odd); float(Fraction) raises OverflowError instead.
_OVERFLOW_BOUNDARY = Fraction((1 << 2098) - (1 << 2044), 1 << 1074)


def _round_fraction(total: Fraction) -> float:
    if total >= _OVERFLOW_BOUNDARY:
        return math.inf
    if total <= -_OVERFLOW_BOUNDARY:
        return -math.inf
    return float(total)


def exact_sum(xs) -> float:
    """Correctly rounded sum of finite doubles."""
    total = Fraction(0)
    for v in np.asarray(xs, dtype=np.float64).ravel():
        total += Fraction(float(v))
    return _round_fraction(total)


def exact_dot(a, b) -> float:
    """Correctly rounded dot product of finite doubles."""
    total = Fraction(0)
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    for x, y in zip(a, b):
        total += Fraction(float(x)) * Fraction(float(y))
    return _round_fraction(total)


def exact_sum_with_specials(xs) -> float:
    """Sum semantics incl. NaN/Inf: NaN or (+Inf and -Inf) -> NaN; one-signed
    infinities -> that infinity; else correctly rounded finite sum."""
    xs = np.asarray(xs, dtype=np.float64).ravel()
    if np.isnan(xs).any():
        return math.nan
    pos = np.isposinf(xs).any()
    neg = np.isneginf(xs).any()
    if pos and neg:
        return math.nan
    if pos:
        return math.inf
    if neg:
        return -math.inf
    return exact_sum(xs[np.isfinite(xs)])


def bits_of(x: float) -> int:
    return int(np.float64(x).view(np.uint64))


def assert_same_bits(a: float, b: float, msg: str = ""):
    ba, bb = bits_of(a), bits_of(b)
    assert ba == bb, (
        f"{msg}: bits differ: {a!r} (0x{ba:016x}) vs {b!r} (0x{bb:016x})"
    )


def assert_same_bits_arr(got, want, msg: str = ""):
    """Elementwise bit equality of two float64 arrays (NaN == NaN)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    assert got.shape == want.shape, f"{msg}: shape {got.shape}!={want.shape}"
    same = got.view(np.uint64) == want.view(np.uint64)
    # any-NaN payload counts as equal to any NaN
    same |= np.isnan(got) & np.isnan(want)
    assert same.all(), (
        f"{msg}: {int((~same).sum())}/{same.size} elements differ; first "
        f"at {np.unravel_index(int(np.argmax(~same.ravel())), got.shape)}: "
        f"{got.ravel()[np.argmax(~same.ravel())]!r} vs "
        f"{want.ravel()[np.argmax(~same.ravel())]!r}"
    )


# ---------------------------------------------------------------------------
# Native C++ oracle (csrc/oracle.cpp): same semantics at native speed, used
# for large fuzz campaigns and as a third independent implementation
# (cross-checked against the Fraction oracle in test_oracle_native.py).
# ---------------------------------------------------------------------------

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        import ctypes
        import os
        import subprocess
        import tempfile

        src = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "csrc", "oracle.cpp")
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "exblas_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        out = os.path.join(cache_dir, "liboracle.so")
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            tmp = tempfile.mktemp(suffix=".so", dir=cache_dir)
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", src, "-o",
                            tmp], check=True, capture_output=True)
            os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.oracle_sum.argtypes = [dp, ctypes.c_int64]
        lib.oracle_sum.restype = ctypes.c_double
        lib.oracle_dot.argtypes = [dp, dp, ctypes.c_int64]
        lib.oracle_dot.restype = ctypes.c_double
        _NATIVE = lib
    return _NATIVE


def native_sum(xs) -> float:
    """Correctly rounded sum incl. NaN/Inf semantics, via the C++ oracle."""
    import ctypes

    x = np.ascontiguousarray(xs, dtype=np.float64).ravel()
    return _native().oracle_sum(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.size)


def native_dot(a, b) -> float:
    """Correctly rounded dot incl. NaN/Inf semantics, via the C++ oracle."""
    import ctypes

    a = np.ascontiguousarray(a, dtype=np.float64).ravel()
    b = np.ascontiguousarray(b, dtype=np.float64).ravel()
    dp = ctypes.POINTER(ctypes.c_double)
    return _native().oracle_dot(a.ctypes.data_as(dp),
                                b.ctypes.data_as(dp), a.size)
