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


def exact_sum(xs) -> float:
    """Correctly rounded sum of finite doubles."""
    total = Fraction(0)
    for v in np.asarray(xs, dtype=np.float64).ravel():
        total += Fraction(float(v))
    return float(total)


def exact_dot(a, b) -> float:
    """Correctly rounded dot product of finite doubles."""
    total = Fraction(0)
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    for x, y in zip(a, b):
        total += Fraction(float(x)) * Fraction(float(y))
    return float(total)


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
