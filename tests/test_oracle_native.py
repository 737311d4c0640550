"""Cross-validation of the native C++ oracle (csrc/oracle.cpp) against the
Python exact-rational oracle: three independent implementations of the same
correctly-rounded semantics must agree bit for bit."""

import numpy as np
import pytest

import exblas_tpu as xb
from oracle import (
    assert_same_bits,
    exact_dot,
    exact_sum_with_specials,
    native_dot,
    native_sum,
)
from fuzz import exact_dot_with_specials


CASES = [
    ("naive", lambda rng, n: xb.init_naive(n)),
    ("illcond", lambda rng, n: xb.init_ill_cond(n, 1e30, seed=7)),
    ("full-range", lambda rng, n: xb.init_fpuniform(n, 600, -320, seed=8)
        * np.where(rng.rand(n) < 0.5, -1, 1)),
    ("subnormal", lambda rng, n: np.resize(
        [5e-324, -3e-320, 2.0 ** -1074, 1e308, -1e308], n)),
    ("cancel", lambda rng, n: np.resize([1e300, -1e300, 1e-300], n)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_native_sum_matches_fraction(name, gen):
    rng = np.random.RandomState(1)
    x = gen(rng, 4321)
    assert_same_bits(native_sum(x), exact_sum_with_specials(x), name)


def test_native_sum_specials():
    assert np.isnan(native_sum([1.0, np.nan]))
    assert native_sum([np.inf, 1.0]) == np.inf
    assert native_sum([-np.inf, 1.0]) == -np.inf
    assert np.isnan(native_sum([np.inf, -np.inf]))
    assert native_sum([]) == 0.0
    assert native_sum([1e308, 1e308]) == np.inf  # overflow rounds to inf
    dmax = np.finfo(np.float64).max
    assert native_sum([dmax, 2.0 ** 970]) == np.inf  # boundary
    assert native_sum([dmax, 2.0 ** 970, -2.0 ** -1074]) == dmax


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_native_dot_matches_fraction(name, gen):
    rng = np.random.RandomState(2)
    a = gen(rng, 1777)
    b = gen(np.random.RandomState(3), 1777)[::-1].copy()
    assert_same_bits(native_dot(a, b), exact_dot_with_specials(a, b), name)


def test_native_dot_specials_and_underflow():
    assert np.isnan(native_dot([np.inf, 1.0], [0.0, 1.0]))  # 0 * inf
    assert native_dot([np.inf, 1.0], [2.0, 1.0]) == np.inf
    assert native_dot([-np.inf], [2.0]) == -np.inf
    # full product underflow range: 2^-1074 * 2^-1074 kept exactly
    assert_same_bits(
        native_dot([2.0 ** -537, 5e-324], [2.0 ** -537, 5e-324]),
        exact_dot([2.0 ** -537, 5e-324], [2.0 ** -537, 5e-324]),
        "underflow")


def test_native_random_cross_check():
    rng = np.random.RandomState(9)
    for trial in range(20):
        n = int(rng.randint(1, 500))
        x = rng.uniform(-1, 1, n) * np.exp2(rng.randint(-320, 300, n))
        assert_same_bits(native_sum(x), exact_sum_with_specials(x),
                         f"sum trial {trial}")
        y = rng.uniform(-1, 1, n) * np.exp2(rng.randint(-320, 300, n))
        assert_same_bits(native_dot(x, y), exact_dot_with_specials(x, y),
                         f"dot trial {trial}")
