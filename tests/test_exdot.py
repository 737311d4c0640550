"""ExDOT correctness vs exact rational oracle, incl. condition-number sweep
1e8..1e32 (BASELINE.md / reference tests/test.exdot.gpu.cpp)."""

import numpy as np
import pytest

import exblas_tpu as xb
from oracle import assert_same_bits, exact_dot


@pytest.mark.parametrize("cond", [1e8, 1e16, 1e24, 1e32])
def test_exdot_ill_conditioned(cond):
    n = 2000
    a = xb.init_ill_cond(n, cond, seed=21)
    b = xb.init_ill_cond(n, cond, seed=22)
    got = xb.exdot(a, b, impl="xla")
    assert_same_bits(got, exact_dot(a, b), f"cond={cond}")


@pytest.mark.parametrize("n", [1, 13, 1024])
def test_exdot_distributions(n):
    a = xb.init_fpuniform(n, 40, 10, seed=23)
    b = xb.init_lognormal(n, 0.0, 3.0, seed=24)
    assert_same_bits(xb.exdot(a, b, impl="xla"), exact_dot(a, b), f"n={n}")


def test_exdot_underflowing_products_exact():
    """Products below the double underflow threshold are kept exactly --
    stronger than the reference (TwoProdFMA residual underflow)."""
    a = np.array([1e-200, 2e-170, -3e-160, 1.0])
    b = np.array([1e-200, 5e-170, 7e-160, 2.0**-1074])
    assert_same_bits(xb.exdot(a, b, impl="xla"), exact_dot(a, b), "underflow")
    # pure-subnormal products summing to something representable
    a2 = np.array([2.0**-1074] * 8)
    b2 = np.array([2.0**500] * 8)
    assert_same_bits(xb.exdot(a2, b2, impl="xla"), exact_dot(a2, b2), "subn")


def test_exdot_specials():
    assert np.isnan(xb.exdot(np.array([np.nan]), np.array([1.0]), impl="xla"))
    assert np.isnan(xb.exdot(np.array([np.inf]), np.array([0.0]), impl="xla"))
    assert xb.exdot(np.array([np.inf]), np.array([2.0]), impl="xla") == np.inf
    assert xb.exdot(np.array([np.inf]), np.array([-2.0]), impl="xla") == -np.inf
    assert np.isnan(
        xb.exdot(np.array([np.inf, 1.0]), np.array([1.0, -np.inf]), impl="xla")
    )


def test_exdot_signs_and_cancellation():
    rng = np.random.RandomState(25)
    a = rng.uniform(-1, 1, 512) * np.exp2(rng.randint(-700, 700, 512))
    b = rng.uniform(-1, 1, 512) * np.exp2(rng.randint(-320, 300, 512))
    assert_same_bits(xb.exdot(a, b, impl="xla"), exact_dot(a, b), "wide")


def test_exdot_shuffle_reproducible():
    a = xb.init_ill_cond(1024, 1e28, seed=26)
    b = xb.init_ill_cond(1024, 1e28, seed=27)
    ref = xb.exdot(a, b, impl="xla")
    rng = np.random.RandomState(28)
    for _ in range(3):
        p = rng.permutation(len(a))
        assert_same_bits(xb.exdot(a[p], b[p], impl="xla"), ref, "shuffle")


@pytest.mark.parametrize("fpe,ee", [(0, False), (2, False), (4, True),
                                    (6, True), (8, False)])
def test_exdot_variant_agreement(fpe, ee):
    a = xb.init_fpuniform(777, 30, 0, seed=29)
    b = xb.init_fpuniform(777, 30, 0, seed=30)
    ref = xb.exdot(a, b, fpe=3, impl="xla")
    assert_same_bits(xb.exdot(a, b, fpe=fpe, early_exit=ee, impl="xla"),
                     ref, f"fpe={fpe}")
