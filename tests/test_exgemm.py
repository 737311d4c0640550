"""ExGEMM vs exact rational oracle (reference tests/test.exgemm.gpu.cpp uses
a per-element 2098-bit MPFR dot; ours is exact rationals)."""

from fractions import Fraction

import numpy as np
import pytest

import exblas_tpu as xb


def oracle_gemm(alpha, a, b, beta=1.0, c=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    n = b.shape[1]
    z = np.float64(alpha) * a  # fl(alpha * a)
    out = np.empty((m, n))
    for i in range(m):
        for j in range(n):
            acc = Fraction(0)
            for kk in range(k):
                acc += Fraction(float(z[i, kk])) * Fraction(float(b[kk, j]))
            if c is not None:
                if beta == 1.0:
                    acc += Fraction(float(c[i, j]))
                elif beta != 0.0:
                    acc += Fraction(beta) * Fraction(float(c[i, j]))
            out[i, j] = float(acc)
    return out


def assert_bits_equal(got, want, msg):
    got, want = np.asarray(got), np.asarray(want)
    same = got.view(np.uint64) == want.view(np.uint64)
    assert same.all(), f"{msg}: {got[~same][:3]} vs {want[~same][:3]}"


@pytest.mark.parametrize("m,k,n", [(5, 7, 9), (16, 32, 8)])
def test_exgemm_vs_oracle(m, k, n):
    a = xb.init_fpuniform_matrix(m, k, 25, 0, seed=71)
    b = xb.init_fpuniform_matrix(k, n, 25, 0, seed=72)
    c = xb.init_fpuniform_matrix(m, n, 25, 0, seed=73)
    got = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="xla")
    want = oracle_gemm(1.0, a, b, 1.0, c)
    assert_bits_equal(got, want, f"{m}x{k}x{n}")


def test_exgemm_no_c_and_transposes():
    m, k, n = 8, 12, 10
    a = xb.init_fpuniform_matrix(k, m, 30, 0, seed=74)  # will be 'T'
    b = xb.init_fpuniform_matrix(n, k, 30, 0, seed=75)  # will be 'T'
    got = xb.exgemm("T", "T", 1.0, a, b, beta=0.0, impl="xla")
    want = oracle_gemm(1.0, a.T, b.T)
    assert_bits_equal(got, want, "TT")


def test_exgemm_alpha_beta():
    m = k = n = 12
    a = xb.init_fpuniform_matrix(m, k, 20, 0, seed=76)
    b = xb.init_fpuniform_matrix(k, n, 20, 0, seed=77)
    c = xb.init_fpuniform_matrix(m, n, 20, 0, seed=78)
    got = xb.exgemm("N", "N", -2.5, a, b, beta=0.125, c=c, impl="xla")
    want = oracle_gemm(-2.5, a, b, 0.125, c)
    assert_bits_equal(got, want, "alphabeta")


def test_exgemm_k_split_invariance():
    """C = A@B must equal the exact merge of A1@B1 + A2@B2 for any k split --
    and with beta=1 chaining, running in two exgemm calls must give the same
    bits because each call rounds once... it does NOT (two roundings).
    The real invariance: one call, permuted k order."""
    m = k = n = 16
    a = xb.init_fpuniform_matrix(m, k, 40, 0, seed=79)
    b = xb.init_fpuniform_matrix(k, n, 40, 0, seed=80)
    ref = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    perm = np.random.RandomState(81).permutation(k)
    got = xb.exgemm("N", "N", 1.0, a[:, perm], b[perm, :], beta=0.0,
                    impl="xla")
    assert_bits_equal(got, ref, "ksplit")


def test_exgemm_specials():
    a = np.array([[np.inf, 1.0], [1.0, 2.0]])
    b = np.array([[1.0, 0.0], [1.0, 1.0]])
    got = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    assert got[0, 0] == np.inf
    assert np.isnan(got[0, 1])  # inf * 0
    assert got[1, 1] == 2.0


def test_exgemm_fpe1_baseline():
    a = xb.init_fpuniform_matrix(6, 6, 5, 0, seed=82)
    b = xb.init_fpuniform_matrix(6, 6, 5, 0, seed=83)
    base = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, fpe=1)
    assert np.allclose(base, a @ b, rtol=1e-6)


def test_exgemm_mxu_auto_interpret():
    """The jittable auto dispatch (MXU slice ladder + VPU fallback +
    special override), run in Pallas interpret mode on CPU, must be
    bit-identical to the XLA path for every beta mode and for specials."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    m = k = n = 128
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=61)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=62)
    c = xb.init_fpuniform_matrix(m, n, 12, -3, seed=63) * np.where(
        rng.rand(m, n) < 0.5, -1, 1)
    for beta in (0.0, 1.0, -0.75):
        want = xb.exgemm("N", "N", 1.0, a, b, beta=beta,
                         c=c if beta else None, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = xb.exgemm("N", "N", 1.0, a, b, beta=beta,
                            c=c if beta else None, impl="mxu")
        assert (got.view(np.uint64) == want.view(np.uint64)).all(), beta


def test_exgemm_mxu_auto_specials_interpret():
    from jax.experimental.pallas import tpu as pltpu

    m = k = n = 128
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=64)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=65)
    c = xb.init_fpuniform_matrix(m, n, 10, 0, seed=66)
    a[3, 5] = np.nan
    a[10, 0] = np.inf
    b[7, 20] = -np.inf
    b[0, 64] = 0.0
    c[50, 50] = np.inf
    c[60, 60] = np.nan
    want = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="mxu")
    gb, wb = got.view(np.uint64), want.view(np.uint64)
    assert (gb == wb).all()


def test_exgemm_mxu_asymmetric_rungs_interpret():
    """Mixed-spread operands select asymmetric (sa, sb) rungs: narrow A
    (64-bit window) x wide B (96/128-bit window) and the transpose-role
    case must both be bit-identical to XLA.  Exercises (8, 12), (12, 8)
    and (8, 16) dispatch."""
    from jax.experimental.pallas import tpu as pltpu

    m = k = n = 128
    a_narrow = xb.init_fpuniform_matrix(m, k, 8, 0, seed=70)
    b_wide = xb.init_fpuniform_matrix(k, n, 40, -20, seed=71)   # ~93 bits
    b_wider = xb.init_fpuniform_matrix(k, n, 70, -35, seed=72)  # ~123 bits
    for aa, bb, label in ((a_narrow, b_wide, "A8 x B12"),
                          (b_wide.T, a_narrow.T, "A12 x B8"),
                          (a_narrow, b_wider, "A8 x B16")):
        want = xb.exgemm("N", "N", 1.0, aa, bb, beta=0.0, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = xb.exgemm("N", "N", 1.0, aa, bb, beta=0.0, impl="mxu")
        assert (got.view(np.uint64) == want.view(np.uint64)).all(), label


def test_exgemm_mxu_wide_rung_interpret():
    """The round-4 top rungs (40/48 slices = 320/384 anchored bits per
    side) must stay bit-identical to XLA.  Spread ~300 bits routes to
    (40, 40); the (48, 48) rung is exercised on hardware
    (test_tpu_kernels.py) -- interpret-mode at 49*49 slice pairs is too
    slow for the CPU suite."""
    from jax.experimental.pallas import tpu as pltpu

    m = k = n = 32
    a = xb.init_fpuniform_matrix(m, k, 250, 0, seed=73)   # spread ~302
    b = xb.init_fpuniform_matrix(k, n, 250, -125, seed=74)
    want = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="mxu")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
