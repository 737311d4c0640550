"""ExTRSV: spec-exact oracle test (the routine's documented semantics are
deterministic, so an oracle can replay them with exact rationals), accuracy
vs true solve (reference bound: inf-norm <= 1e-13,
tests/test.extrsv.gpu.cpp:144), and blocking/reproducibility checks."""

from fractions import Fraction

import numpy as np
import pytest

import exblas_tpu as xb


def oracle_trsv_lower(a, b, unit=False):
    """Replay the documented semantics with exact rationals: exact residual
    accumulators, correctly rounded Round + divide at each step."""
    n = len(b)
    acc = [Fraction(float(v)) for v in b]
    x = np.empty(n)
    for i in range(n):
        num = float(acc[i])  # correctly rounded Round()
        if unit:
            xi = num
        else:
            with np.errstate(all="ignore"):
                q = Fraction(float(num)) / Fraction(float(a[i, i]))
            xi = float(q)  # correctly rounded divide
        x[i] = xi
        for j in range(i + 1, n):
            acc[j] -= Fraction(float(a[j, i])) * Fraction(xi)
    return x


def assert_bits_equal(got, want, msg):
    got, want = np.asarray(got), np.asarray(want)
    same = got.view(np.uint64) == want.view(np.uint64)
    assert same.all(), f"{msg}: idx {int(np.argmax(~same))}"


@pytest.mark.parametrize("n", [4, 32, 96])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_extrsv_lower_vs_spec_oracle(n, diag):
    a = xb.init_fpuniform_tr_matrix("L", diag, n, 8, 0, seed=91)
    b = xb.init_fpuniform(n, 8, 0, seed=92)
    got = xb.extrsv("L", "N", diag, a, b, impl="xla")
    want = oracle_trsv_lower(a, b, unit=(diag == "U"))
    assert_bits_equal(got, want, f"n={n} diag={diag}")


def test_extrsv_upper_and_trans():
    n = 64
    au = xb.init_fpuniform_tr_matrix("U", "N", n, 8, 0, seed=93)
    b = xb.init_fpuniform(n, 8, 0, seed=94)
    # upper solve == reversed lower solve on the flipped matrix
    got = xb.extrsv("U", "N", "N", au, b, impl="xla")
    want = oracle_trsv_lower(au[::-1, ::-1], b[::-1])[::-1]
    assert_bits_equal(got, want, "upper")
    # 'T' on the lower-stored transpose must equal 'N' on the upper
    got_t = xb.extrsv("L", "T", "N", au.T, b, impl="xla")
    assert_bits_equal(got_t, got, "trans")


def test_extrsv_accuracy_vs_exact_solve():
    """Reference oracle structure (tests/test.extrsv.gpu.cpp:30-92): compare
    against an exact-rational solve of the same float system, inf-norm
    relative error <= 1e-13."""
    n = 128
    a = xb.init_fpuniform_tr_matrix("L", "N", n, 6, 0, seed=95)
    b = xb.init_fpuniform(n, 4, 0, seed=96)
    from fractions import Fraction as F
    xe = [F(0)] * n
    for i in range(n):
        r = F(float(b[i])) - sum(
            F(float(a[i, j])) * xe[j] for j in range(i))
        xe[i] = r / F(float(a[i, i]))
    x_exact = np.array([float(v) for v in xe])
    x = xb.extrsv("L", "N", "N", a, b, impl="xla")
    relerr = np.max(np.abs(x - x_exact)) / np.max(np.abs(x_exact))
    assert relerr < 1e-13, relerr


def test_extrsv_block_size_invariance():
    """Same bits regardless of internal blocking: solve sizes that hit
    different _choose_block() paths against the spec oracle."""
    for n in (24, 128):  # block 8 vs 128
        a = xb.init_fpuniform_tr_matrix("L", "N", n, 10, 0, seed=97 + n)
        b = xb.init_fpuniform(n, 10, 0, seed=98 + n)
        got = xb.extrsv("L", "N", "N", a, b, impl="xla")
        want = oracle_trsv_lower(a, b)
        assert_bits_equal(got, want, f"n={n}")


def test_extrsv_fpe1_baseline():
    n = 16
    a = xb.init_fpuniform_tr_matrix("L", "N", n, 4, 0, seed=99)
    b = xb.init_fpuniform(n, 4, 0, seed=100)
    base = xb.extrsv("L", "N", "N", a, b, fpe=1)
    import scipy.linalg as sla
    want = sla.solve_triangular(a, b, lower=True)
    assert np.allclose(base, want, rtol=1e-5)


def test_extrsv_errors():
    a = xb.init_fpuniform_tr_matrix("L", "N", 4, 4, 0, seed=101)
    b = xb.init_fpuniform(4, 4, 0, seed=102)
    with pytest.raises(ValueError):
        xb.extrsv("X", "N", "N", a, b)
    with pytest.raises(ValueError):
        xb.extrsv("L", "N", "N", a, b[:3])
    with pytest.raises(ValueError):
        xb.extrsv("L", "N", "N", a, b, fpe=11)


def test_extrsv_pallas_kernel_interpret():
    """The left-looking Pallas kernel (kernels/trsv_kernel.py), run in
    Pallas TPU *interpret* mode on CPU, must be bit-identical to the XLA
    spec path -- n=200 pads to 2 blocks of 128, exercising the seed,
    GEMV-chunk, diagonal-solve, and padding branches in one (slow,
    interpreted) run."""
    from jax.experimental.pallas import tpu as pltpu

    for n, seed in ((200, 104),):
        a = xb.init_fpuniform_tr_matrix("L", "N", n, 12, -6, seed=seed)
        b = xb.init_fpuniform(n, 12, -6, seed=seed + 10)
        want = xb.extrsv("L", "N", "N", a, b, impl="xla")
        with pltpu.force_tpu_interpret_mode():
            got = xb.extrsv("L", "N", "N", a, b, impl="pallas")
        assert_bits_equal(got, want, f"pallas-interpret n={n}")
