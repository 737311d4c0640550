"""ExGEMV vs an exact rational oracle reproducing the routine's documented
semantics (z = fl(alpha*x), exact products, exact beta*y, one final rounding).
Mirrors the reference's test matrix: 'N'/'T', m != n, alpha/beta cases
(tests/test.exgemv.gpu.cpp; CTest configs src/gpu/blas/blas2/CMakeLists.txt).
"""

from fractions import Fraction

import numpy as np
import pytest

import exblas_tpu as xb
from oracle import bits_of


def oracle_gemv(trans, alpha, a, x, beta=0.0, y=None):
    a = np.asarray(a, np.float64)
    op = a.T if trans == "T" else a
    m, n = op.shape
    z = np.float64(alpha) * np.asarray(x, np.float64)  # fl(alpha*x): one fp64 mul
    out = np.empty(m)
    for i in range(m):
        acc = Fraction(0)
        for j in range(n):
            acc += Fraction(float(op[i, j])) * Fraction(float(z[j]))
        if beta == 1.0 and y is not None:
            acc += Fraction(float(y[i]))
        elif beta != 0.0 and y is not None:
            acc += Fraction(beta) * Fraction(float(y[i]))
        out[i] = float(acc)
    return out


def assert_bits_equal(got, want, msg):
    got = np.asarray(got)
    want = np.asarray(want)
    same = got.view(np.uint64) == want.view(np.uint64)
    assert same.all(), (
        f"{msg}: first diff at {int(np.argmax(~same))}: "
        f"{got[~same][:3]} vs {want[~same][:3]}"
    )


@pytest.mark.parametrize("trans", ["N", "T"])
@pytest.mark.parametrize("m,n", [(7, 13), (64, 32), (33, 96)])
def test_exgemv_vs_oracle(trans, m, n):
    a = xb.init_fpuniform_matrix(m, n, 30, 0, seed=51)
    xn = m if trans == "T" else n
    x = xb.init_fpuniform(xn, 25, 3, seed=52)
    got = xb.exgemv(trans, 1.0, a, x, impl="xla")
    want = oracle_gemv(trans, 1.0, a, x)
    assert_bits_equal(got, want, f"{trans} {m}x{n}")


@pytest.mark.parametrize("alpha,beta", [(2.5, 0.0), (1.0, 1.0),
                                        (-0.3, 0.7), (1e30, -1e-30)])
def test_exgemv_alpha_beta(alpha, beta):
    m, n = 24, 40
    a = xb.init_fpuniform_matrix(m, n, 20, 0, seed=53)
    x = xb.init_fpuniform(n, 20, 0, seed=54)
    y = xb.init_fpuniform(m, 20, 2, seed=55)
    got = xb.exgemv("N", alpha, a, x, beta=beta, y=y, impl="xla")
    want = oracle_gemv("N", alpha, a, x, beta=beta, y=y)
    assert_bits_equal(got, want, f"alpha={alpha} beta={beta}")


def test_exgemv_wide_range_and_cancellation():
    m, n = 16, 128
    rng = np.random.RandomState(56)
    a = rng.uniform(-1, 1, (m, n)) * np.exp2(rng.randint(-500, 500, (m, n)))
    x = rng.uniform(-1, 1, n) * np.exp2(rng.randint(-300, 300, n))
    got = xb.exgemv("N", 1.0, a, x, impl="xla")
    want = oracle_gemv("N", 1.0, a, x)
    assert_bits_equal(got, want, "wide")


def test_exgemv_column_permutation_invariance():
    m, n = 32, 64
    a = xb.init_fpuniform_matrix(m, n, 40, 0, seed=57)
    x = xb.init_fpuniform(n, 40, 0, seed=58)
    ref = xb.exgemv("N", 1.0, a, x, impl="xla")
    perm = np.random.RandomState(59).permutation(n)
    got = xb.exgemv("N", 1.0, a[:, perm], x[perm], impl="xla")
    assert_bits_equal(got, ref, "colperm")


def test_exgemv_specials_rows():
    a = np.array([[1.0, np.inf], [1.0, 2.0], [np.nan, 1.0]])
    x = np.array([1.0, 1.0])
    got = xb.exgemv("N", 1.0, a, x, impl="xla")
    assert got[0] == np.inf and got[1] == 3.0 and np.isnan(got[2])


def test_exgemv_fpe1_baseline_control():
    a = xb.init_fpuniform_matrix(8, 8, 5, 0, seed=60)
    x = xb.init_fpuniform(8, 5, 0, seed=61)
    base = xb.exgemv("N", 1.0, a, x, fpe=1)
    assert np.allclose(base, a @ x, rtol=1e-6)


def test_exgemv_errors():
    a = xb.init_fpuniform_matrix(4, 4, 5, 0, seed=62)
    x = xb.init_fpuniform(4, 5, 0, seed=63)
    with pytest.raises(ValueError):
        xb.exgemv("Q", 1.0, a, x)
    with pytest.raises(ValueError):
        xb.exgemv("N", 1.0, a, x[:3])
    with pytest.raises(ValueError):
        xb.exgemv("N", 1.0, a, x, beta=2.0)  # y required
    with pytest.raises(ValueError):
        xb.exgemv("N", 1.0, a, x, fpe=9)


def test_exgemv_lda_incx_incy():
    """BLAS-style flat column-major buffers + strided vectors must match
    the plain array API (reference signature include/blas2.hpp:95)."""
    m, n, lda = 7, 5, 11
    rng = np.random.RandomState(40)
    a = xb.init_fpuniform_matrix(m, n, 8, 0, seed=41)
    buf = rng.uniform(-1, 1, lda * n)
    # place A column-major into the buffer
    for j in range(n):
        buf[j * lda: j * lda + m] = a[:, j]
    x_buf = rng.uniform(-1, 1, 2 * n)
    x = x_buf[::2][:n]
    y_buf = rng.uniform(-1, 1, 3 * m)
    y = y_buf[::3][:m]

    want = xb.exgemv("N", 1.5, a, x, beta=0.5, y=y, impl="xla")
    got = xb.exgemv("N", 1.5, buf, x_buf, beta=0.5, y=y_buf, impl="xla",
                    m=m, n=n, lda=lda, incx=2, incy=3)
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_extrsv_lda_incx():
    n, lda = 6, 9
    rng = np.random.RandomState(42)
    a = xb.init_fpuniform_tr_matrix("L", "N", n, 6, 0, seed=43)
    buf = rng.uniform(-1, 1, lda * n)
    for j in range(n):
        buf[j * lda: j * lda + n] = a[:, j]
    b_buf = rng.uniform(-1, 1, 2 * n)
    b = b_buf[::2][:n]
    want = xb.extrsv("L", "N", "N", a, b, impl="xla")
    got = xb.extrsv("L", "N", "N", buf, b_buf, impl="xla",
                    n=n, lda=lda, incx=2)
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_exgemm_ld():
    m, n, k = 5, 6, 7
    lda, ldb, ldc = 9, 11, 8
    rng = np.random.RandomState(44)
    a = xb.init_fpuniform_matrix(m, k, 6, 0, seed=45)
    b = xb.init_fpuniform_matrix(k, n, 6, 0, seed=46)
    c = xb.init_fpuniform_matrix(m, n, 6, 0, seed=47)

    def colmajor(mat, ld):
        r, cc = mat.shape
        buf = rng.uniform(-1, 1, ld * cc)
        for j in range(cc):
            buf[j * ld: j * ld + r] = mat[:, j]
        return buf

    want = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="xla")
    got = xb.exgemm("N", "N", 1.0, colmajor(a, lda), colmajor(b, ldb),
                    beta=1.0, c=colmajor(c, ldc), impl="xla",
                    m=m, n=n, k=k, lda=lda, ldb=ldb, ldc=ldc)
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
