"""Input generators: ranges, shapes, determinism (reference common.cpp)."""

import numpy as np

import exblas_tpu as xb


def test_fpuniform_exponent_range():
    x = xb.init_fpuniform(5000, 12, 4, seed=1)
    e = np.frexp(x)[1] - 1  # value in [2^e, 2^(e+1))
    assert e.min() >= 4 - 12 and e.max() < 4 + 1
    assert (x > 0).all()  # neg_ratio=1: all positive
    assert np.array_equal(x, xb.init_fpuniform(5000, 12, 4, seed=1))


def test_fpuniform_matrix_and_triangular():
    m = xb.init_fpuniform_matrix(6, 9, 8, 0, seed=2)
    assert m.shape == (6, 9) and (m > 0).all()
    tl = xb.init_fpuniform_tr_matrix("L", "N", 8, 4, 0, seed=3)
    assert np.triu(tl, 1).sum() == 0 and (np.diag(tl) != 0).all()
    tu = xb.init_fpuniform_tr_matrix("U", "U", 8, 4, 0, seed=4)
    assert np.tril(tu, -1).sum() == 0
    assert (np.diag(tu) == 1.0).all()  # unit diagonal


def test_lognormal():
    x = xb.init_lognormal(1000, 0.0, 2.0, seed=5)
    assert (x > 0).all()
    lm = xb.init_lognormal_matrix(4, 5, seed=6)
    assert lm.shape == (4, 5)
    lt = xb.init_lognormal_tr_matrix("L", "U", 6, seed=7)
    assert (np.diag(lt) == 1.0).all()


def test_ill_cond_dynamic_range_and_signs():
    # Ogita 6.1 generates half the vector at exponents up to log2(c)/2: for
    # c = 1e24 expect ~2^40 dynamic range and mixed signs (it conditions dot
    # products; plain-sum condition is dominated by the largest term).
    x = xb.init_ill_cond(2000, 1e24, seed=8)
    nz = np.abs(x[x != 0])
    assert nz.max() / nz.min() > 2.0 ** 30
    assert (x > 0).any() and (x < 0).any()
    assert np.array_equal(x, xb.init_ill_cond(2000, 1e24, seed=8))


def test_naive():
    x = xb.init_naive(7)
    assert (x == 1.1).all() and x.shape == (7,)
