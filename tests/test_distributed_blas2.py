"""Sharded GEMV/GEMM mesh invariance on the virtual CPU mesh."""

import numpy as np
import pytest

import exblas_tpu as xb
from exblas_tpu.parallel import exgemm_sharded, exgemv_sharded, make_mesh


def _f(bits):
    return np.asarray(bits).view(np.float64)


@pytest.mark.parametrize("shard", ["rows", "k"])
@pytest.mark.parametrize("nd", [1, 2, 8])
def test_exgemv_sharded_mesh_invariance(shard, nd):
    m, n = 32, 64
    a = xb.init_fpuniform_matrix(m, n, 30, 0, seed=61)
    x = xb.init_fpuniform(n, 30, 0, seed=62)
    want = xb.exgemv("N", 1.5, a, x, impl="xla")
    got = _f(exgemv_sharded(a, x, alpha=1.5, mesh=make_mesh(nd),
                            shard=shard, impl="xla"))
    assert (got.view(np.uint64) == want.view(np.uint64)).all(), (shard, nd)


@pytest.mark.parametrize("shard", ["rows", "k"])
@pytest.mark.parametrize("beta", [1.0, -2.5])
def test_exgemv_sharded_beta_mesh_invariance(shard, beta):
    """beta*y deposited exactly once per output row on any mesh/sharding
    (owner deposit for rows, replicated post-merge deposit for k)."""
    from exblas_tpu.parallel import exgemv_sharded_2d, make_mesh_2d

    m, n = 32, 64
    a = xb.init_fpuniform_matrix(m, n, 30, 0, seed=65)
    x = xb.init_fpuniform(n, 30, 0, seed=66)
    y = xb.init_fpuniform(m, 35, -5, seed=67)
    want = xb.exgemv("N", -0.75, a, x, beta=beta, y=y, impl="xla")
    for nd in (1, 4, 8):
        got = _f(exgemv_sharded(a, x, alpha=-0.75, beta=beta, y=y,
                                mesh=make_mesh(nd), shard=shard,
                                impl="xla"))
        assert (got.view(np.uint64) == want.view(np.uint64)).all(), nd
    got2 = _f(exgemv_sharded_2d(a, x, alpha=-0.75, beta=beta, y=y,
                                mesh=make_mesh_2d((2, 4))))
    assert (got2.view(np.uint64) == want.view(np.uint64)).all()


@pytest.mark.parametrize("nd", [1, 4])
def test_exgemm_sharded_mesh_invariance(nd):
    m = k = n = 16
    a = xb.init_fpuniform_matrix(m, k, 25, 0, seed=63)
    b = xb.init_fpuniform_matrix(k, n, 25, 0, seed=64)
    want = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    got = _f(exgemm_sharded(a, b, mesh=make_mesh(nd), impl="xla"))
    assert (got.reshape(m, n).view(np.uint64)
            == want.view(np.uint64)).all(), nd


@pytest.mark.parametrize("beta", [1.0, -2.5])
def test_exgemm_sharded_alpha_beta_mesh_invariance(beta):
    """alpha folded per shard, exact beta*C deposited exactly once per
    element (owner for rows/2-D, replicated post-merge for k)."""
    from exblas_tpu.parallel import (exgemm_sharded_2d, exgemm_sharded_k,
                                     make_mesh_2d)

    m, k, n = 16, 24, 16
    a = xb.init_fpuniform_matrix(m, k, 25, 0, seed=71)
    b = xb.init_fpuniform_matrix(k, n, 25, 0, seed=72)
    c = xb.init_fpuniform_matrix(m, n, 35, -5, seed=73)
    want = xb.exgemm("N", "N", -0.5, a, b, beta=beta, c=c, impl="xla")
    for nd in (1, 4, 8):
        got = _f(exgemm_sharded(a, b, mesh=make_mesh(nd), impl="xla",
                                alpha=-0.5, beta=beta, c=c))
        assert (got.reshape(m, n).view(np.uint64)
                == want.view(np.uint64)).all(), nd
        gk = _f(exgemm_sharded_k(a, b, mesh=make_mesh(nd),
                                 alpha=-0.5, beta=beta, c=c))
        assert (gk.reshape(m, n).view(np.uint64)
                == want.view(np.uint64)).all(), nd
    g2 = _f(exgemm_sharded_2d(a, b, mesh=make_mesh_2d((2, 4),
                                                      ("rows", "cols")),
                              impl="xla", alpha=-0.5, beta=beta, c=c))
    assert (g2.reshape(m, n).view(np.uint64) == want.view(np.uint64)).all()


@pytest.mark.parametrize("uplo,trans,diag", [
    ("L", "N", "N"), ("U", "N", "U"), ("L", "T", "N"), ("U", "T", "N")])
def test_extrsv_sharded_mesh_invariance(uplo, trans, diag):
    """Sharded wavefront TRSV: same bits as the single-chip spec solve on
    1/2/4/8-device meshes (the reference never distributes TRSV)."""
    from exblas_tpu.parallel import extrsv_sharded

    n = 48
    rng = np.random.RandomState(83)
    m0 = xb.init_fpuniform_matrix(n, n, 20, -10, seed=84)
    a = np.tril(m0) if uplo == "L" else np.triu(m0)
    idx = np.arange(n)
    a[idx, idx] = rng.uniform(0.5, 2.0, n) * np.where(
        rng.rand(n) < 0.5, -1.0, 1.0)
    b = xb.init_fpuniform(n, 20, -10, seed=85)
    want = xb.extrsv(uplo, trans, diag, a, b, impl="xla")
    for nd in (1, 2, 4, 8):
        got = np.asarray(extrsv_sharded(uplo, trans, diag, a, b,
                                        mesh=make_mesh(nd)))
        assert (got == want.view(np.uint64)).all(), nd


def test_extrsv_sharded_zero_diag_inf():
    """Zero diagonal -> Inf/NaN propagation matches single-chip bits."""
    from exblas_tpu.parallel import extrsv_sharded

    n = 16
    a = np.tril(xb.init_fpuniform_matrix(n, n, 4, 0, seed=86))
    idx = np.arange(n)
    a[idx, idx] = 1.0
    a[5, 5] = 0.0
    b = xb.init_fpuniform(n, 4, 0, seed=87)
    want = xb.extrsv("L", "N", "N", a, b, impl="xla").view(np.uint64)
    got = np.asarray(extrsv_sharded("L", "N", "N", a, b,
                                    mesh=make_mesh(4)))
    assert (got == want).all()


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_exgemm_sharded_2d_mesh_shape_invariance(shape):
    from exblas_tpu.parallel import exgemm_sharded_2d, make_mesh_2d

    m = k = n = 16
    a = xb.init_fpuniform_matrix(m, k, 25, 0, seed=67)
    b = xb.init_fpuniform_matrix(k, n, 25, 0, seed=68)
    want = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    got = _f(exgemm_sharded_2d(
        a, b, mesh=make_mesh_2d(shape, axes=("rows", "cols")),
        impl="xla"))
    assert (got.reshape(m, n).view(np.uint64)
            == want.view(np.uint64)).all(), shape


@pytest.mark.parametrize("nd", [1, 2, 8])
def test_exgemm_sharded_k_mesh_invariance(nd):
    """Reduction-axis sharding: exact limb psum merges the k-slices; the
    mesh size must not change a bit (BLAS-3 analog of the reference's
    limb-wise MPI_Reduce, src/cpu/blas/blas1/ExSUM.cpp:266-273)."""
    from exblas_tpu.parallel import exgemm_sharded_k, make_mesh

    m, k, n = 8, 16, 12
    a = xb.init_fpuniform_matrix(m, k, 30, 0, seed=69)
    b = xb.init_fpuniform_matrix(k, n, 30, 0, seed=70)
    want = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="xla")
    got = _f(exgemm_sharded_k(a, b, mesh=make_mesh(nd)))
    assert (got.reshape(m, n).view(np.uint64)
            == want.view(np.uint64)).all(), nd


@pytest.mark.parametrize("nd", [1, 2, 4])
def test_exgemv_sharded_rows_auto_path(nd):
    """Rows-sharded GEMV through the full MXU auto dispatch (interpret
    mode): each device owns complete rows, so the single-device auto
    ladder applies per shard and bits must match the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    m, n = 32, 64
    a = xb.init_fpuniform_matrix(m, n, 12, 0, seed=71)
    x = xb.init_fpuniform(n, 12, 0, seed=72)
    want = xb.exgemv("N", 2.0, a, x, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = _f(exgemv_sharded(a, x, alpha=2.0, mesh=make_mesh(nd),
                                shard="rows", impl="auto"))
    assert (got.view(np.uint64) == want.view(np.uint64)).all(), nd


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2), (8, 1), (2, 2)])
def test_exgemv_sharded_2d_mesh_shape_invariance(shape):
    from exblas_tpu.parallel import exgemv_sharded_2d, make_mesh_2d

    m, n = 32, 64
    a = xb.init_fpuniform_matrix(m, n, 30, 0, seed=65)
    x = xb.init_fpuniform(n, 30, 0, seed=66)
    want = xb.exgemv("N", 1.5, a, x, impl="xla")
    got = _f(exgemv_sharded_2d(a, x, alpha=1.5, mesh=make_mesh_2d(shape)))
    assert (got.view(np.uint64) == want.view(np.uint64)).all(), shape
