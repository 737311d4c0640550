"""Strong-reproducibility application studies: the reproducible path must be
bitwise identical across shuffled reruns, and the floating-point control must
actually vary (experiment sensitivity), mirroring the reference protocol
(RNGExample.cpp:269-334; kmeans test.sh sweeps)."""

import pytest

from exblas_tpu.apps import (
    gridding_experiment,
    kmeans_experiment,
    rng_sum_experiment,
    spmv_experiment,
)


def test_rng_sum_strong_reproducibility():
    r = rng_sum_experiment(n=20000, repeats=6, seed=1, impl="xla")
    assert r["repro_unique"] == 1
    assert r["repro_equals_single_pass"]
    assert r["control_unique"] > 1, "control unexpectedly reproducible"


def test_kmeans_strong_reproducibility():
    r = kmeans_experiment(n=600, nf=3, k=4, repeats=4, seed=2, impl="xla")
    assert r["repro_unique"] == 1
    assert r["control_unique"] > 1


def test_spmv_strong_reproducibility():
    r = spmv_experiment(m=100, nnz=24, repeats=4, seed=3)
    assert r["repro_unique"] == 1
    assert r["control_unique"] > 1


def test_gridding_strong_reproducibility():
    r = gridding_experiment(n_samples=2000, n_cells=8, repeats=4, seed=4,
                            impl="xla")
    assert r["repro_unique"] == 1
    assert r["control_unique"] > 1
