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


# ---------------------------------------------------------------------------
# Real-data pipelines on the reference's shipped inputs (skipped when the
# reference checkout is absent)
# ---------------------------------------------------------------------------

from exblas_tpu.apps.io import reference_data_path  # noqa: E402

_SPMV_DIR = ("src", "cpu", "examples", "spmv (Parboil)", "data")


@pytest.mark.parametrize("name,shape,nnz", [
    ("jgl009.mtx", (9, 9), 50), ("fidapm05.mtx", (42, 42), 520)])
def test_spmv_real_matrix_market(name, shape, nnz):
    path = reference_data_path(*_SPMV_DIR, name)
    if path is None:
        pytest.skip("reference data not available")
    from exblas_tpu.apps import spmv

    assert spmv.main([path, "4"]) == 0


def test_mm_reader_values():
    path = reference_data_path(*_SPMV_DIR, "fidapm05.mtx")
    if path is None:
        pytest.skip("reference data not available")
    from exblas_tpu.apps.io import read_matrix_market

    m, n, rows, cols, vals = read_matrix_market(path)
    assert (m, n, len(vals)) == (42, 42, 520)
    assert rows[0] == 0 and cols[0] == 0
    assert vals[0] == 1.9555555555555
    path2 = reference_data_path(*_SPMV_DIR, "jgl009.mtx")
    m, n, rows, cols, vals = read_matrix_market(path2)
    assert (m, n, len(vals)) == (9, 9, 50)
    assert (vals == 1.0).all()  # pattern matrix


def test_kmeans_real_data():
    path = reference_data_path(
        "src", "cpu", "examples", "kmeans (Rodinia)", "data", "100")
    if path is None:
        pytest.skip("reference data not available")
    from exblas_tpu.apps import kmeans as km
    from exblas_tpu.apps.io import read_kmeans_points

    pts = read_kmeans_points(path)
    assert pts.shape == (100, 34)
    assert km.main([path, "4", "4"]) == 0


def test_gridding_real_uks():
    path = reference_data_path(
        "src", "cpu", "examples", "mri-gridding (Parboil)", "data",
        "small", "small.uks")
    if path is None:
        pytest.skip("reference data not available")
    from exblas_tpu.apps.io import read_uks

    params, samples = read_uks(path, synth_cap=20000)
    assert int(params["aquisition.numsamples"]) == 2655910
    assert samples.shape[1] == 6
    # protocol on a reduced stream (CI-speed)
    import numpy as np

    from exblas_tpu.apps.gridding import grid_repro, grid_control

    idx = np.random.RandomState(0).randint(0, 999, len(samples))
    occupied, idx = np.unique(idx, return_inverse=True)
    vals = samples[:, 0] + 1j * samples[:, 1]
    rng = np.random.RandomState(1)
    outs = set()
    for _ in range(3):
        perm = rng.permutation(len(vals))
        outs.add(grid_repro(idx[perm], vals[perm], len(occupied)).tobytes())
    assert len(outs) == 1


def test_exsum_segmented_matches_scalar():
    import numpy as np

    import exblas_tpu as xb

    rng = np.random.RandomState(3)
    x = xb.init_fpuniform(5000, 40, -20, seed=4) * np.where(
        rng.rand(5000) < 0.5, -1, 1)
    ids = rng.randint(0, 13, 5000)
    out = xb.exsum_segmented(x, ids, 13)
    for s in range(13):
        want = xb.exsum(x[ids == s], impl="xla")
        assert np.float64(out[s]).tobytes() == np.float64(want).tobytes()


def test_kmeans_device_shuffle_invariant_and_exact():
    """The fully device-resident k-means step: centers bit-identical under
    point shuffles, and equal to exact exsum/count division given the same
    membership (well-separated clusters make assignment unambiguous)."""
    import numpy as np

    import exblas_tpu as xb
    from exblas_tpu.apps.kmeans import kmeans_device

    rng = np.random.RandomState(7)
    k, nf, per = 4, 3, 200
    offs = np.array([[0.0, 0.0, 0.0], [100.0, 0, 0],
                     [0, 100.0, 0], [0, 0, 100.0]])
    pts = np.concatenate([
        offs[c] + rng.uniform(-1, 1, (per, nf)) * np.exp2(
            rng.randint(-12, 12, (per, nf)))
        for c in range(k)])
    init = offs + 0.25

    outs = set()
    mem0 = None
    for trial in range(3):
        perm = rng.permutation(len(pts))
        centers, mem = kmeans_device(pts[perm], k, iters=3, init=init)
        outs.add(centers.tobytes())
        unshuffled = np.asarray(mem)[np.argsort(perm)]
        if mem0 is None:
            mem0 = unshuffled
        else:
            assert np.array_equal(mem0, unshuffled)
    assert len(outs) == 1

    # exact oracle: per-(cluster, feature) exsum / count, correctly-rounded
    # division done in f64 on host (one op -- identical to f64_div)
    centers, mem = kmeans_device(pts, k, iters=1, init=init)
    for c in range(k):
        members = pts[np.asarray(mem) == c]
        for f in range(nf):
            want = xb.exsum(members[:, f], impl="xla") / len(members)
            assert np.float64(centers[c, f]).tobytes() == np.float64(
                want).tobytes()
