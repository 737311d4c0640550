"""ExSUM correctness: correctly-rounded results vs an exact rational oracle,
variant agreement, and reproducibility under permutation -- mirroring the
reference's test matrix (tests/test.exsum.cpu.cpp; CTest configs in
src/cpu/blas/blas1/CMakeLists.txt:18-36)."""

import numpy as np
import pytest

import exblas_tpu as xb
from oracle import assert_same_bits, bits_of, exact_sum, exact_sum_with_specials


CASES = [
    ("naive", lambda n: xb.init_naive(n)),
    ("std_dyn_range", lambda n: xb.init_fpuniform(n, 2, 0, seed=1)),
    ("large_dyn_range", lambda n: xb.init_fpuniform(n, 50, 20, seed=2)),
    ("wide_signed", lambda n: xb.init_fpuniform(n, 200, 90, seed=3) *
        np.where(np.random.RandomState(4).rand(n) < 0.5, -1.0, 1.0)),
    ("lognormal", lambda n: xb.init_lognormal(n, 0.0, 2.0, seed=5)),
    ("ill_cond_1e30", lambda n: xb.init_ill_cond(n, 1e30, seed=6)),
    ("cancellation", lambda n: np.concatenate(
        [v := xb.init_fpuniform(n // 2, 60, 30, seed=7), -v])),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("n", [1, 17, 1000, 4096])
def test_exsum_vs_oracle(name, gen, n):
    x = gen(n)
    got = xb.exsum(x, impl="xla")
    want = exact_sum(x)
    assert_same_bits(got, want, f"{name} n={n}")


def test_exsum_subnormals_and_edges():
    x = np.array([
        5e-324, -5e-324, 3e-320, 1e-310, -2.5e-310,
        np.finfo(np.float64).max, -np.finfo(np.float64).max,
        np.finfo(np.float64).tiny, 1.0, -1.0 + 2**-53,
        2.0**-1074, 2.0**1023, -(2.0**1023), 0.0, -0.0,
    ])
    assert_same_bits(xb.exsum(x, impl="xla"), exact_sum(x), "edges")


def test_exsum_single_values_roundtrip():
    rng = np.random.RandomState(0)
    vals = list(rng.uniform(-1e300, 1e300, 50))
    vals += [5e-324, -5e-324, 1e-310, 2.0**-1074 * 3, 1.7976931348623157e308]
    for v in vals:
        assert_same_bits(xb.exsum(np.array([v]), impl="xla"), v, f"single {v}")


def test_exsum_overflow_to_inf():
    x = np.array([1.7976931348623157e308] * 4)
    assert xb.exsum(x, impl="xla") == np.inf
    assert xb.exsum(-x, impl="xla") == -np.inf
    # cancelling overflow is finite and exact
    y = np.array([1.7976931348623157e308] * 4 + [-1.7976931348623157e308] * 3)
    assert_same_bits(xb.exsum(y, impl="xla"), 1.7976931348623157e308, "cancel")


def test_exsum_specials():
    assert np.isnan(xb.exsum(np.array([1.0, np.nan, 2.0]), impl="xla"))
    assert xb.exsum(np.array([1.0, np.inf]), impl="xla") == np.inf
    assert xb.exsum(np.array([-np.inf, 1.0]), impl="xla") == -np.inf
    assert np.isnan(xb.exsum(np.array([np.inf, -np.inf]), impl="xla"))
    for data in ([np.inf, np.nan], [1e308, 1e308, -np.inf]):
        got = xb.exsum(np.array(data), impl="xla")
        want = exact_sum_with_specials(data)
        assert (np.isnan(got) and np.isnan(want)) or got == want


def test_exsum_empty_and_zero():
    assert xb.exsum(np.array([]), impl="xla") == 0.0
    assert bits_of(xb.exsum(np.array([0.0, -0.0, 0.0]), impl="xla")) == 0


@pytest.mark.parametrize("fpe,ee", [(0, False), (1, False), (2, False),
                                    (3, False), (4, True), (6, True),
                                    (8, True), (8, False)])
def test_exsum_variant_agreement(fpe, ee):
    """All fpe/early_exit variants must return identical bits (reference
    tests/test.exsum.cpu.cpp:107-146)."""
    x = xb.init_fpuniform(2048, 50, 10, seed=11)
    ref = xb.exsum(x, fpe=2, early_exit=False, impl="xla")
    got = xb.exsum(x, fpe=fpe, early_exit=ee, impl="xla")
    assert_same_bits(got, ref, f"fpe={fpe} ee={ee}")


def test_exsum_shuffle_reproducible():
    """Bitwise-identical under data permutation (the reference's
    shuffle-and-rerun protocol, RNGExample.cpp:269-334)."""
    x = xb.init_ill_cond(4096, 1e24, seed=12)
    ref = xb.exsum(x, impl="xla")
    rng = np.random.RandomState(13)
    for _ in range(5):
        perm = rng.permutation(len(x))
        assert_same_bits(xb.exsum(x[perm], impl="xla"), ref, "shuffle")


def test_exsum_partition_invariance():
    """Summing chunk-partials exactly merges to the same bits for any split --
    the decomposition-invariance core claim (reference README.md:8-10)."""
    from exblas_tpu.core import accumulator as am

    x = xb.init_fpuniform(4096, 40, 5, seed=14)
    ref = xb.exsum(x, impl="xla")
    for nchunks in (2, 3, 7, 64):
        bounds = np.linspace(0, len(x), nchunks + 1).astype(int)
        accs = [xb.exsum_acc(x[a:b], impl="xla")
                for a, b in zip(bounds[:-1], bounds[1:])]
        total = accs[0]
        for a in accs[1:]:
            total = total + a
        from exblas_tpu.core.rounding import round_superacc_to_f64_bits
        got = float(np.asarray(round_superacc_to_f64_bits(total))
                    .reshape(1).view(np.float64)[0])
        assert_same_bits(got, ref, f"nchunks={nchunks}")


def test_exsum_inca_offset():
    x = xb.init_fpuniform(1024, 10, 0, seed=15)
    assert_same_bits(xb.exsum(x, inca=2, offset=1, impl="xla"),
                     exact_sum(x[1::2]), "strided")
