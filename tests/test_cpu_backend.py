"""Native C++ ExSUM backend: correctness vs oracle, thread-count invariance
(the reference's CTest matrix runs 1..N threads and `mpirun -np 2`), and
cross-backend bit agreement with the JAX paths."""

import numpy as np
import pytest

import exblas_tpu as xb
from exblas_tpu.cpu_backend import exsum_cpu
from oracle import assert_same_bits, exact_sum


CASES = [
    ("naive", lambda n: xb.init_naive(n)),
    ("illcond", lambda n: xb.init_ill_cond(n, 1e30, seed=1)),
    ("wide", lambda n: xb.init_fpuniform(n, 600, 300, seed=2) *
        np.where(np.random.RandomState(3).rand(n) < 0.5, -1, 1)),
    ("subnormal", lambda n: np.resize(
        [5e-324, 3e-320, -1e-310, 2.0**-1074], n)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_exsum_cpu_vs_oracle(name, gen):
    x = gen(10000)
    assert_same_bits(exsum_cpu(x), exact_sum(x), name)


@pytest.mark.parametrize("nt", [1, 2, 3, 8])
def test_exsum_cpu_thread_invariance(nt):
    x = xb.init_ill_cond(50000, 1e28, seed=4)
    ref = exsum_cpu(x, num_threads=1)
    assert_same_bits(exsum_cpu(x, num_threads=nt), ref, f"nt={nt}")


def test_exsum_cpu_matches_jax_backend():
    x = xb.init_fpuniform(4096, 40, 10, seed=5)
    assert_same_bits(exsum_cpu(x), xb.exsum(x, impl="xla"), "cross-backend")


def test_exsum_cpu_specials():
    assert np.isnan(exsum_cpu(np.array([1.0, np.nan])))
    assert exsum_cpu(np.array([np.inf, 1.0])) == np.inf
    assert np.isnan(exsum_cpu(np.array([np.inf, -np.inf])))
    assert exsum_cpu(np.array([])) == 0.0


def test_exsum_cpu_overflowing_fpe_path():
    # forces constant expansion overflow: alternating huge/small magnitudes
    rng = np.random.RandomState(6)
    x = rng.uniform(-1, 1, 5000) * np.exp2(rng.randint(-1000, 1000, 5000))
    assert_same_bits(exsum_cpu(x), exact_sum(x), "fpe-overflow")


def test_exsum_cpu_fpe_overflow_near_dblmax():
    # TwoSum of huge same-sign operands overflows fl(a+b) -> the FPE must be
    # bypassed (exact limb deposit), not poisoned with NaN (ADVICE r1).
    x = np.array([1e308, 1e308, -1e308, -1e308])
    assert exsum_cpu(x) == 0.0
    assert exsum_cpu(np.array([1.5e308, 1.5e308])) == np.inf
    assert exsum_cpu(np.array([-1.5e308, -1.5e308])) == -np.inf
    # exactly at the round-to-nearest overflow boundary 2^1024 - 2^970
    dmax = np.finfo(np.float64).max
    half_ulp = 2.0 ** 970
    assert exsum_cpu(np.array([dmax, half_ulp])) == np.inf
    # just below the boundary rounds back to DBL_MAX
    assert exsum_cpu(np.array([dmax, half_ulp, -2.0 ** -1074])) == dmax
