"""Mesh-shape invariance: identical bits on 1, 2, 4, 8 (virtual) devices --
the TPU-native analog of the reference's MPI tests (`mpirun -np 2` on one
host, src/cpu/blas/blas1/CMakeLists.txt:19-26) and its partition-invariance
claim (README.md:8-10)."""

import numpy as np
import pytest

import jax
import exblas_tpu as xb
from exblas_tpu.parallel import exdot_sharded, exsum_sharded, make_mesh
from oracle import assert_same_bits, exact_dot, exact_sum


def _f(bits_u64):
    return float(np.asarray(bits_u64).reshape(1).view(np.float64)[0])


def test_has_virtual_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("nd", [1, 2, 4, 8])
def test_exsum_mesh_invariance(nd):
    x = xb.init_ill_cond(10000, 1e30, seed=41)
    want = exact_sum(x)
    got = _f(exsum_sharded(x, mesh=make_mesh(nd), impl="xla"))
    assert_same_bits(got, want, f"nd={nd}")


@pytest.mark.parametrize("nd", [1, 3, 8])
def test_exsum_uneven_shards(nd):
    # n not divisible by device count: zero padding must not change bits
    x = xb.init_fpuniform(10007, 30, 5, seed=42)
    got = _f(exsum_sharded(x, mesh=make_mesh(nd), impl="xla"))
    assert_same_bits(got, exact_sum(x), f"nd={nd} uneven")


@pytest.mark.parametrize("nd", [2, 8])
def test_exdot_mesh_invariance(nd):
    a = xb.init_ill_cond(4096, 1e24, seed=43)
    b = xb.init_ill_cond(4096, 1e24, seed=44)
    got = _f(exdot_sharded(a, b, mesh=make_mesh(nd), impl="xla"))
    assert_same_bits(got, exact_dot(a, b), f"nd={nd}")


def test_specials_cross_device():
    x = np.concatenate([np.full(1000, 1.0), [np.inf], np.full(1000, 2.0)])
    got = _f(exsum_sharded(x, mesh=make_mesh(4), impl="xla"))
    assert got == np.inf
    x2 = np.concatenate([[np.inf], np.full(1000, 1.0), [-np.inf]])
    assert np.isnan(_f(exsum_sharded(x2, mesh=make_mesh(4), impl="xla")))
