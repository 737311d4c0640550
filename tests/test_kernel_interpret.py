"""Interpret-mode (CPU) runs of the ExSUM / ExDOT streaming Pallas kernels.

Direct CPU coverage of the kernel code paths that the hardware tests
exercise on TPU: the single-window no-select deposit fast path vs the
multi-window select loop, the static-shift digit-plane decomposition
(ExDOT), the tree-halving phase reduction, renorm cadence, and the
special/zero/subnormal side paths.  Every case must be bit-identical to
the XLA reference implementation (same exact value, same rounding).

Reference counterparts: ExSUM.FPE.cl:230-388, ExDOT.FPE.cl:226-270 --
the reference validates GPU kernels against the CPU superaccumulator the
same way (tests/test.exsum.gpu.cpp).
"""

import numpy as np
import pytest

import jax

from exblas_tpu.core.ieee import split_f64


def _sum_bits_interpret(x, rows):
    from jax.experimental.pallas import tpu as pltpu
    from exblas_tpu.ops.kernels.sum_kernel import exsum_bits_pallas

    b = split_f64(np.asarray(x, np.float64))
    with pltpu.force_tpu_interpret_mode():
        return np.uint64(exsum_bits_pallas(b.hi, b.lo, rows=rows))


def _dot_bits_interpret(a, b, rows):
    from jax.experimental.pallas import tpu as pltpu
    from exblas_tpu.ops.kernels.dot_kernel import exdot_bits_pallas

    ab = split_f64(np.asarray(a, np.float64))
    bb = split_f64(np.asarray(b, np.float64))
    with pltpu.force_tpu_interpret_mode():
        return np.uint64(exdot_bits_pallas(ab.hi, ab.lo, bb.hi, bb.lo,
                                           rows=rows))


def _sum_xla_bits(x):
    import exblas_tpu as xb

    return np.float64(xb.exsum(x, impl="xla")).view(np.uint64)


def _dot_xla_bits(a, b):
    import exblas_tpu as xb

    return np.float64(xb.exdot(a, b, impl="xla")).view(np.uint64)


SUM_CASES = [
    # (name, generator) -- narrow hits the no-select fast path, wide the
    # multi-window loop, mixed the special/zero side passes
    ("narrow", lambda xb: xb.init_fpuniform(3000, 1, 0, seed=11)),
    ("wide", lambda xb: xb.init_fpuniform(3000, 300, -150, seed=12)),
    ("illcond", lambda xb: xb.init_ill_cond(2000, 1e25, seed=13)),
    ("zeros+subnormal", lambda xb: np.concatenate([
        np.zeros(97), xb.init_fpuniform(500, 40, -1070, seed=14),
        np.array([5e-324, -5e-324, 2.2e-308]),
    ])),
    ("specials", lambda xb: np.concatenate([
        xb.init_fpuniform(300, 3, 0, seed=15), np.array([np.inf]),
    ])),
]


@pytest.mark.parametrize("name,gen", SUM_CASES, ids=[c[0] for c in SUM_CASES])
@pytest.mark.parametrize("rows", [8, 64])
def test_exsum_kernel_interpret(name, gen, rows):
    import exblas_tpu as xb

    x = np.asarray(gen(xb), np.float64)
    got = _sum_bits_interpret(x, rows)
    want = _sum_xla_bits(x)
    assert got == want, f"{name}: {got:#x} != {int(want):#x}"


DOT_CASES = [
    ("narrow", 2, 0),      # all products share a base limb: fast path
    ("wide", 60, -30),     # multi-window deposits
    ("very-wide", 400, -200),
]


@pytest.mark.parametrize("name,emax,emin", DOT_CASES,
                         ids=[c[0] for c in DOT_CASES])
def test_exdot_kernel_interpret(name, emax, emin):
    import exblas_tpu as xb

    a = xb.init_fpuniform(2000, emax, emin, seed=21)
    b = xb.init_fpuniform(2000, emax, emin, seed=22)
    got = _dot_bits_interpret(a, b, rows=8)
    want = _dot_xla_bits(a, b)
    assert got == want, f"{name}: {got:#x} != {int(want):#x}"


def test_exdot_kernel_interpret_mixed_specials():
    import exblas_tpu as xb

    a = np.concatenate([xb.init_fpuniform(500, 30, -15, seed=23),
                        np.array([0.0, 5e-324, np.inf, 1.0])])
    b = np.concatenate([xb.init_fpuniform(500, 30, -15, seed=24),
                        np.array([3.0, 5e-324, 2.0, 0.0])])
    got = _dot_bits_interpret(a, b, rows=8)
    want = _dot_xla_bits(a, b)
    assert got == want


def test_exdot_kernel_interpret_cancellation():
    """Products cancel to a tiny residual: exercises deep canonicalize +
    round in-kernel."""
    import exblas_tpu as xb

    a = xb.init_fpuniform(600, 10, 0, seed=25)
    b = xb.init_fpuniform(600, 10, 0, seed=26)
    a2 = np.concatenate([a, a, np.array([2.0**-500])])
    b2 = np.concatenate([b, -b, np.array([2.0**-500])])
    got = _dot_bits_interpret(a2, b2, rows=8)
    want = _dot_xla_bits(a2, b2)
    assert got == want
    assert np.uint64(got).view(np.float64) == 2.0**-1000
