"""Cross-plane MXU ExDOT (dot_mxu) vs exact oracles, in interpret mode.

Covers the full three-tier auto dispatcher (ops/exdot.py): per-vector
sampled-spread routing, sampled-anchor fast path with in-kernel coverage
checking, exact-anchor retry, and VPU fallback -- every tier must be
bit-identical to the exact-rational oracle / the XLA path.  (Hardware
equivalents live in test_tpu_kernels.py.)

Reference counterpart: the reference asserts all ExDOT variants agree
bitwise (self-consistency in tests/test.exdot.gpu.cpp); here the
MXU/VPU/XLA paths play those roles.
"""

from __future__ import annotations

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from exblas_tpu.core.ieee import split_f64
from exblas_tpu.ops.exdot import _exdot_bits_mxu_auto

from oracle import exact_dot


def _auto_bits(a, b):
    ab = split_f64(np.asarray(a, np.float64))
    bb = split_f64(np.asarray(b, np.float64))
    with pltpu.force_tpu_interpret_mode():
        return np.uint64(_exdot_bits_mxu_auto(ab.hi, ab.lo, bb.hi, bb.lo))


def _check(a, b, want=None):
    got = _auto_bits(a, b)
    if want is None:
        want = exact_dot(np.asarray(a, np.float64),
                         np.asarray(b, np.float64))
    want = np.float64(want).view(np.uint64)
    assert got == want, f"got {got:#x} want {want:#x}"


def test_fast_path_uniform():
    rng = np.random.default_rng(31)
    _check(rng.uniform(-1, 1, 3000), rng.uniform(-1, 1, 3000))


def test_fast_path_zeros_and_signs():
    rng = np.random.default_rng(32)
    a = rng.uniform(-1, 1, 2000)
    b = rng.uniform(-1, 1, 2000)
    a[::5] = 0.0
    b[::7] = 0.0
    b[::3] *= -1.0
    _check(a, b)


def test_all_negative_times_positive():
    rng = np.random.default_rng(33)
    _check(-np.abs(rng.uniform(0.1, 1, 2200)),
           np.abs(rng.uniform(0.1, 1, 2200)))


def test_cancellation_exact_zero():
    rng = np.random.default_rng(34)
    a = rng.uniform(-1, 1, 1000)
    b = rng.uniform(-1, 1, 1000)
    _check(np.concatenate([a, a]), np.concatenate([b, -b]), want=0.0)


def test_asymmetric_spreads_route_on_max():
    """a narrow, b wide: routes the asymmetric (3,4)/(4,3) tier -- b's
    103-bit spread picks 4 windows, a's narrow spread only 3."""
    import exblas_tpu as xb

    a = xb.init_fpuniform(3000, 2, 0, seed=35)
    b = xb.init_fpuniform(3000, 50, -25, seed=36)
    _check(a, b)
    _check(b, a)


def test_illcond_nw5_tier():
    """Ogita ill-conditioned dot data (condition 1e30) rides the 160-bit
    tier on its side only -- the (5,3) asymmetric branch (the narrow
    second vector keeps 3 windows); huge condition falls back to the
    VPU kernel."""
    import exblas_tpu as xb

    a = xb.init_ill_cond(3000, 1e30, seed=37)
    rng = np.random.default_rng(38)
    b = rng.uniform(0.5, 2.0, 3000)
    _check(a, b)
    _check(xb.init_fpuniform(2000, 200, -100, seed=39),
           xb.init_fpuniform(2000, 2, 0, seed=40))   # spread > 160: VPU


def test_retry_exact_anchor():
    rng = np.random.default_rng(41)
    a = rng.uniform(0.5, 1, 30000)
    b = rng.uniform(0.5, 1, 30000)
    a[77] = 2.0**40  # above sampled slack; true spread fits 96 bits
    _check(a, b)


def test_vpu_fallback_unsampled_huge_outlier():
    rng = np.random.default_rng(42)
    a = rng.uniform(-1, 1, 30000)
    b = rng.uniform(-1, 1, 30000)
    a[12345] = 1e300   # in-kernel flag -> exact retry -> VPU
    _check(a, b)


def test_vpu_fallback_hidden_tiny_subnormal():
    rng = np.random.default_rng(43)
    a = rng.uniform(-1, 1, 3000)
    b = rng.uniform(-1, 1, 3000)
    b[7] = 5e-324      # hi-invisible: only the in-kernel check sees it
    _check(a, b)


def test_subnormal_products():
    """Products underflowing double range are absorbed exactly (stronger
    than the reference's silently-underflowing TwoProductFMA residual)."""
    rng = np.random.default_rng(44)
    a = rng.uniform(0.5, 1, 2000) * 2.0**-520
    b = rng.uniform(0.5, 1, 2000) * 2.0**-520
    _check(a, b)


@pytest.mark.parametrize("val", [np.inf, -np.inf, np.nan])
def test_specials_fall_back(val):
    rng = np.random.default_rng(45)
    a = rng.uniform(0.5, 1, 1500)
    b = rng.uniform(0.5, 1, 1500)
    a[5] = val
    got = _auto_bits(a, b).view(np.float64)
    if np.isnan(val):
        assert np.isnan(got)
    else:
        assert got == val    # times positive b[5]


def test_padding_edge_sizes():
    rng = np.random.default_rng(46)
    for n in (1, 127, 8192, 8193, 65536, 65537):
        _check(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n))


def test_acc_ladder_superacc_and_merge():
    """The Superacc twin (_exdot_acc_mxu_auto): absolute DOT_FORMAT limbs,
    mergeable bit-exactly with accumulators from other backends (the
    distributed wire format)."""
    import exblas_tpu as xb
    from exblas_tpu.ops.exdot import _exdot_acc_mxu_auto, exdot_acc
    from exblas_tpu.core.rounding import round_superacc_to_f64_bits

    rng = np.random.default_rng(47)
    a1, b1 = rng.uniform(-1, 1, 2600), rng.uniform(-1, 1, 2600)
    a2 = xb.init_fpuniform(2000, 40, -20, seed=48)
    b2 = xb.init_fpuniform(2000, 40, -20, seed=49)
    ab, bb = split_f64(a1), split_f64(b1)
    with pltpu.force_tpu_interpret_mode():
        acc1 = _exdot_acc_mxu_auto(ab.hi, ab.lo, bb.hi, bb.lo)
    acc2 = exdot_acc(a2, b2, impl="xla")
    got = np.uint64(np.asarray(round_superacc_to_f64_bits(acc1 + acc2)))
    want = np.float64(exact_dot(np.concatenate([a1, a2]),
                                np.concatenate([b1, b2]))).view(np.uint64)
    assert got == want
    # sign-magnitude absolute shift: negative and deep-subnormal states
    for a, b in ((-np.abs(rng.uniform(0.1, 1, 2500)),
                  np.abs(rng.uniform(0.1, 1, 2500))),
                 (rng.uniform(0.5, 1, 2000) * 2.0**-530,
                  rng.uniform(0.5, 1, 2000) * 2.0**-530)):
        ab, bb = split_f64(np.asarray(a)), split_f64(np.asarray(b))
        with pltpu.force_tpu_interpret_mode():
            acc = _exdot_acc_mxu_auto(ab.hi, ab.lo, bb.hi, bb.lo)
        got = np.uint64(np.asarray(round_superacc_to_f64_bits(acc)))
        assert got == np.float64(exact_dot(a, b)).view(np.uint64)
