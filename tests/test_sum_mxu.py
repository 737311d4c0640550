"""MXU byte-plane ExSUM (sum_mxu) vs exact oracles, in interpret mode.

Covers the full three-tier auto dispatcher (ops/exsum.py):
sampled-spread routing, sampled-anchor fast path with in-kernel coverage
checking, exact-anchor retry, and VPU fallback -- every tier must be
bit-identical to math.fsum / the XLA path.  (Hardware equivalents live in
test_tpu_kernels.py.)

Reference counterpart: the reference asserts all ExSUM variants agree
bitwise (tests/test.exsum.cpu.cpp:107-146); here the MXU/VPU/XLA paths
play those roles.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from exblas_tpu.core.ieee import split_f64
from exblas_tpu.ops.exsum import _exsum_bits_mxu_auto


def _auto_bits(x):
    b = split_f64(np.asarray(x, np.float64))
    with pltpu.force_tpu_interpret_mode():
        return np.uint64(_exsum_bits_mxu_auto(b.hi, b.lo))


def _check(x, want=None):
    got = _auto_bits(x)
    if want is None:
        want = math.fsum(np.asarray(x, np.float64))
    want = np.float64(want).view(np.uint64)
    assert got == want, f"got {got:#x} want {want:#x}"


def test_fast_path_uniform():
    rng = np.random.default_rng(11)
    _check(rng.uniform(-1, 1, 3000))


def test_fast_path_zeros_mixed():
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, 2000)
    x[::5] = 0.0
    _check(x)


def test_fast_path_subnormals():
    rng = np.random.default_rng(13)
    _check(rng.uniform(-1, 1, 2500) * 2.0**-1062)


def test_fast_path_outlier_within_slack():
    rng = np.random.default_rng(14)
    x = rng.uniform(0.5, 1, 30000)
    x[999] = 40.0  # ~6 binades above the crowd: covered by anchor slack
    _check(x)


def test_retry_exact_anchor():
    rng = np.random.default_rng(15)
    x = rng.uniform(0.5, 1, 30000)
    x[77] = 2.0**40  # above slack, but true spread fits the 96-bit window
    _check(x)


def test_vpu_fallback_wide_spread():
    import exblas_tpu as xb

    _check(xb.init_fpuniform(2000, 200, -100, seed=16))


def test_vpu_fallback_outlier_huge():
    rng = np.random.default_rng(17)
    x = rng.uniform(-1, 1, 30000)
    x[12345] = 1e300  # unsampled unique max -> in-kernel flag -> fallback
    _check(x)


def test_vpu_fallback_hidden_tiny_subnormal():
    rng = np.random.default_rng(18)
    x = rng.uniform(-1, 1, 3000)
    x[7] = 5e-324  # hi-invisible: only the in-kernel check can see it
    _check(x)


@pytest.mark.parametrize("val,want", [(np.inf, np.inf), (-np.inf, -np.inf),
                                      (np.nan, np.nan)])
def test_vpu_fallback_specials(val, want):
    rng = np.random.default_rng(19)
    x = rng.uniform(-1, 1, 1500)
    x[5] = val
    got = _auto_bits(x).view(np.float64)
    if np.isnan(want):
        assert np.isnan(got)
    else:
        assert got == want


def test_overflow_saturates_to_inf():
    _check(np.full(1500, 1.7e308), want=np.inf)
    _check(np.full(1500, -1.7e308), want=-np.inf)


def test_exact_cancellation_positive_zero():
    rng = np.random.default_rng(20)
    c = rng.uniform(-1, 1, 1000)
    _check(np.concatenate([c, -c]), want=0.0)


def test_all_negative():
    rng = np.random.default_rng(21)
    _check(-np.abs(rng.uniform(0.1, 1, 2200)))


def test_near_max_cancels():
    _check(np.array([8.9e307, -8.9e307, 1.0, -1.0] * 300 + [3.5]), want=3.5)


def test_padding_edge_sizes():
    rng = np.random.default_rng(22)
    for n in (1, 127, 128, 129, 65536, 65537):
        _check(rng.uniform(-1, 1, n))


def test_wide_spread_nwa4_tier():
    """fpuniform range 50 (spread ~103 bits) fits the 128-bit window."""
    import exblas_tpu as xb

    _check(xb.init_fpuniform(3000, 50, -25, seed=41))
    _check(xb.init_fpuniform(3000, 66, -33, seed=42))   # spread ~119


def test_beyond_128_goes_vpu():
    import exblas_tpu as xb

    _check(xb.init_fpuniform(3000, 80, -40, seed=43))   # spread ~133


def test_wide_outlier_retry_nwa4():
    import exblas_tpu as xb

    x = xb.init_fpuniform(30000, 50, -25, seed=45)
    x[123] = np.ldexp(1.0, 60)   # above sampled window: retry tier
    _check(x)


def test_illcond_nwa5_tier():
    """160-bit window: ill-conditioned c=1e30 data (spread ~153) rides
    the MXU; c=1e50 (spread ~219) still falls back to the VPU kernel."""
    import exblas_tpu as xb

    _check(xb.init_ill_cond(3000, 1e30, seed=90))
    _check(xb.init_fpuniform(3000, 100, -50, seed=91))
    _check(xb.init_fpuniform(3000, 120, -60, seed=92))   # > 160: VPU
    _check(xb.init_ill_cond(3000, 1e50, seed=93))        # > 160: VPU


def test_acc_ladder_superacc_and_merge():
    """The Superacc-producing twin (_exsum_acc_mxu_auto): absolute
    SUM_FORMAT limbs from the MXU plane sums, mergeable bit-exactly with
    accumulators from other backends (the distributed wire format)."""
    import exblas_tpu as xb
    from exblas_tpu.ops.exsum import _exsum_acc_mxu_auto
    from exblas_tpu.core.rounding import round_superacc_to_f64_bits

    rng = np.random.default_rng(51)
    x1 = rng.uniform(-1, 1, 2600)
    x2 = xb.init_fpuniform(2000, 40, -20, seed=9)
    b1 = split_f64(x1)
    with pltpu.force_tpu_interpret_mode():
        a1 = _exsum_acc_mxu_auto(b1.hi, b1.lo)
    a2 = xb.exsum_acc(x2, impl="xla")
    got = np.uint64(np.asarray(round_superacc_to_f64_bits(a1 + a2)))
    want = np.float64(math.fsum(np.concatenate([x1, x2]))).view(np.uint64)
    assert got == want
    # sign-magnitude absolute shift: negative and ill-conditioned states
    for data in (-np.abs(rng.uniform(0.1, 1, 2500)),
                 xb.init_ill_cond(3000, 1e30, seed=2)):
        b = split_f64(np.asarray(data, np.float64))
        with pltpu.force_tpu_interpret_mode():
            acc = _exsum_acc_mxu_auto(b.hi, b.lo)
        got = np.uint64(np.asarray(round_superacc_to_f64_bits(acc)))
        assert got == np.float64(math.fsum(data)).view(np.uint64)


def test_resolve_anchor_guard_band():
    """Guard-band routing (kernels/sum_mxu.resolve_anchor): a sampled
    spread just below a tier boundary is resolved with the exact
    full_anchor pass (routing on an underestimate would buy a guaranteed
    in-kernel miss + full-pass retry -- observed live: ill-cond n=2^24
    sampled 126 vs true 134 put the MXU dot BELOW its VPU fallback);
    an unambiguous sampled spread is returned untouched."""
    import jax.numpy as jnp
    from exblas_tpu.ops.kernels.sum_mxu import (
        _GUARD_BITS, full_anchor, resolve_anchor, sample_anchor)

    # Construct data whose sampled spread underestimates: the extreme
    # (smallest) elements live in chunks the 1/8 sampler skips.
    n = 8192 * 33
    x = np.full(n, 1.0)
    x[8192 * 9 + 5] = np.ldexp(1.0, -130)      # widens true spread
    hi = split_f64(x).hi
    e_s, sp_s = sample_anchor(hi)
    e_f, sp_f = full_anchor(hi)
    assert int(sp_f) > int(sp_s), "sampler must miss the planted element"

    e_r, sp_r = resolve_anchor(hi, e_s, sp_s, (int(sp_s) + 4,))
    assert (int(e_r), int(sp_r)) == (int(e_f), int(sp_f))  # in band: exact
    e_r, sp_r = resolve_anchor(hi, e_s, sp_s,
                               (int(sp_s) + _GUARD_BITS + 4,))
    assert (int(e_r), int(sp_r)) == (int(e_s), int(sp_s))  # out: sampled

    # full_anchor covers every element by construction: anchor bound and
    # exponent-field lsb bound enclose all occupied bits.
    expf = (hi.astype(np.int64) >> 20) & 0x7FF
    assert int(e_f) - 8 == int(np.max(expf)) - 1023
    assert int(sp_f) == int(e_f) - (int(np.min(expf[expf >= 1])) - 1075) + 1
