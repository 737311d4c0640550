"""MXU byte-plane ExGEMV (gemv_mxu) vs the exact XLA path.

Runs the Pallas TPU kernel in *interpret* mode on CPU; every case must be
bit-identical to the XLA segment-sum reference (dot_rows_acc_xla +
round_rows), including the auto-dispatch ladder, fallbacks, beta modes,
specials, and subnormals.  (Hardware equivalents live in
test_tpu_kernels.py.)
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from exblas_tpu.core.ieee import split_f64
from exblas_tpu.ops.exgemv import (_gemv_bits_auto, _gemv_bits_jit,
                                   _scalar_bits)


def _bits_xla(a, z_vecscale_alpha, x, beta, y, beta_mode):
    ab = split_f64(a)
    xb = split_f64(x)
    yb = split_f64(y if y is not None else np.zeros(a.shape[0]))
    ah, al = _scalar_bits(z_vecscale_alpha)
    bh, bl = _scalar_bits(beta)
    return np.asarray(
        _gemv_bits_jit(ab.hi, ab.lo, xb.hi, xb.lo, ah, al, bh, bl,
                       yb.hi, yb.lo, "xla", beta_mode, 128))


def _bits_auto(a, alpha, x, beta, y, beta_mode):
    ab = split_f64(a)
    xb = split_f64(x)
    yb = split_f64(y if y is not None else np.zeros(a.shape[0]))
    ah, al = _scalar_bits(alpha)
    bh, bl = _scalar_bits(beta)
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            _gemv_bits_auto(ab.hi, ab.lo, xb.hi, xb.lo, ah, al, bh, bl,
                            yb.hi, yb.lo, beta_mode, 128))


def _check(a, x, alpha=1.0, beta=0.0, y=None, label=""):
    beta_mode = ("zero" if beta == 0.0 else
                 "one" if beta == 1.0 else "general")
    got = _bits_auto(a, alpha, x, beta, y, beta_mode)
    want = _bits_xla(a, alpha, x, beta, y, beta_mode)
    neq = got != want
    assert not neq.any(), (
        f"{label}: {int(neq.sum())}/{neq.size} rows differ; first at "
        f"{int(np.argmax(neq))}: got {got[np.argmax(neq)]:#x} want "
        f"{want[np.argmax(neq)]:#x}")


@pytest.mark.parametrize("m,k", [(130, 300), (128, 256), (64, 100)])
def test_mxu_gemv_uniform(m, k):
    rng = np.random.default_rng(11)
    a = rng.uniform(0.5, 1.0, (m, k)) * np.where(
        rng.uniform(size=(m, k)) < 0.5, -1.0, 1.0)
    a.ravel()[::13] = 0.0
    x = rng.uniform(0.5, 1.0, (k,)) * np.where(
        rng.uniform(size=(k,)) < 0.5, -1.0, 1.0)
    _check(a, x, label=f"uniform {m}x{k}")


def test_mxu_gemv_alpha_beta():
    rng = np.random.default_rng(12)
    m, k = 129, 257
    a = rng.uniform(-1.0, 1.0, (m, k))
    x = rng.uniform(-1.0, 1.0, (k,))
    y = rng.uniform(-4.0, 4.0, (m,))
    _check(a, x, alpha=3.7, beta=2.5, y=y, label="alpha/beta")
    _check(a, x, alpha=-0.125, beta=1.0, y=y, label="beta=1")
    _check(a, x, alpha=1.0, beta=0.0, y=None, label="beta=0")


def test_mxu_gemv_row_anchors():
    """Rows at wildly different scales (per-row anchors must localize)."""
    rng = np.random.default_rng(13)
    m, k = 128, 256
    a = rng.uniform(0.5, 1.0, (m, k))
    scales = np.exp2(rng.integers(-300, 300, (m,)).astype(np.float64))
    a = a * scales[:, None]
    x = rng.uniform(0.5, 1.0, (k,))
    _check(a, x, label="row anchors")


def test_mxu_gemv_rung2_and_fallback():
    rng = np.random.default_rng(14)
    m, k = 64, 256
    # spread ~ 78 bits within each row -> needs the (3, 3) rung
    a = rng.uniform(0.5, 1.0, (m, k))
    a[:, ::3] *= np.float64(2.0) ** -25
    x = rng.uniform(0.5, 1.0, (k,))
    _check(a, x, label="rung2 a-spread")
    # z spread ~ 83 bits -> rung 2 via z
    a2 = rng.uniform(0.5, 1.0, (m, k))
    x2 = rng.uniform(0.5, 1.0, (k,))
    x2[::3] *= np.float64(2.0) ** -30
    _check(a2, x2, label="rung2 z-spread")
    # spread > 96 bits -> exact VPU fallback
    a3 = rng.uniform(0.5, 1.0, (m, k))
    a3[:, ::5] *= np.float64(2.0) ** -60
    _check(a3, x, label="fallback wide a")


def test_mxu_gemv_tiny_and_subnormal():
    rng = np.random.default_rng(15)
    m, k = 64, 256
    # hi-invisible nonzero subnormals force the a_lo coverage pass and,
    # with normal-range anchors, the VPU fallback -- bits must still match
    a = rng.uniform(0.5, 1.0, (m, k))
    a[:, 7] = 5e-324
    x = rng.uniform(0.5, 1.0, (k,))
    _check(a, x, label="tiny subnormal in a")
    # all-subnormal rows stay on the MXU path
    a2 = rng.uniform(0.5, 1.0, (m, k)) * 2.0 ** -1060
    _check(a2, x, label="subnormal rows")
    # subnormal z
    x2 = rng.uniform(0.5, 1.0, (k,)) * 2.0 ** -1060
    a3 = rng.uniform(0.5, 1.0, (m, k))
    _check(a3, x2, label="subnormal z")


def test_mxu_gemv_specials():
    rng = np.random.default_rng(16)
    m, k = 64, 256
    a = rng.uniform(0.5, 1.0, (m, k))
    a[3, 5] = np.inf
    a[9, 0] = -np.inf
    a[17, 100] = np.nan
    x = rng.uniform(0.5, 1.0, (k,))
    _check(a, x, label="specials in a")
    x2 = x.copy()
    x2[50] = np.inf
    _check(rng.uniform(0.5, 1.0, (m, k)), x2, label="inf in z")
    # beta*y specials
    y = rng.uniform(-1.0, 1.0, (m,))
    y[5] = np.nan
    y[11] = np.inf
    _check(a, x, beta=2.0, y=y, label="special beta*y")


def test_mxu_gemv_spill_invariance():
    """k-spill path: forcing a spill every k-tile must not change bits
    (the production cadence spills every 128 tiles = 32768 columns; the
    magnitude bounds are analytic, the *logic* is exercised here)."""
    from exblas_tpu.ops.kernels.gemv_mxu import (analyze_gemv_rows,
                                                 analyze_z, gemv_bits_mxu)

    rng = np.random.default_rng(18)
    m, k = 64, 1536        # 6 k-tiles
    # gemv_bits_mxu is called below the dispatcher, so the data must honor
    # its coverage contract (per-row spread <= 64 bits): magnitudes in
    # [0.5, 1) keep every element's spread at 53-54 bits.
    sgn = lambda shape: np.where(rng.uniform(size=shape) < 0.5, -1.0, 1.0)
    a = rng.uniform(0.5, 1.0, (m, k)) * sgn((m, k))
    x = rng.uniform(0.5, 1.0, (k,)) * sgn((k,))
    ab, xb = split_f64(a), split_f64(x)
    with pltpu.force_tpu_interpret_mode():
        ea, _, _ = analyze_gemv_rows(ab.hi, ab.lo)
        f, _, _ = analyze_z(xb.hi, xb.lo)
        outs = []
        for st in (1, 2, 128):
            hi, lo = gemv_bits_mxu(ab.hi, ab.lo, xb.hi, xb.lo, ea, f,
                                   spill_tiles=st)
            outs.append((np.asarray(hi).astype(np.uint64) << 32)
                        | np.asarray(lo))
    want = _bits_xla(a, 1.0, x, 0.0, None, "zero")
    for st, got in zip((1, 2, 128), outs):
        assert (got == want).all(), f"spill_tiles={st}"


def test_mxu_gemv_spill_renorm():
    """>= RENORM_SPILLS spills triggers the in-kernel carry pass; bits
    must be unchanged (cancellation-heavy data maximizes limb traffic)."""
    from exblas_tpu.ops.kernels.gemv_mxu import (analyze_gemv_rows,
                                                 analyze_z, gemv_bits_mxu)

    rng = np.random.default_rng(20)
    m, k = 8, 5120         # 20 k-tiles; spill_tiles=1 -> renorm at spill 16
    sgn = lambda shape: np.where(rng.uniform(size=shape) < 0.5, -1.0, 1.0)
    a = rng.uniform(0.5, 1.0, (m, k)) * sgn((m, k))
    x = rng.uniform(0.5, 1.0, (k,)) * sgn((k,))
    ab, xb = split_f64(a), split_f64(x)
    with pltpu.force_tpu_interpret_mode():
        ea, _, _ = analyze_gemv_rows(ab.hi, ab.lo)
        f, _, _ = analyze_z(xb.hi, xb.lo)
        hi, lo = gemv_bits_mxu(ab.hi, ab.lo, xb.hi, xb.lo, ea, f,
                               spill_tiles=1)
    got = (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(lo)
    want = _bits_xla(a, 1.0, x, 0.0, None, "zero")
    assert (got == want).all()


def test_mxu_gemv_multi_tile_auto():
    """Multiple k-tiles through the full dispatcher: uniform(-1,1) data has
    ~70-80-bit row spreads (tiny draws near zero), exercising the (3,3)
    rung at k > 256."""
    rng = np.random.default_rng(19)
    m, k = 48, 1024
    a = rng.uniform(-1.0, 1.0, (m, k))
    x = rng.uniform(-1.0, 1.0, (k,))
    _check(a, x, label="multi-tile auto")


def test_mxu_gemv_cancellation():
    """Massive cancellation: the exact path must survive it bitwise."""
    rng = np.random.default_rng(17)
    m, k = 64, 256
    a = rng.uniform(0.5, 1.0, (m, k // 2))
    a = np.concatenate([a, -a], axis=1)        # rows sum to exactly 0 vs x=1
    x = np.ones((k,))
    _check(a, x, label="exact cancellation")
    # near-total cancellation with epsilon remainders
    a2 = np.concatenate([a[:, :k // 2], -a[:, :k // 2] * (1 + 2.0 ** -52)],
                        axis=1)
    _check(a2, x, label="epsilon cancellation")


def test_mxu_gemv_deep_subnormal_beta():
    """Products below the relative window's abs-limb 0 with beta != 0.

    A deep-subnormal row anchors the relative window below DOT-format
    bit 0 (q0 + j < 0 in the epilogue): the straddling canonical digit
    must fold into limb 0 exactly, not drop.  Regression for a bug where
    all below-range digits were silently discarded (product bits down to
    2^-2148 lost whenever e_base < r0 - 2020), e.g. this case returned
    0.0 instead of 2^-1074.
    """
    m, k = 8, 32
    tiny = 5e-324                               # 2^-1074
    a = np.full((m, k), tiny)
    x = np.full(k, tiny)                        # products = 2^-2148 each
    y = np.full(m, tiny)
    # exact: 32*2^-2148 + 0.5*2^-1074; the 2^-2143 term breaks the
    # 2^-1075 round-to-even tie upward -> 2^-1074
    _check(a, x, alpha=1.0, beta=0.5, y=y, label="deep subnormal beta")
    # same with sign-flipped rows (negative canonical digits fold too)
    _check(-a, x, alpha=1.0, beta=0.5, y=y, label="deep subnormal neg")
    # beta=1 and a k too small to straddle: window entirely below limb 0
    # except the straddler
    _check(a[:, :1], x[:1], alpha=1.0, beta=1.0, y=y,
           label="single deep product")


def test_wide_range_rung44():
    """128-bit (nwa=4, nwz=4) rung: wide-range A and x ride the MXU
    (previously the exact VPU fallback).
    """
    import exblas_tpu as xb

    a = xb.init_fpuniform_matrix(96, 200, 50, -25, seed=50)
    x = xb.init_fpuniform(200, 50, -25, seed=52)
    _check(a, x, label="wide 50 beta=0")
    y = xb.init_fpuniform(96, 10, -5, seed=53)
    _check(a, x, alpha=2.5, beta=3.5, y=y, label="wide 50 beta=3.5")
    a2 = xb.init_fpuniform_matrix(64, 100, 90, -45, seed=54)
    x2 = xb.init_fpuniform(100, 2, 0, seed=55)
    _check(a2, x2, label="spread~143 -> (5,4) rung")
    a3 = xb.init_fpuniform_matrix(64, 128, 30, -1060, seed=56)
    x3 = xb.init_fpuniform(128, 5, 0, seed=57)
    _check(a3, x3, beta=1.0, y=xb.init_fpuniform(64, 3, -900, seed=58),
           label="deep subnormal rung44 beta=1")


def test_wide_range_rungs_extended():
    """Round-3 wide rungs (5,4)/(6,5)/(8,6): A spreads up to 256 bits and
    z spreads up to 192 bits stay on the MXU path (the log word-shifter
    in _slice_byte_words); past 256/192 the exact VPU fallback holds."""
    import exblas_tpu as xb

    # ~150-bit row spreads -> (5,4)
    a = xb.init_fpuniform_matrix(64, 128, 97, -48, seed=60)
    x = xb.init_fpuniform(128, 40, -20, seed=61)
    _check(a, x, label="rung (5,4)")
    # ~183-bit spreads (both sides) -> (6,5)
    a2 = xb.init_fpuniform_matrix(64, 128, 130, -65, seed=62)
    x2 = xb.init_fpuniform(128, 100, -50, seed=63)
    _check(a2, x2, label="rung (6,5)")
    y = xb.init_fpuniform(64, 10, -5, seed=64)
    _check(a2, x2, alpha=1.5, beta=2.5, y=y, label="rung (6,5) beta")
    # ~250-bit A spread -> (8,6)
    a3 = xb.init_fpuniform_matrix(64, 128, 197, -98, seed=65)
    x3 = xb.init_fpuniform(128, 60, -30, seed=66)
    _check(a3, x3, label="rung (8,6)")


def test_wide_range_rungs_round4():
    """Round-4 top rungs (12,7)/(16,7): A spreads to 384/512 bits stay on
    the MXU; past 512 bits on A (or 224 on z) the exact VPU fallback
    holds."""
    import exblas_tpu as xb

    x3 = xb.init_fpuniform(128, 60, -30, seed=66)
    # ~330-bit A spread -> (12,7)
    a4 = xb.init_fpuniform_matrix(64, 128, 275, -137, seed=67)
    _check(a4, x3, label="rung (12,7)")
    # ~490-bit A spread -> (16,7)
    a5 = xb.init_fpuniform_matrix(64, 128, 440, -220, seed=68)
    _check(a5, x3, label="rung (16,7)")
    y = xb.init_fpuniform(64, 10, -5, seed=69)
    _check(a5, x3, alpha=-0.5, beta=3.0, y=y, label="rung (16,7) beta")
    # past the widest rung -> VPU fallback (A spread > 512)
    a6 = xb.init_fpuniform_matrix(64, 128, 480, -240, seed=70)
    _check(a6, x3, label="spread>512 fallback")
    # z spread past 224 bits -> VPU fallback via the z side
    x4 = xb.init_fpuniform(128, 200, -100, seed=71)
    _check(a4, x4, label="z-spread>224 fallback")


def test_gemv_cacc_split_negatives():
    """Sign-mask accumulator hi/lo split: all-negative A maximizes the
    negm*z digit sums; spill_tiles=1 forces the split every k-tile so the
    hi rows actually accumulate (the k <= 2^25 cap's correctness story).
    """
    from exblas_tpu.ops.kernels.gemv_mxu import (analyze_gemv_rows,
                                                 analyze_z, gemv_bits_mxu)

    rng = np.random.default_rng(68)
    m, k = 8, 2048         # 8 k-tiles, spill (and split) at every one
    a = -rng.uniform(0.5, 1.0, (m, k))
    x = rng.uniform(0.5, 1.0, (k,)) * np.where(
        rng.uniform(size=(k,)) < 0.5, -1.0, 1.0)
    ab, xb = split_f64(a), split_f64(x)
    with pltpu.force_tpu_interpret_mode():
        ea, _, _ = analyze_gemv_rows(ab.hi, ab.lo)
        f, _, _ = analyze_z(xb.hi, xb.lo)
        hi, lo = gemv_bits_mxu(ab.hi, ab.lo, xb.hi, xb.lo, ea, f,
                               spill_tiles=1)
    got = (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(lo)
    want = _bits_xla(a, 1.0, x, 0.0, None, "zero")
    assert (got == want).all()
    # beta path (XLA epilogue recombines the split in int64)
    y = rng.uniform(-1.0, 1.0, (m,))
    yb = split_f64(y)
    bh, bl = _scalar_bits(2.5)
    with pltpu.force_tpu_interpret_mode():
        hi, lo = gemv_bits_mxu(ab.hi, ab.lo, xb.hi, xb.lo, ea, f,
                               y_hi=yb.hi, y_lo=yb.lo, beta_hi=bh,
                               beta_lo=bl, beta_mode="general",
                               spill_tiles=1)
    got = (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(lo)
    want = _bits_xla(a, 1.0, x, 2.5, y, "general")
    assert (got == want).all()
