"""Pallas / MXU kernel tests -- require real TPU hardware.

The CI suite (conftest pins the CPU platform) skips these; run manually:

    JAX_EXBLAS_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

with a plain TPU-visible environment (no conftest CPU pin: the env var also
disables the pin).
"""

import os

import numpy as np
import pytest

import jax

TPU = (os.environ.get("JAX_EXBLAS_TPU_TESTS") == "1"
       and jax.default_backend() == "tpu")

pytestmark = pytest.mark.skipif(
    not TPU, reason="requires real TPU (set JAX_EXBLAS_TPU_TESTS=1)")


def test_exsum_pallas_matches_xla():
    import exblas_tpu as xb
    x = xb.init_ill_cond(50000, 1e30, seed=1)
    import math
    got = xb.exsum(x, impl="pallas")
    assert np.float64(got).tobytes() == np.float64(math.fsum(x)).tobytes()


def test_exdot_pallas_exact():
    import exblas_tpu as xb
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import exact_dot
    a = xb.init_ill_cond(4096, 1e24, seed=2)
    b = xb.init_ill_cond(4096, 1e24, seed=3)
    got = xb.exdot(a, b, impl="pallas")
    assert np.float64(got).tobytes() == np.float64(exact_dot(a, b)).tobytes()


def test_gemm_mxu_matches_vpu():
    import exblas_tpu as xb
    a = xb.init_fpuniform_matrix(64, 300, 20, 0, seed=4)
    b = xb.init_fpuniform_matrix(300, 64, 20, 0, seed=5)
    mxu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="mxu")
    vpu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="pallas")
    assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all()


def test_gemv_pallas_matches_xla():
    import exblas_tpu as xb
    a = xb.init_fpuniform_matrix(200, 300, 30, 0, seed=6)
    x = xb.init_fpuniform(300, 30, 0, seed=7)
    got = xb.exgemv("N", 1.0, a, x, impl="pallas")
    want = xb.exgemv("N", 1.0, a, x, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


# ---------------------------------------------------------------------------
# ExTRSV Pallas kernel (left-looking blocked substitution)
# ---------------------------------------------------------------------------

def _trsv_case(uplo, trans, diag, n, emax, emin, seed):
    import exblas_tpu as xb
    a = xb.init_fpuniform_tr_matrix(
        "U" if (uplo == "U") ^ (trans == "T") else "L",
        diag, n, emax, emin, seed=seed)
    if trans == "T":
        a = a.T
    b = xb.init_fpuniform(n, emax, emin, seed=seed + 1)
    got = xb.extrsv(uplo, trans, diag, a, b, impl="pallas")
    want = xb.extrsv(uplo, trans, diag, a, b, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


@pytest.mark.parametrize("uplo,trans,diag", [
    ("L", "N", "N"), ("L", "N", "U"), ("U", "N", "N"), ("L", "T", "N"),
])
def test_trsv_pallas_matches_xla_variants(uplo, trans, diag):
    _trsv_case(uplo, trans, diag, 300, 8, 0, seed=20)


def test_trsv_pallas_wide_dynamic_range():
    _trsv_case("L", "N", "N", 256, 60, -60, seed=30)


def test_trsv_pallas_specials_and_subnormals():
    import exblas_tpu as xb
    n = 256
    rng = np.random.RandomState(31)
    a = np.tril(rng.uniform(-1, 1, (n, n)))
    np.fill_diagonal(a, rng.uniform(1, 2, n))
    a[50, 3] = 5e-324
    a[10, 10] = 0.0           # divide by zero -> inf, then inf propagation
    b = rng.uniform(-1, 1, n)
    b[5] = 2.0 ** -1074
    b[3] = np.nan
    b[60] = np.inf
    got = xb.extrsv("L", "N", "N", a, b, impl="pallas")
    want = xb.extrsv("L", "N", "N", a, b, impl="xla")
    gb = got.view(np.uint64)
    wb = want.view(np.uint64)
    assert (gb == wb).all()


# ---------------------------------------------------------------------------
# MXU GEMM: beta modes, specials, auto dispatch (jittable lax.switch ladder)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("beta", [0.0, 1.0, 2.5])
def test_gemm_mxu_beta_matches_vpu(beta):
    import exblas_tpu as xb
    rng = np.random.RandomState(40)
    m = k = n = 256
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=41)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=42)
    c = xb.init_fpuniform_matrix(m, n, 12, -3, seed=43) * np.where(
        rng.rand(m, n) < 0.5, -1, 1)
    mxu = xb.exgemm("N", "N", 1.0, a, b, beta=beta,
                    c=c if beta else None, impl="mxu")
    vpu = xb.exgemm("N", "N", 1.0, a, b, beta=beta,
                    c=c if beta else None, impl="pallas")
    assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all()


def test_gemm_mxu_specials_override():
    import exblas_tpu as xb
    m = k = n = 256
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=44)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=45)
    c = xb.init_fpuniform_matrix(m, n, 10, 0, seed=46)
    a[3, 5] = np.nan
    a[10, 0] = np.inf
    b[7, 20] = -np.inf
    b[0, 64] = 0.0
    c[50, 50] = np.inf
    c[60, 60] = np.nan
    mxu = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="mxu")
    vpu = xb.exgemm("N", "N", 1.0, a, b, beta=1.0, c=c, impl="pallas")
    assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all()


def test_gemm_mxu_wide_spread_falls_back_same_bits():
    import exblas_tpu as xb
    m = k = n = 256
    a = xb.init_fpuniform_matrix(m, k, 200, 0, seed=47)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=48)
    mxu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="mxu")
    vpu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="pallas")
    assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all()


def test_gemm_mxu_top_rungs_on_chip():
    """Round-4 top rungs: spread ~310 bits routes to (40, 40), ~360 bits
    to (48, 48); both must be bit-identical to the exact VPU kernel, and
    spread past 384 bits must still fall back with identical bits."""
    import exblas_tpu as xb
    m = k = n = 128
    for rng_bits, seed in ((255, 57), (305, 58)):
        a = xb.init_fpuniform_matrix(m, k, rng_bits, 0, seed=seed)
        b = xb.init_fpuniform_matrix(k, n, rng_bits, -rng_bits // 2,
                                     seed=seed + 10)
        mxu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="mxu")
        vpu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="pallas")
        assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all(), rng_bits
    a = xb.init_fpuniform_matrix(m, k, 500, 0, seed=59)   # > 384 bits
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=60)
    mxu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="mxu")
    vpu = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="pallas")
    assert (mxu.view(np.uint64) == vpu.view(np.uint64)).all()


def test_exgemm_auto_is_jittable():
    """The whole auto dispatch must trace under user jit -- no host syncs."""
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.exgemm import _gemm_bits_auto
    from exblas_tpu.ops.exgemv import _scalar_bits

    m = k = n = 256
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=49)
    b = xb.init_fpuniform_matrix(k, n, 10, 0, seed=50)
    ab, bb = split_f64(a), split_f64(b)
    ah, al = _scalar_bits(1.0)
    zh = jnp.zeros((m, n), jnp.uint32)

    @jax.jit
    def f(a_hi, a_lo, b_hi, b_lo):
        return _gemm_bits_auto(a_hi, a_lo, b_hi, b_lo, ah, al, ah, al,
                               zh, zh, "zero")

    got = np.asarray(f(ab.hi, ab.lo, bb.hi, bb.lo)).view(np.float64)
    want = xb.exgemm("N", "N", 1.0, a, b, beta=0.0, impl="pallas")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


# ---------------------------------------------------------------------------
# MXU GEMV: byte-plane path, rung ladder, beta modes, specials
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("alpha,beta", [(1.0, 0.0), (3.7, 1.0), (-0.5, 2.5)])
def test_gemv_mxu_matches_xla(alpha, beta):
    import exblas_tpu as xb
    m, k = 300, 500
    a = xb.init_fpuniform_matrix(m, k, 12, 0, seed=60)
    x = xb.init_fpuniform(k, 12, 0, seed=61)
    y = xb.init_fpuniform(m, 14, -3, seed=62) if beta else None
    got = xb.exgemv("N", alpha, a, x, beta=beta, y=y, impl="auto")
    want = xb.exgemv("N", alpha, a, x, beta=beta, y=y, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_gemv_mxu_rungs_specials_fallback():
    import exblas_tpu as xb
    m, k = 200, 384
    # rung 2 (96-bit anchored window): spread ~ 30+53 = 83 bits, above the
    # 64-bit rung-1 window but inside rung 2
    a = xb.init_fpuniform_matrix(m, k, 30, 0, seed=63)
    x = xb.init_fpuniform(k, 12, 0, seed=64)
    got = xb.exgemv("N", 1.0, a, x, impl="auto")
    want = xb.exgemv("N", 1.0, a, x, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
    # specials override
    a2 = xb.init_fpuniform_matrix(m, k, 12, 0, seed=65)
    a2[3, 5] = np.inf
    a2[9, 0] = np.nan
    x2 = x.copy()
    x2[50] = -np.inf
    got = xb.exgemv("N", 1.0, a2, x2, impl="auto")
    want = xb.exgemv("N", 1.0, a2, x2, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
    # wide spread -> exact VPU fallback inside the same jit
    a3 = xb.init_fpuniform_matrix(m, k, 200, 0, seed=66)
    got = xb.exgemv("N", 1.0, a3, x, impl="auto")
    want = xb.exgemv("N", 1.0, a3, x, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_exgemv_sharded_rows_auto_on_chip():
    """Rows-sharded GEMV on a real 1-device mesh rides the MXU auto path."""
    import numpy as np
    import exblas_tpu as xb
    from exblas_tpu.parallel import exgemv_sharded, make_mesh

    m, k = 256, 512
    a = xb.init_fpuniform_matrix(m, k, 12, 0, seed=80)
    x = xb.init_fpuniform(k, 12, 0, seed=81)
    got = np.asarray(exgemv_sharded(
        a, x, alpha=1.5, mesh=make_mesh(1), shard="rows")).view(np.float64)
    want = xb.exgemv("N", 1.5, a, x, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_gemv_mxu_deep_subnormal_beta_on_chip():
    """Deep-subnormal products (rel window below DOT bit 0) with beta != 0.

    Hardware twin of test_gemv_mxu.py::test_mxu_gemv_deep_subnormal_beta:
    the epilogue must fold the straddling canonical digit into abs limb 0
    instead of dropping it.
    """
    import exblas_tpu as xb
    m, k = 16, 64
    tiny = 5e-324
    a = np.full((m, k), tiny)
    x = np.full(k, tiny)
    y = np.full(m, tiny)
    for sgn in (1.0, -1.0):
        got = xb.exgemv("N", sgn, a, x, beta=0.5, y=y, impl="auto")
        want = xb.exgemv("N", sgn, a, x, beta=0.5, y=y, impl="xla")
        assert (got.view(np.uint64) == want.view(np.uint64)).all()
    # mixed: deep-subnormal rows alongside normal rows (per-row anchors)
    a2 = np.concatenate([a, xb.init_fpuniform_matrix(m, k, 8, 0, seed=90)])
    y2 = np.concatenate([y, xb.init_fpuniform(m, 8, 0, seed=91)])
    got = xb.exgemv("N", 1.0, a2, x, beta=2.5, y=y2, impl="auto")
    want = xb.exgemv("N", 1.0, a2, x, beta=2.5, y=y2, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_gemv_mxu_fused_round_edges():
    """beta == 0 rounds entirely in-kernel (fold matmul at HIGHEST
    precision, sign-mask split deposit, per-lane e_adjust rounding): bits
    must match the XLA path across overflow->Inf, deep subnormals,
    cancellation-to-zero, negatives, and the (3,3) rung."""
    import exblas_tpu as xb
    cases = [
        ("narrow", xb.init_fpuniform_matrix(300, 400, 10, 0, seed=1),
         xb.init_fpuniform(400, 10, 0, seed=2)),
        ("rung33", xb.init_fpuniform_matrix(200, 300, 90, -45, seed=3),
         xb.init_fpuniform(300, 90, -45, seed=4)),
        ("tiny", xb.init_fpuniform_matrix(150, 200, 40, -1070, seed=5),
         xb.init_fpuniform(200, 30, -15, seed=6)),
        ("huge->inf", xb.init_fpuniform_matrix(150, 200, 1020, 990, seed=7),
         xb.init_fpuniform(200, 1020, 990, seed=8)),
    ]
    for name, a, x in cases:
        got = xb.exgemv("N", 1.0, a, x, impl="auto")
        want = xb.exgemv("N", 1.0, a, x, impl="xla")
        assert (got.view(np.uint64) == want.view(np.uint64)).all(), name
    a, x = cases[0][1], cases[0][2]
    a2 = np.concatenate([a, -a], axis=1)
    x2 = np.concatenate([x, x])
    got = xb.exgemv("N", 1.0, a2, x2, impl="auto")
    assert (got == 0).all() and not np.signbit(got).any()


def test_sharded_sum_dot_gemm_on_chip():
    """Sharded paths on a real 1-device mesh (the Pallas local kernels +
    int32-limb psum wire format run on actual hardware, not just the
    virtual-CPU meshes): bits must equal the unsharded results."""
    import math
    import exblas_tpu as xb
    from exblas_tpu.parallel import (exsum_sharded, exdot_sharded,
                                     exgemm_sharded, make_mesh)

    mesh = make_mesh(1)
    x = xb.init_ill_cond(30000, 1e25, seed=101)
    got = np.asarray(exsum_sharded(x, mesh=mesh)).reshape(1).view(np.float64)[0]
    assert np.float64(got).tobytes() == np.float64(math.fsum(x)).tobytes()

    a = xb.init_fpuniform(20000, 40, -20, seed=102)
    b = xb.init_fpuniform(20000, 40, -20, seed=103)
    gd = np.asarray(exdot_sharded(a, b, mesh=mesh)).reshape(1).view(np.float64)[0]
    want = xb.exdot(a, b, impl="pallas")
    assert np.float64(gd).tobytes() == np.float64(want).tobytes()

    am = xb.init_fpuniform_matrix(96, 200, 15, 0, seed=104)
    bm = xb.init_fpuniform_matrix(200, 64, 15, 0, seed=105)
    gg = np.asarray(exgemm_sharded(am, bm, mesh=mesh)).view(np.float64)
    wg = xb.exgemm("N", "N", 1.0, am, bm, beta=0.0, impl="mxu")
    assert (gg.view(np.uint64) == wg.view(np.uint64)).all()


def test_exsum_mxu_auto_matches_pallas():
    """The MXU byte-plane ExSUM auto ladder (sampled-spread routing,
    sampled-anchor fast path with in-kernel coverage check, exact-anchor
    retry, VPU fallback) on real hardware: bits must equal the VPU kernel
    on every tier."""
    import math
    import exblas_tpu as xb

    rng = np.random.default_rng(23)
    n = 1 << 21
    cases = {
        "narrow": xb.init_fpuniform(n, 2, 0, seed=31),
        "lognormal": xb.init_lognormal(n, 1.0, 2.0, seed=32),
        "wide->vpu": xb.init_fpuniform(n, 50, -25, seed=33),
        "illcond->vpu": xb.init_ill_cond(n, 1e30, seed=34),
    }
    zx = xb.init_fpuniform(n, 2, 0, seed=35)
    zx[::5] = 0.0
    cases["zeros-mixed"] = zx
    out = rng.uniform(0.5, 1, n)
    out[12345] = 2.0**40     # sampled-anchor miss -> exact-anchor retry
    cases["retry"] = out
    hug = rng.uniform(-1, 1, n)
    hug[54321] = 1e300       # spread > window -> in-kernel flag -> VPU
    cases["flag->vpu"] = hug
    for name, x in cases.items():
        got = xb.exsum(x, impl="auto")
        want = xb.exsum(x, impl="pallas")
        assert np.float64(got).tobytes() == np.float64(want).tobytes(), (
            name, got, want)
    # absolute oracle on one case
    w = math.fsum(cases["narrow"])
    g = xb.exsum(cases["narrow"], impl="mxu")
    assert np.float64(g).tobytes() == np.float64(w).tobytes()


def test_negative_carry_climb_large_n_regression():
    """Regression (found by cross-impl testing at n=2^21): a negative
    lane total's borrowed -1 climbs one limb per renorm pass; with enough
    grid steps it reaches the top limb, where the old renorm/compress
    passes stripped it (+2^(20L) corruption -> inf).  Covers the kernel
    _renorm8 fix, core renorm_pass, and the int64 canonicalize scan."""
    import math
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.kernels.sum_kernel import exsum_bits_pallas

    x = xb.init_ill_cond(1 << 21, 1e30, seed=34)
    b = split_f64(x)
    want = np.float64(math.fsum(x)).view(np.uint64)
    for rows in (32, 96, 512):
        got = np.uint64(exsum_bits_pallas(b.hi, b.lo, rows=rows))
        assert got == want, (rows, got.view(np.float64))

    rng = np.random.default_rng(40)
    m, k = 128, 1 << 14
    a = rng.uniform(-2, 1, (m, k))   # negative-leaning row sums
    z = rng.uniform(0.5, 1, k)
    wg = xb.exgemv("N", 1.0, a, z, impl="xla").view(np.uint64)
    for fpe in (2, 8):
        gg = xb.exgemv("N", 1.0, a, z, impl="pallas", fpe=fpe)
        assert (gg.view(np.uint64) == wg).all(), fpe


def test_exdot_mxu_auto_matches_pallas():
    """The cross-plane MXU ExDOT auto ladder (per-vector sampled anchors,
    in-kernel coverage check, exact-anchor retry, VPU fallback) on real
    hardware: bits must equal the VPU kernel on every tier."""
    import exblas_tpu as xb

    rng = np.random.default_rng(61)
    n = 1 << 21
    cases = {
        "narrow": (xb.init_fpuniform(n, 2, 0, seed=62),
                   xb.init_fpuniform(n, 2, 0, seed=63)),
        "wide(4,4)": (xb.init_fpuniform(n, 50, -25, seed=64),
                      xb.init_fpuniform(n, 50, -25, seed=65)),
        "illcond(5,5)": (xb.init_ill_cond(n, 1e30, seed=66),
                         rng.uniform(0.5, 2.0, n)),
        "huge-spread->vpu": (xb.init_fpuniform(n, 300, -150, seed=67),
                             xb.init_fpuniform(n, 2, 0, seed=68)),
    }
    za, zb = (xb.init_fpuniform(n, 2, 0, seed=69),
              xb.init_fpuniform(n, 2, 0, seed=70))
    za[::5] = 0.0
    zb[::3] *= -1.0
    cases["zeros-signs"] = (za, zb)
    ra, rb = rng.uniform(0.5, 1, n), rng.uniform(0.5, 1, n)
    ra[12345] = 2.0**40     # sampled-anchor miss -> exact-anchor retry
    cases["retry"] = (ra, rb)
    fa, fb = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    fa[54321] = 1e300       # in-kernel flag -> retry -> VPU
    cases["flag->vpu"] = (fa, fb)

    def spread_vec(bits, seed):
        # element msb exponents spanning ~bits-52 binades: true spread
        # ~= bits (lsb bound from the exponent field)
        r2 = np.random.default_rng(seed)
        e = r2.integers(-(bits - 53), 1, n)
        m = r2.uniform(1, 2, n) * np.where(r2.random(n) < 0.3, -1, 1)
        return m * np.exp2(e)

    # round-5 guard-band routing (exdot._dot_mxu_ladder): true spread in
    # (152, 160] resolves the anchors exactly and runs ONE deslacked
    # covered pass; (160, 168] resolves and routes straight to the VPU
    cases["tight-deslack(156)"] = (spread_vec(156, 71), spread_vec(100, 72))
    cases["tight-deslack(159)"] = (spread_vec(159, 73), spread_vec(120, 74))
    cases["resolved->vpu(165)"] = (spread_vec(165, 75), spread_vec(80, 76))
    for name, (a, b) in cases.items():
        got = xb.exdot(a, b, impl="auto")
        want = xb.exdot(a, b, impl="pallas")
        assert np.float64(got).tobytes() == np.float64(want).tobytes(), (
            name, got, want)
    # absolute exact-rational oracle on one mxu-forced case
    from oracle import exact_dot

    w = exact_dot(cases["narrow"][0][:100000], cases["narrow"][1][:100000])
    g = xb.exdot(cases["narrow"][0][:100000], cases["narrow"][1][:100000],
                 impl="mxu")
    assert np.float64(g).tobytes() == np.float64(w).tobytes()


def test_acc_mxu_ladders_merge_wire_format_on_chip():
    """The Superacc-producing MXU twins (sum + dot) on hardware: absolute
    SUM/DOT-format limbs, bit-mergeable with the VPU kernels' states (the
    distributed psum wire format), and the sharded wrappers route through
    them unchanged."""
    import math
    import exblas_tpu as xb
    from exblas_tpu.core.rounding import round_superacc_to_f64_bits
    from exblas_tpu.parallel import exdot_sharded, exsum_sharded, make_mesh

    n = 1 << 21
    x = xb.init_fpuniform(n, 40, -20, seed=71)
    a1 = xb.exsum_acc(x[: n // 2], impl="mxu")
    a2 = xb.exsum_acc(x[n // 2:], impl="pallas")
    got = np.uint64(np.asarray(round_superacc_to_f64_bits(a1 + a2)))
    assert got == np.float64(math.fsum(x)).view(np.uint64)

    a = xb.init_fpuniform(n, 30, -15, seed=72)
    b = xb.init_fpuniform(n, 30, -15, seed=73)
    d1 = xb.exdot_acc(a[: n // 2], b[: n // 2], impl="mxu")
    d2 = xb.exdot_acc(a[n // 2:], b[n // 2:], impl="pallas")
    gd = np.uint64(np.asarray(round_superacc_to_f64_bits(d1 + d2)))
    wd = np.float64(xb.exdot(a, b, impl="pallas")).view(np.uint64)
    assert gd == wd

    mesh = make_mesh(1)
    gs = np.asarray(exsum_sharded(x, mesh=mesh, impl="auto"))
    assert np.uint64(gs.reshape(1)[0]) == np.float64(
        math.fsum(x)).view(np.uint64)
    gds = np.asarray(exdot_sharded(a, b, mesh=mesh, impl="auto"))
    assert np.uint64(gds.reshape(1)[0]) == wd


def test_trsv_pallas_scale_16384_block_diag():
    """TRSV at n=16384 (VERDICT round-2 item 8: scale evidence).  A
    block-diagonal T = diag(T0, T0) must solve to the concatenation of the
    two n=8192 solves, bit for bit: the full-scale grid (128 block rows,
    8256 grid steps) must reproduce the verified smaller size exactly, and
    the zero off-diagonal panels must deposit nothing.  Also covers the
    in-register block transpose (no T^T copy in HBM)."""
    import exblas_tpu as xb

    n0 = 8192
    t0 = xb.init_fpuniform_tr_matrix("L", "N", n0, 4, 0, seed=81)
    b0 = xb.init_fpuniform(n0, 4, 0, seed=82)
    b1 = xb.init_fpuniform(n0, 4, 0, seed=83)
    x0 = xb.extrsv("L", "N", "N", t0, b0, impl="pallas")
    x1 = xb.extrsv("L", "N", "N", t0, b1, impl="pallas")

    big = np.zeros((2 * n0, 2 * n0))
    big[:n0, :n0] = t0
    big[n0:, n0:] = t0
    got = xb.extrsv("L", "N", "N", big, np.concatenate([b0, b1]),
                    impl="pallas")
    want = np.concatenate([x0, x1])
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
