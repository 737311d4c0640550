"""Seeded fuzz campaign for the exact routines: random sizes, every input
distribution (incl. subnormal-heavy and special-laced), the full
fpe x early_exit variant matrix, and both backends, against exact-rational
oracles.

The reproducible analog of the reference's CTest configuration matrix
(reference src/gpu/blas/blas1/CMakeLists.txt:9-30 and
blas2/CMakeLists.txt:12-80), but randomized and far denser.  Every case is
derived deterministically from (campaign_seed, case_index), so any failure
reproduces with one command:

    python tests/fuzz.py --cases 257 --seed 20260816            # CPU (xla)
    python tests/fuzz.py --cases 257 --seed 20260816 --impl pallas  # on TPU

A small deterministic subset runs in pytest (test_fuzz.py).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import (  # noqa: E402
    assert_same_bits,
    assert_same_bits_arr,
    exact_dot,
    exact_sum_with_specials,
    native_dot,
    native_sum,
)

# The native C++ oracle (csrc/oracle.cpp) computes the same semantics
# ~100x faster than Python rationals and is cross-validated against them in
# test_oracle_native.py; fall back to Fractions if the toolchain is absent.
try:
    native_sum([1.0])
    _SUM_ORACLE, _DOT_ORACLE = native_sum, native_dot
except Exception:  # pragma: no cover
    _SUM_ORACLE, _DOT_ORACLE = None, None


DISTRIBUTIONS = (
    "naive", "fpuniform_std", "fpuniform_large", "fpuniform_full",
    "fpuniform_wide", "lognormal", "illcond", "subnormal_heavy",
    "special_laced", "zeros_heavy", "cancellation",
)


def gen_vector(dist: str, n: int, rng: np.random.RandomState) -> np.ndarray:
    import exblas_tpu as xb

    seed = int(rng.randint(0, 2 ** 31 - 1))
    if dist == "naive":
        return xb.init_naive(n)
    if dist == "fpuniform_std":
        return xb.init_fpuniform(n, 2, 0, seed=seed)
    if dist == "fpuniform_large":
        x = xb.init_fpuniform(n, 50, -25, seed=seed)
        return x * np.where(rng.rand(n) < 0.5, -1.0, 1.0)
    if dist == "fpuniform_full":
        x = xb.init_fpuniform(n, 600, -320, seed=seed)
        return x * np.where(rng.rand(n) < 0.5, -1.0, 1.0)
    if dist == "fpuniform_wide":
        # ~350-400-bit spread: routes the round-4 top MXU rungs of the
        # GEMM/GEMV ladders (320-512 anchored bits) instead of the VPU
        # fallback that fpuniform_full (~650 bits) still takes
        x = xb.init_fpuniform(n, 330, -165, seed=seed)
        return x * np.where(rng.rand(n) < 0.5, -1.0, 1.0)
    if dist == "lognormal":
        return xb.init_lognormal(n, 1.0, rng.uniform(0.5, 3.0), seed=seed)
    if dist == "illcond":
        c = 10.0 ** rng.uniform(8, 40)
        return xb.init_ill_cond(n, c, seed=seed)
    if dist == "subnormal_heavy":
        x = xb.init_fpuniform(n, -1000, -1070, seed=seed)
        x = x * np.where(rng.rand(n) < 0.5, -1.0, 1.0)
        x[rng.rand(n) < 0.3] = 5e-324 * rng.randint(1, 100)
        return x
    if dist == "special_laced":
        x = xb.init_fpuniform(n, 4, 0, seed=seed)
        k = max(1, n // 50)
        idx = rng.choice(n, size=min(3 * k, n), replace=False)
        specials = rng.choice([np.inf, -np.inf, np.nan], size=len(idx))
        x[idx] = specials
        return x
    if dist == "zeros_heavy":
        x = xb.init_fpuniform(n, 8, 0, seed=seed)
        x[rng.rand(n) < 0.6] = 0.0
        x[rng.rand(n) < 0.1] = -0.0
        return x
    if dist == "cancellation":
        half = xb.init_fpuniform(n - n // 2, 30, 0, seed=seed)
        x = np.concatenate([half, -half[: n // 2]])
        rng.shuffle(x)
        return x
    raise ValueError(dist)


def exact_dot_with_specials(a, b) -> float:
    """Dot oracle incl. NaN/Inf semantics (0*Inf -> NaN, etc.)."""
    pos = neg = False
    finite_mask = np.ones(len(a), bool)
    for i, (x, y) in enumerate(zip(a, b)):
        if np.isnan(x) or np.isnan(y):
            return math.nan
        if np.isinf(x) or np.isinf(y):
            if x == 0 or y == 0:
                return math.nan  # 0 * Inf
            # sign bit of the product (x, y both nonzero here)
            if (math.copysign(1.0, x) * math.copysign(1.0, y)) > 0:
                pos = True
            else:
                neg = True
            finite_mask[i] = False
    if pos and neg:
        return math.nan
    if pos:
        return math.inf
    if neg:
        return -math.inf
    return exact_dot(a[finite_mask], b[finite_mask])


_ALPHAS = (1.0, -1.0, 0.5, 3.7, -0.125)
_BETAS = (0.0, 0.0, 1.0, 2.5, -0.25)


def _dot_oracle_terms(u, v) -> float:
    """Exact correctly-rounded sum of products u[i]*v[i] incl. specials."""
    u = np.ascontiguousarray(u, np.float64)
    v = np.ascontiguousarray(v, np.float64)
    return (_DOT_ORACLE or exact_dot_with_specials)(u, v)


def _oracle_gemv(trans, alpha, a, x, beta, y):
    """fl(alpha*x), exact per-row dot + exact beta*y product, one round."""
    op = a.T if trans == "T" else a
    m = op.shape[0]
    z = np.float64(alpha) * np.asarray(x, np.float64)
    out = np.empty(m)
    for i in range(m):
        if beta == 0.0:
            out[i] = _dot_oracle_terms(op[i], z)
        else:
            out[i] = _dot_oracle_terms(
                np.concatenate([op[i], [np.float64(beta)]]),
                np.concatenate([z, [np.float64(y[i])]]))
    return out


def _oracle_gemm(alpha, a, b, beta, c):
    """fl(alpha*a) elementwise, exact per-element dot + exact beta*c."""
    m, k = a.shape
    n = b.shape[1]
    z = np.float64(alpha) * np.asarray(a, np.float64)
    out = np.empty((m, n))
    for i in range(m):
        for j in range(n):
            if beta == 0.0 or c is None:
                out[i, j] = _dot_oracle_terms(z[i], b[:, j])
            else:
                out[i, j] = _dot_oracle_terms(
                    np.concatenate([z[i], [np.float64(beta)]]),
                    np.concatenate([b[:, j], [np.float64(c[i, j])]]))
    return out


def _oracle_trsv_lower(a, b, unit):
    """Spec replay: exact residual, correctly rounded Round + divide.

    The divide is plain Python float division -- IEEE double division IS
    the correctly rounded quotient, and unlike Fraction division it keeps
    IEEE zero signs (0 / -d = -0.0, which the routine reproduces).
    """
    from fractions import Fraction

    n = len(b)
    acc = [Fraction(float(v)) for v in b]
    x = np.empty(n)
    for i in range(n):
        num = float(acc[i])
        x[i] = num if unit else num / float(a[i, i])
        for j in range(i + 1, n):
            acc[j] -= Fraction(float(a[j, i])) * Fraction(float(x[i]))
    return x


def _gen_matrix(dist, m, k, rng):
    return gen_vector(dist, m * k, rng).reshape(m, k)


def run_case(idx: int, campaign_seed: int, impl: str, max_n: int = 5000,
             big_dims: bool = False):
    """One fuzz case; raises AssertionError with full reproduction info."""
    import exblas_tpu as xb

    rng = np.random.RandomState((campaign_seed * 1000003 + idx) % 2 ** 31)
    routine = ["exsum", "exsum", "exsum", "exdot", "exdot", "exdot",
               "exgemv", "exgemm", "extrsv"][int(rng.randint(9))]
    dist = DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))]
    n = int(rng.randint(1, max_n + 1))
    fpe = int(rng.randint(0, 9))
    early_exit = bool(rng.randint(2))
    if fpe == 1:
        fpe = 2  # fpe==1 is the non-reproducible control; not fuzzed

    label = (f"case {idx} (seed {campaign_seed}): {routine} {dist} n={n} "
             f"fpe={fpe} ee={early_exit} impl={impl}")
    if routine == "exsum":
        x = gen_vector(dist, n, rng)
        # on TPU "pallas" maps to the full sum path (MXU ladder + VPU);
        # every case ALSO runs the forced VPU kernel for cross-impl bits
        s_impl = "mxu" if impl == "pallas" else impl
        label = (f"case {idx} (seed {campaign_seed}): exsum {dist} n={n} "
                 f"fpe={fpe} ee={early_exit} impl={s_impl}")
        got = xb.exsum(x, fpe=fpe, early_exit=early_exit, impl=s_impl)
        want = (_SUM_ORACLE or exact_sum_with_specials)(x)
        assert_same_bits(got, want, label)
        if s_impl != impl:
            got_v = xb.exsum(x, fpe=fpe, early_exit=early_exit, impl=impl)
            assert_same_bits(got_v, got, label + " [vpu-vs-mxu]")
        # reproducibility under permutation
        p = rng.permutation(n)
        got_p = xb.exsum(x[p], fpe=fpe, early_exit=early_exit, impl=s_impl)
        assert_same_bits(got_p, got, label + " [permuted]")
    elif routine == "exdot":
        a = gen_vector(dist, n, rng)
        b_dist = (dist if rng.rand() < 1 / 3 else
                  DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))])
        b = gen_vector(b_dist, n, rng)
        got = xb.exdot(a, b, fpe=fpe, early_exit=early_exit, impl=impl)
        want = (_DOT_ORACLE or exact_dot_with_specials)(a, b)
        assert_same_bits(got, want, label)
        p = rng.permutation(n)
        got_p = xb.exdot(a[p], b[p], fpe=fpe, early_exit=early_exit,
                         impl=impl)
        assert_same_bits(got_p, got, label + " [permuted]")
    elif routine == "exgemv":
        m = int(rng.randint(1, 65))
        k = int(rng.randint(1, 97))
        if big_dims:   # extra draws only in big mode: old seeds replay
            m *= int(rng.randint(2, 9))
            k *= int(rng.randint(2, 17))
        trans = ["N", "T"][int(rng.randint(2))]
        alpha = _ALPHAS[int(rng.randint(len(_ALPHAS)))]
        beta = _BETAS[int(rng.randint(len(_BETAS)))]
        a = _gen_matrix(dist, m, k, rng)
        # correlated distributions 1/3 of the time: double-subnormal /
        # double-huge operand pairs anchor the product range at its
        # extremes (caught the deep-subnormal beta epilogue bug that
        # independent draws hit with only ~1% probability)
        x_dist = (dist if rng.rand() < 1 / 3 else
                  DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))])
        xv = gen_vector(x_dist, m if trans == "T" else k, rng)
        out_len = k if trans == "T" else m
        y = (gen_vector("fpuniform_large", out_len, rng)
             if beta != 0.0 else None)
        # on TPU "pallas" maps to the full product path (MXU ladder + VPU)
        gv_impl = "auto" if impl == "pallas" else impl
        label = (f"case {idx} (seed {campaign_seed}): exgemv {dist} "
                 f"{trans} {m}x{k} alpha={alpha} beta={beta} fpe={fpe} "
                 f"impl={gv_impl}")
        got = xb.exgemv(trans, alpha, a, xv, beta=beta, y=y, fpe=fpe,
                        early_exit=early_exit, impl=gv_impl)
        want = _oracle_gemv(trans, alpha, a, xv, beta, y)
        assert_same_bits_arr(got, want, label)
        # reproducibility under k-permutation
        kk = m if trans == "T" else k
        p = rng.permutation(kk)
        ap = a[p, :] if trans == "T" else a[:, p]
        got_p = xb.exgemv(trans, alpha, ap, xv[p], beta=beta, y=y,
                          fpe=fpe, early_exit=early_exit, impl=gv_impl)
        assert_same_bits_arr(got_p, got, label + " [k-permuted]")
    elif routine == "exgemm":
        m = int(rng.randint(1, 33))
        k = int(rng.randint(1, 49))
        nn = int(rng.randint(1, 33))
        if big_dims:
            m *= int(rng.randint(2, 9))
            k *= int(rng.randint(2, 33))
            nn *= int(rng.randint(2, 9))
        alpha = _ALPHAS[int(rng.randint(len(_ALPHAS)))]
        beta = _BETAS[int(rng.randint(len(_BETAS)))]
        a = _gen_matrix(dist, m, k, rng)
        b_dist = (dist if rng.rand() < 1 / 3 else
                  DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))])
        b = _gen_matrix(b_dist, k, nn, rng)
        c = (_gen_matrix("fpuniform_large", m, nn, rng)
             if beta != 0.0 else None)
        gm_impl = "mxu" if impl == "pallas" else impl
        label = (f"case {idx} (seed {campaign_seed}): exgemm {dist} "
                 f"{m}x{k}x{nn} alpha={alpha} beta={beta} impl={gm_impl}")
        got = xb.exgemm("N", "N", alpha, a, b, beta=beta, c=c, fpe=fpe,
                        early_exit=early_exit, impl=gm_impl)
        want = _oracle_gemm(alpha, a, b, beta, c)
        assert_same_bits_arr(got, want, label)
        p = rng.permutation(k)
        got_p = xb.exgemm("N", "N", alpha, a[:, p], b[p, :], beta=beta,
                          c=c, fpe=fpe, early_exit=early_exit,
                          impl=gm_impl)
        assert_same_bits_arr(got_p, got, label + " [k-permuted]")
    else:  # extrsv: finite data, nonzero diagonal (specials are covered
        # by the dedicated hardware/edge tests; Fraction oracle can't
        # follow Inf chains)
        safe = {"special_laced": "fpuniform_std",
                "subnormal_heavy": "fpuniform_std",
                "fpuniform_full": "fpuniform_large",
                "fpuniform_wide": "fpuniform_large"}
        tdist = safe.get(dist, dist)
        nt = int(rng.randint(1, 97))
        uplo = ["L", "U"][int(rng.randint(2))]
        diag = ["N", "U"][int(rng.randint(2))]
        trans = ["N", "T"][int(rng.randint(2))]
        m0 = _gen_matrix(tdist, nt, nt, rng)
        a = np.tril(m0) if uplo == "L" else np.triu(m0)
        idxd = np.arange(nt)
        a[idxd, idxd] = 0.0
        # bound solution growth: per-step amplification <= 1 + 1/4
        # (so |x| <= |b|max * 1.25^n stays far from overflow and the
        # Fraction oracle can always round); power-of-2 scale keeps the
        # mantissa bit patterns of the distribution intact
        off_max = float(np.max(np.abs(a))) if nt > 1 else 0.0
        if off_max > 0.0:
            s = 2.0 ** -max(0, int(np.ceil(np.log2(off_max * nt * 4))))
            a *= s
        a[idxd, idxd] = (gen_vector("fpuniform_std", nt, rng) + 1.0) * (
            np.where(rng.rand(nt) < 0.5, -1.0, 1.0))
        b = gen_vector(tdist, nt, rng)
        label = (f"case {idx} (seed {campaign_seed}): extrsv {tdist} "
                 f"{uplo}{trans}{diag} n={nt} fpe={fpe} impl={impl}")
        got = xb.extrsv(uplo, trans, diag, a, b, fpe=fpe,
                        early_exit=early_exit, impl=impl)
        # effective system: op(T) x = b; transposing flips the triangle
        ae = a if trans == "N" else a.T
        ue = uplo if trans == "N" else ("U" if uplo == "L" else "L")
        if ue == "L":
            want = _oracle_trsv_lower(ae, b, unit=(diag == "U"))
        else:
            want = _oracle_trsv_lower(ae[::-1, ::-1], b[::-1],
                                      unit=(diag == "U"))[::-1]
        assert_same_bits_arr(got, want, label)
        # variant agreement: a different fpe/tiling must not change bits
        fpe2 = 2 if fpe >= 5 else 8
        got_v = xb.extrsv(uplo, trans, diag, a, b, fpe=fpe2,
                          early_exit=not early_exit, impl=impl)
        assert_same_bits_arr(got_v, got, label + f" [variant fpe={fpe2}]")
    return label


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", type=int, default=257)
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--impl", default=None,
                    help="xla (default on CPU) / pallas (TPU)")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--max-n", type=int, default=5000)
    ap.add_argument("--big-dims", action="store_true",
                    help="scale GEMV/GEMM dims up to ~512x1536 / 256x1536x256")
    args = ap.parse_args()

    impl = args.impl
    if impl == "xla":
        # Pin to host CPU BEFORE anything touches a backend: the axon TPU
        # plugin ignores the JAX_PLATFORMS env var (sitecustomize forces
        # it) and its init hangs for ~14 min when the tunnel is down.
        # jax.config wins over the env override (same as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
    if impl is None:
        import jax

        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    failures = 0
    for idx in range(args.start, args.start + args.cases):
        try:
            label = run_case(idx, args.seed, impl, args.max_n,
                             big_dims=args.big_dims)
            print(f"PASS {label}", flush=True)
        except AssertionError as e:
            failures += 1
            print(f"FAIL {e}", flush=True)
    print(f"\n{args.cases} cases, {failures} failures "
          f"(seed {args.seed}, impl {impl}"
          + (", big-dims" if args.big_dims else "") + ")")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
