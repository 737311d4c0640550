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
    "lognormal", "illcond", "subnormal_heavy", "special_laced",
    "zeros_heavy", "cancellation",
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


def run_case(idx: int, campaign_seed: int, impl: str, max_n: int = 5000):
    """One fuzz case; raises AssertionError with full reproduction info."""
    import exblas_tpu as xb

    rng = np.random.RandomState((campaign_seed * 1000003 + idx) % 2 ** 31)
    routine = ["exsum", "exdot"][int(rng.randint(2))]
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
        got = xb.exsum(x, fpe=fpe, early_exit=early_exit, impl=impl)
        want = (_SUM_ORACLE or exact_sum_with_specials)(x)
        assert_same_bits(got, want, label)
        # reproducibility under permutation
        p = rng.permutation(n)
        got_p = xb.exsum(x[p], fpe=fpe, early_exit=early_exit, impl=impl)
        assert_same_bits(got_p, got, label + " [permuted]")
    else:
        a = gen_vector(dist, n, rng)
        b = gen_vector(DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))],
                       n, rng)
        got = xb.exdot(a, b, fpe=fpe, early_exit=early_exit, impl=impl)
        want = (_DOT_ORACLE or exact_dot_with_specials)(a, b)
        assert_same_bits(got, want, label)
        p = rng.permutation(n)
        got_p = xb.exdot(a[p], b[p], fpe=fpe, early_exit=early_exit,
                         impl=impl)
        assert_same_bits(got_p, got, label + " [permuted]")
    return label


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", type=int, default=257)
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--impl", default=None,
                    help="xla (default on CPU) / pallas (TPU)")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--max-n", type=int, default=5000)
    args = ap.parse_args()

    impl = args.impl
    if impl is None:
        import jax

        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    failures = 0
    for idx in range(args.start, args.start + args.cases):
        try:
            label = run_case(idx, args.seed, impl, args.max_n)
            print(f"PASS {label}", flush=True)
        except AssertionError as e:
            failures += 1
            print(f"FAIL {e}", flush=True)
    print(f"\n{args.cases} cases, {failures} failures "
          f"(seed {args.seed}, impl {impl})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
