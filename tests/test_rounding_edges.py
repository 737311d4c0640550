"""Targeted rounding edge cases: exact ties (round-to-nearest-even), the
subnormal/normal boundary, mantissa-overflow rounding carries, and the
maximum-finite/infinity boundary."""

import numpy as np
import pytest

import exblas_tpu as xb
from oracle import assert_same_bits, bits_of, exact_sum


def _check(xs, msg):
    assert_same_bits(xb.exsum(np.array(xs), impl="xla"), exact_sum(xs), msg)


def test_exact_tie_rounds_to_even():
    # 1 + 2^-53: exactly halfway between 1 and 1+2^-52 -> stays 1 (even)
    _check([1.0, 2.0 ** -53], "tie-down")
    # (1+2^-52) + 2^-53: halfway, rounds UP to 1+2^-51 (even mantissa)
    _check([1.0 + 2.0 ** -52, 2.0 ** -53], "tie-up")
    # tie broken by a tiny sticky term
    _check([1.0, 2.0 ** -53, 2.0 ** -105], "tie-sticky")
    _check([1.0, 2.0 ** -53, -(2.0 ** -105)], "tie-sticky-neg")


def test_subnormal_normal_boundary():
    tiny = np.finfo(np.float64).tiny  # 2^-1022, smallest normal
    sub = 5e-324                      # 2^-1074
    _check([tiny, -sub], "just-below-normal")
    _check([tiny, sub], "just-above-normal")
    # largest subnormal + one ulp = smallest normal
    largest_sub = tiny - sub
    _check([largest_sub, sub], "sub-to-normal-carry")
    # halfway cases inside the subnormal range
    _check([sub, sub, -sub], "sub-arith")
    _check([3 * sub, 2.0 ** -1075 if False else 0.0], "sub-noop")


def test_mantissa_overflow_carry():
    # sum = 2 - 2^-53: rounds to 2.0 (mantissa all-ones + guard round-up)
    _check([1.0, 1.0 - 2.0 ** -53], "carry-to-2")
    # exponent bump through rounding at a power of two
    _check([2.0 - 2.0 ** -52, 2.0 ** -53, 2.0 ** -54], "carry-bump")


def test_max_finite_boundary():
    big = np.finfo(np.float64).max
    ulp = 2.0 ** 971  # ulp(max)
    _check([big, ulp / 4], "below-inf")       # rounds back to max
    assert xb.exsum(np.array([big, ulp]), impl="xla") == np.inf
    # exactly halfway between max and 2^1024: ties toward even -> inf
    assert xb.exsum(np.array([big, ulp / 2]), impl="xla") == np.inf
    # just below halfway: rounds back to max
    assert xb.exsum(np.array([big, ulp / 2, -(2.0 ** 900)]),
                    impl="xla") == big


def test_negative_mirror():
    for xs in ([-1.0, -(2.0 ** -53)], [-(2.0 ** -1074), -(2.0 ** -1074)]):
        _check(xs, f"neg {xs}")


def test_signed_zero_results():
    assert bits_of(xb.exsum(np.array([1.5, -1.5]), impl="xla")) == 0
    assert bits_of(xb.exsum(np.array([-0.0, -0.0]), impl="xla")) == 0


# ---------------------------------------------------------------------------
# Parked-negative representations (regression: the borrowed -1 of a negative
# accumulator climbs one limb per carry pass; early code dropped it at the
# top limb, corrupting the value by +2^(20L) -- caught at n=2^21 on TPU)
# ---------------------------------------------------------------------------

def _exact_value(digits, negative, L):
    v = sum(int(d) << (20 * i) for i, d in enumerate(digits))
    return v - (1 << (20 * L)) if negative else v


def test_canonicalize_int64_parked_negative():
    from exblas_tpu.core.rounding import canonicalize_digits
    import jax.numpy as jnp

    L = 216
    rng = np.random.default_rng(1)
    row = np.zeros(L, np.int64)
    row[:100] = rng.integers(0, 1 << 20, 100)
    row[100:L - 1] = 8 * ((1 << 20) - 1)  # 8 merged phases of 0xFFFFF
    row[L - 1] = -8                       # 8 parked borrowed carries
    want = sum(int(v) << (20 * i) for i, v in enumerate(row))
    digits, neg = canonicalize_digits(jnp.asarray(row[None, :]))
    got = _exact_value(np.asarray(digits)[0], bool(np.asarray(neg)[0]), L)
    assert got == want and want < 0


def test_renorm_pass_negative_carry_climbs_to_top():
    from exblas_tpu.core.accumulator import renorm_pass
    from exblas_tpu.core.rounding import canonicalize_digits
    import jax.numpy as jnp

    L = 112
    limbs = np.zeros(L, np.int64)
    limbs[3] = -5          # value -5 * 2^60
    want = -5 << 60
    x = jnp.asarray(limbs)
    for _ in range(L + 20):  # far more passes than limbs: carry must park
        x = renorm_pass(x)
    digits, neg = canonicalize_digits(x.astype(jnp.int32)[None, :])
    got = _exact_value(np.asarray(digits)[0], bool(np.asarray(neg)[0]), L)
    assert got == want


def test_to_int32_limbs_parked_negative():
    from exblas_tpu.core.accumulator import to_int32_limbs
    from exblas_tpu.core.rounding import canonicalize_digits
    import jax.numpy as jnp

    L = 112
    row = np.zeros(L, np.int64)
    row[: L - 1] = (1 << 20) - 1   # canonical digits of -1 (two's compl.)
    row[L - 1] = -1                # ... with the borrow parked at the top
    x32 = to_int32_limbs(jnp.asarray(row))
    digits, neg = canonicalize_digits(x32[None, :])
    got = _exact_value(np.asarray(digits)[0], bool(np.asarray(neg)[0]), L)
    assert got == -1
