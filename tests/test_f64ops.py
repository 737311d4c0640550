"""f64_mul / f64_div vs numpy's IEEE-correct CPU arithmetic (round-to-nearest
-even), including subnormals, overflow, underflow, and special values."""

import numpy as np
import pytest

import jax
import exblas_tpu  # noqa: F401
from exblas_tpu.core.f64ops import f64_div, f64_mul


def _split(x):
    u = np.asarray(x, np.float64).view(np.uint64)
    return ((u >> 32).astype(np.uint32), (u & 0xFFFFFFFF).astype(np.uint32))


def _run(op, a, b):
    ah, al = _split(a)
    bh, bl = _split(b)
    bits = np.asarray(jax.jit(op)(ah, al, bh, bl))
    return bits.view(np.float64)


def _assert_all_bits(got, want, a, b, opname):
    gb = got.view(np.uint64)
    wb = want.view(np.uint64)
    # Canonicalize NaNs (we always produce the quiet NaN pattern).
    gb = np.where(np.isnan(got), np.uint64(0x7FF8000000000000), gb)
    wb = np.where(np.isnan(want), np.uint64(0x7FF8000000000000), wb)
    bad = gb != wb
    if bad.any():
        i = int(np.argmax(bad))
        raise AssertionError(
            f"{opname}: a={a[i]!r} b={b[i]!r} got={got[i]!r} want={want[i]!r}"
        )


def _interesting(rng, n):
    picks = [
        rng.uniform(-2, 2, n) * np.exp2(rng.randint(-1074, 1023, n)),
        rng.uniform(-2, 2, n) * np.exp2(rng.randint(-560, 560, n)),
        np.ldexp(rng.randint(1, 2**53, n, dtype=np.int64).astype(np.float64),
                 -1074),  # subnormals
        rng.uniform(-1e154, 1e154, n) * rng.uniform(-1e154, 1e154, n),
    ]
    x = np.concatenate(picks)
    edge = np.array([
        0.0, -0.0, 1.0, -1.0, 5e-324, -5e-324, 2.0**-1074,
        np.finfo(np.float64).tiny, np.finfo(np.float64).max,
        -np.finfo(np.float64).max, 1.5, 2.0**1023, 2.0**-1022,
        (2.0**53 - 1) / 2.0**53, 1.0 + 2.0**-52,
        np.inf, -np.inf, np.nan,
    ])
    return np.concatenate([x, edge])


@pytest.mark.parametrize("seed", [0, 1])
def test_f64_mul_matches_ieee(seed):
    rng = np.random.RandomState(seed)
    a = _interesting(rng, 500)
    b = _interesting(np.random.RandomState(seed + 100), 500)
    rng.shuffle(b)
    with np.errstate(all="ignore"):
        want = a * b
    _assert_all_bits(_run(f64_mul, a, b), want, a, b, "mul")


@pytest.mark.parametrize("seed", [2, 3])
def test_f64_div_matches_ieee(seed):
    rng = np.random.RandomState(seed)
    a = _interesting(rng, 500)
    b = _interesting(np.random.RandomState(seed + 100), 500)
    rng.shuffle(b)
    with np.errstate(all="ignore"):
        want = a / b
    _assert_all_bits(_run(f64_div, a, b), want, a, b, "div")


def test_f64_div_exact_cases():
    a = np.array([1.0, 6.0, 1e300, 5e-324])
    b = np.array([3.0, 2.0, 1e-300, 5e-324])
    with np.errstate(all="ignore"):
        want = a / b
    _assert_all_bits(_run(f64_div, a, b), want, a, b, "div-exact")
