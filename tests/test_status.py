"""Status derivation (EXACT/INEXACT/OVERFLOW/INF/NAN) from exact accumulator
state -- including batched accumulators, where the exactness re-deposit check
must be per-element (round-1 bug: batched always reported INEXACT).

Counterpart of the reference's Superaccumulator::Status enum
(reference superaccumulator.hpp:73-83)."""

import numpy as np
import jax.numpy as jnp

import exblas_tpu as xb
from exblas_tpu.core.status import Status, status_of
from exblas_tpu.core.types import SUM_FORMAT, Superacc
from exblas_tpu.core.accumulator import accumulate_sum_terms
from exblas_tpu.core.ieee import split_f64


def _acc_of(values):
    b = split_f64(np.asarray(values, np.float64))
    return accumulate_sum_terms(jnp.asarray(b.hi), jnp.asarray(b.lo),
                                SUM_FORMAT)


def test_status_exact():
    assert int(status_of(_acc_of([1.0, 2.0, 4.0]))) == Status.EXACT


def test_status_inexact():
    # 1 + 2^-70 is not representable in binary64
    assert int(status_of(_acc_of([1.0, 2.0 ** -70]))) == Status.INEXACT


def test_status_overflow():
    assert int(status_of(_acc_of([1.7e308, 1.7e308]))) == Status.OVERFLOW


def test_status_specials():
    assert int(status_of(_acc_of([np.inf, 1.0]))) == Status.POS_INF
    assert int(status_of(_acc_of([-np.inf, 1.0]))) == Status.NEG_INF
    assert int(status_of(_acc_of([np.inf, -np.inf]))) == Status.NAN
    assert int(status_of(_acc_of([np.nan]))) == Status.NAN


def test_status_batched_mixed():
    """Batched accumulators get independent per-element verdicts."""
    accs = [
        (_acc_of([1.0, 2.0]), Status.EXACT),
        (_acc_of([1.0, 2.0 ** -70]), Status.INEXACT),
        (_acc_of([1.7e308, 1.7e308]), Status.OVERFLOW),
        (_acc_of([np.nan]), Status.NAN),
    ]
    limbs = jnp.stack([a.limbs for a, _ in accs])
    special = jnp.stack([a.special for a, _ in accs])
    batched = Superacc(limbs=limbs, special=special, fmt=SUM_FORMAT)
    got = np.asarray(status_of(batched))
    want = np.array([int(s) for _, s in accs], np.int32)
    np.testing.assert_array_equal(got, want)


def test_status_exact_zero():
    assert int(status_of(_acc_of([1.0, -1.0]))) == Status.EXACT
