"""Accumulator status reporting.

Counterpart of the reference's ``Superaccumulator::Status`` enum
(Exact/Inexact/Overflow/qNaN..., reference superaccumulator.hpp:73-83), which
the reference only partially maintains.  Here status is *derived* from the
exact accumulator state, so it is always correct:

* NAN / POS_INF / NEG_INF from the special counters;
* OVERFLOW when the exact value's magnitude is >= 2^1024 (rounding would
  return an infinity despite all-finite inputs);
* EXACT when the rounded double equals the accumulated value exactly,
  INEXACT otherwise.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from . import deposit as _dep
from .rounding import (
    canonicalize_digits,
    f64_bits_to_hi_lo,
    round_superacc_to_f64_bits,
)
from .types import Superacc


class Status(enum.IntEnum):
    EXACT = 0
    INEXACT = 1
    OVERFLOW = 2
    POS_INF = 3
    NEG_INF = 4
    NAN = 5


def status_of(acc: Superacc):
    """Status codes (int32, batch-shaped) for a Superacc."""
    nan_c = acc.special[..., 0]
    pos_c = acc.special[..., 1]
    neg_c = acc.special[..., 2]

    bits = round_superacc_to_f64_bits(acc)
    expf = ((bits >> jnp.uint64(52)) & jnp.uint64(0x7FF)).astype(jnp.int32)
    finite_inputs = jnp.logical_and(
        nan_c == 0, jnp.logical_and(pos_c == 0, neg_c == 0))
    overflowed = jnp.logical_and(finite_inputs, expf == 0x7FF)

    # Exactness: re-deposit the rounded double (one-hot over the limb axis,
    # shape-polymorphic so batched accumulators get per-element verdicts) and
    # compare canonical digits.
    hi, lo = f64_bits_to_hi_lo(bits)
    t = _dep.sum_terms(hi, lo, acc.fmt.offset_bits)
    idx = jnp.arange(acc.fmt.n_limbs, dtype=jnp.int32)
    redep_limbs = jnp.zeros(bits.shape + (acc.fmt.n_limbs,), jnp.int32)
    for off, piece in enumerate(t["pieces"]):
        redep_limbs = redep_limbs + jnp.where(
            idx == (t["q"] + off)[..., None], piece[..., None], jnp.int32(0)
        )
    d1, n1 = canonicalize_digits(acc.limbs)
    d2, n2 = canonicalize_digits(redep_limbs)
    exact = jnp.logical_and(jnp.all(d1 == d2, axis=-1), n1 == n2)

    status = jnp.where(exact, Status.EXACT, Status.INEXACT).astype(jnp.int32)
    status = jnp.where(overflowed, jnp.int32(Status.OVERFLOW), status)
    status = jnp.where(pos_c > 0, jnp.int32(Status.POS_INF), status)
    status = jnp.where(neg_c > 0, jnp.int32(Status.NEG_INF), status)
    is_nan = jnp.logical_or(nan_c > 0,
                            jnp.logical_and(pos_c > 0, neg_c > 0))
    status = jnp.where(is_nan, jnp.int32(Status.NAN), status)
    return status
