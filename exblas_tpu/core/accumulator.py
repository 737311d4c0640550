"""Superaccumulator arithmetic: deposit (XLA level), carry renormalization,
and exact merging.

All operations preserve the represented exact value; renormalization only
changes the (redundant) limb representation, so merge order / partitioning can
never affect the final rounded result.  This is the deterministic, atomics-free
replacement for the reference's ``AccumulateWord`` lock-free carry machinery
(reference superaccumulator.hpp:132-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import (
    AccFormat,
    LIMB_BITS,
    LIMB_MASK,
    N_SPECIAL,
    Superacc,
)
from . import deposit as _dep

_I64 = jnp.int64


def renorm_pass(limbs):
    """One vectorized carry pass along the last axis (exact, value-preserving).

    Carries move up one limb; the TOP limb is kept whole (its carry stays
    in place, as in the reference's Normalize, superaccumulator.cpp:138-162).
    Although deposits never reach the headroom limbs, a NEGATIVE
    accumulator value is represented as digits in [0, 2^20) plus a
    borrowed -1 carry that climbs one limb per pass -- once it reaches the
    top limb, stripping it would corrupt the value by +2^(20*L).  Keeping
    the top limb whole is value-preserving for every carry state.
    """
    c = limbs >> LIMB_BITS  # arithmetic shift: floor division by 2^20
    low = limbs - (c << LIMB_BITS)
    idx = jnp.arange(limbs.shape[-1])
    low = jnp.where(idx == limbs.shape[-1] - 1, limbs, low)  # keep top whole
    c_up = jnp.roll(c, 1, axis=-1)
    # zero the wrapped-around top carry entering limb 0
    c_up = jnp.where(idx == 0, jnp.zeros_like(c_up), c_up)
    return low + c_up


def to_int32_limbs(limbs, passes: int = 2):
    """Renormalize wide (e.g. int64) limbs into int32-safe range."""
    x = limbs.astype(_I64)
    for _ in range(passes):
        x = renorm_pass(x)
    return x.astype(jnp.int32)


def merge(accs: Superacc, axis: int = 0) -> Superacc:
    """Exact merge (sum) of a batch of superaccumulators along ``axis``.

    Inputs are cast to int64 for the reduction, then renormalized back to
    int32.  Mirrors the reference's limb-wise reductions (TBBlongsum join,
    ExSUM.cpp:122-168; MPI_Reduce of limbs, ExSUM.cpp:266-273).
    """
    limbs = jnp.sum(accs.limbs.astype(_I64), axis=axis)
    special = jnp.sum(accs.special.astype(_I64), axis=axis)
    return Superacc(
        limbs=to_int32_limbs(limbs),
        special=special.astype(jnp.int32),
        fmt=accs.fmt,
    )


# ---------------------------------------------------------------------------
# XLA-level deposits (reference implementations; kernels mirror these)
# ---------------------------------------------------------------------------

def accumulate_sum_terms(hi, lo, fmt: AccFormat) -> Superacc:
    """Exact sum of doubles (given as u32 bit pairs) into one Superacc.

    Pure-XLA path via segment sums; used as the correctness anchor that the
    Pallas kernels must match bit-for-bit, and as the fallback backend on
    hosts without Pallas support.
    """
    t = _dep.sum_terms(hi.reshape(-1), lo.reshape(-1), fmt.offset_bits)
    q = t["q"].astype(jnp.int32)
    limbs = jnp.zeros((fmt.n_limbs,), _I64)
    for off, piece in enumerate(t["pieces"]):
        limbs = limbs + jax.ops.segment_sum(
            piece.astype(_I64), q + off, num_segments=fmt.n_limbs
        )
    special = jnp.stack(
        [jnp.sum(t["nan"].astype(_I64)),
         jnp.sum(t["pinf"].astype(_I64)),
         jnp.sum(t["ninf"].astype(_I64))]
    )
    return Superacc(
        limbs=to_int32_limbs(limbs),
        special=special.astype(jnp.int32),
        fmt=fmt,
    )


def accumulate_dot_terms(hi_a, lo_a, hi_b, lo_b, fmt: AccFormat) -> Superacc:
    """Exact dot product deposit (XLA segment-sum path)."""
    t = _dep.product_terms(
        hi_a.reshape(-1), lo_a.reshape(-1),
        hi_b.reshape(-1), lo_b.reshape(-1), fmt.offset_bits,
    )
    q = t["q"].astype(jnp.int32)
    r = t["r"]
    s = t["s"].astype(_I64)
    limbs = jnp.zeros((fmt.n_limbs,), _I64)
    for k, cls in enumerate(t["classes"]):
        # class k sits at bit offset 14k above the product LSB
        pbit = r + 14 * k
        dq = pbit // LIMB_BITS
        rr = pbit - dq * LIMB_BITS
        p0, p1, p2 = _dep.split_value30(cls, rr)
        for off, piece in enumerate((p0, p1, p2)):
            limbs = limbs + jax.ops.segment_sum(
                piece.astype(_I64) * s, q + dq + off,
                num_segments=fmt.n_limbs,
            )
    special = jnp.stack(
        [jnp.sum(t["nan"].astype(_I64)),
         jnp.sum(t["pinf"].astype(_I64)),
         jnp.sum(t["ninf"].astype(_I64))]
    )
    return Superacc(
        limbs=to_int32_limbs(limbs),
        special=special.astype(jnp.int32),
        fmt=fmt,
    )


def empty_special():
    return jnp.zeros((N_SPECIAL,), jnp.int32)
