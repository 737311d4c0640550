"""Correctly-rounded conversion: superaccumulator limbs -> IEEE binary64 bits.

The reference rounds via Normalize + leading-limb search + a three-way
round-to-odd combination (Boldo-Melquiond; reference superaccumulator.cpp:80-162).
Because our accumulator value is an exact integer, we instead round the exact
value directly to nearest-even -- same correctly-rounded result, simpler to
verify, and expressible entirely in integer ops (the TPU cannot do fp64 float
arithmetic at all, so the result double is *assembled bitwise*).

Everything is batched jnp code over int64 at the XLA level (int64 is emulated
with int32 pairs on TPU -- fine for these O(n_limbs) epilogues).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import (
    AccFormat,
    LIMB_BITS,
    LIMB_MASK,
    SPECIAL_NAN,
    SPECIAL_NEG_INF,
    SPECIAL_POS_INF,
    Superacc,
)

_I64 = jnp.int64
_U64 = jnp.uint64

QNAN_BITS = jnp.uint64(0x7FF8000000000000)
PINF_BITS = jnp.uint64(0x7FF0000000000000)
NINF_BITS = jnp.uint64(0xFFF0000000000000)


def canonicalize_digits(limbs):
    """Propagate carries: signed limbs (..., L) -> (digits, negative).

    digits: int64 (..., L), each in [0, 2^20) -- base-2^20 representation of
    |V| if V >= 0, or of 2^(20L) - |V| if V < 0 (two's complement).
    negative: bool (...,) -- sign of the exact value.
    """
    x = jnp.moveaxis(limbs.astype(_I64), -1, 0)  # (L, ...)

    def step(carry, limb):
        d = limb + carry
        digit = d & _I64(LIMB_MASK)
        return (d - digit) >> _I64(LIMB_BITS), digit

    carry_out, digits = jax.lax.scan(step, jnp.zeros(x.shape[1:], _I64), x)
    negative = carry_out < 0
    return jnp.moveaxis(digits, 0, -1), negative


def negate_digits(digits):
    """Two's complement negation in base 2^20: 2^(20L) - D."""
    x = jnp.moveaxis(digits, -1, 0)

    def step(carry, digit):
        t = (digit ^ _I64(LIMB_MASK)) + carry
        return t >> _I64(LIMB_BITS), t & _I64(LIMB_MASK)

    _, out = jax.lax.scan(step, jnp.ones(x.shape[1:], _I64), x)
    return jnp.moveaxis(out, 0, -1)


def _msb_index20(d):
    """Index of the most significant set bit of int64 d in [1, 2^20)."""
    f = d.astype(jnp.float32)  # exact: d < 2^24
    return (
        (jax.lax.bitcast_convert_type(f, jnp.uint32) >> jnp.uint32(23))
        .astype(jnp.int64)
        - _I64(127)
    )


def ieee_encode_round(sign, e_msb, m55, sticky_below):
    """Encode and round a positive value ``m55 * 2^(e_msb - 54)`` (+ sticky
    tail strictly below) to binary64 bits, round-to-nearest-even.

    sign: int64 0/1.  e_msb: int64, unbiased exponent of the leading bit
    (bit 54 of m55 is set).  m55: uint64 with exactly 55 significant bits.
    sticky_below: bool.

    Returns uint64 IEEE bits.  Handles overflow (-> Inf) and subnormals.
    """
    m55 = m55.astype(_U64)
    e = e_msb.astype(_I64)
    sticky_below = sticky_below.astype(jnp.bool_)

    # ----- normal path: mantissa = top 53 bits, guard = bit 1, rest sticky.
    m53_n = m55 >> _U64(2)
    guard_n = (m55 >> _U64(1)) & _U64(1)
    sticky_n = jnp.logical_or(sticky_below, (m55 & _U64(1)) != 0)

    # ----- subnormal path: shift right by c = 2 + (-1022 - e), collect sticky.
    d = (_I64(-1022) - e).astype(_I64)
    c = jnp.clip(d + 2, 2, 63).astype(_U64)
    m53_s = m55 >> c
    guard_s = (m55 >> (c - _U64(1))) & _U64(1)
    dropped_mask = (_U64(1) << (c - _U64(1))) - _U64(1)
    sticky_s = jnp.logical_or(sticky_below, (m55 & dropped_mask) != 0)
    # Deep underflow: everything dropped.
    deep = d >= _I64(62)
    m53_s = jnp.where(deep, _U64(0), m53_s)
    guard_s = jnp.where(deep, _U64(0), guard_s)
    sticky_s = jnp.logical_or(sticky_s, deep)

    subn = e < _I64(-1022)
    m53 = jnp.where(subn, m53_s, m53_n)
    guard = jnp.where(subn, guard_s, guard_n)
    sticky = jnp.where(subn, sticky_s, sticky_n)

    round_up = jnp.logical_and(
        guard != 0, jnp.logical_or(sticky, (m53 & _U64(1)) != 0)
    )
    m = m53 + round_up.astype(_U64)

    # Mantissa overflow on round-up (normal path): 2^53 -> 2^52, e += 1.
    overflowed = jnp.logical_and(jnp.logical_not(subn), m == _U64(1) << _U64(53))
    m = jnp.where(overflowed, _U64(1) << _U64(52), m)
    e = e + overflowed.astype(_I64)

    # Subnormal that rounded up to 2^52 encodes naturally as the smallest
    # normal: expfield = m >> 52 (0 or 1), frac = m & (2^52-1).
    frac = m & ((_U64(1) << _U64(52)) - _U64(1))
    expf_n = (e + _I64(1023)).astype(_I64)
    expf = jnp.where(subn, (m >> _U64(52)).astype(_I64), expf_n)

    bits = (
        (sign.astype(_U64) << _U64(63))
        | (expf.astype(_U64) << _U64(52))
        | frac
    )
    # Overflow to infinity.
    inf_bits = (sign.astype(_U64) << _U64(63)) | PINF_BITS
    bits = jnp.where(jnp.logical_and(jnp.logical_not(subn), expf >= 2047),
                     inf_bits, bits)
    return bits


def round_digits_to_f64_bits(digits, negative, fmt: AccFormat):
    """Round canonical base-2^20 digits (..., L) to binary64 bits (uint64)."""
    n_limbs = fmt.n_limbs
    mag = jnp.where(negative[..., None], negate_digits(digits), digits)

    nonzero = mag != 0
    any_nonzero = jnp.any(nonzero, axis=-1)
    # Highest nonzero digit index.
    rev_arg = jnp.argmax(nonzero[..., ::-1].astype(jnp.int32), axis=-1)
    jstar = _I64(n_limbs - 1) - rev_arg.astype(_I64)
    jstar = jnp.where(any_nonzero, jstar, _I64(0))

    top = jnp.take_along_axis(mag, jstar[..., None], axis=-1)[..., 0]
    top = jnp.maximum(top, _I64(1))  # avoid log of 0 for the all-zero case
    msb = _msb_index20(top)
    p_msb = jstar * _I64(LIMB_BITS) + msb  # bit position of the leading bit

    # Assemble the 55-bit leading window: bits [p_msb - 54, p_msb], zero-padded
    # below bit 0 of the accumulator.
    pos_low = p_msb - _I64(54)
    j0 = pos_low // _I64(LIMB_BITS)  # floor division (may be negative)
    shift = (pos_low - j0 * _I64(LIMB_BITS)).astype(_U64)  # in [0, 20)

    def digit_at(t):
        idx = j0 + _I64(t)
        valid = jnp.logical_and(idx >= 0, idx < n_limbs)
        safe = jnp.clip(idx, 0, n_limbs - 1)
        v = jnp.take_along_axis(mag, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, v, _I64(0)).astype(_U64)

    d0, d1, d2, d3, d4 = (digit_at(t) for t in range(5))
    wlo = d0 | (d1 << _U64(20)) | (d2 << _U64(40))  # 60 bits
    whi = d3 | (d4 << _U64(20))
    m_all = (wlo >> shift) | (whi << (_U64(60) - shift))
    m55 = m_all & ((_U64(1) << _U64(55)) - _U64(1))

    # Sticky: any bit strictly below pos_low.
    idxs = jnp.arange(n_limbs, dtype=_I64)
    below = idxs < j0[..., None]
    sticky = jnp.any(jnp.logical_and(below, nonzero), axis=-1)
    part = jnp.take_along_axis(mag, jnp.clip(j0, 0, n_limbs - 1)[..., None],
                               axis=-1)[..., 0].astype(_U64)
    part_bits = part & ((_U64(1) << shift) - _U64(1))
    sticky = jnp.logical_or(
        sticky, jnp.logical_and(j0 >= 0, part_bits != 0)
    )

    e_msb = p_msb - _I64(fmt.offset_bits)
    bits = ieee_encode_round(
        negative.astype(_I64), e_msb, m55, sticky
    )
    return jnp.where(any_nonzero, bits, _U64(0))


def round_superacc_to_f64_bits(acc: Superacc):
    """Full epilogue: Superacc -> binary64 bits (uint64), honoring specials.

    Special semantics (deterministic; an upgrade over the reference's open
    NaN/Inf TODO at ExSUM.FPE.hpp:408): any NaN absorbed, or both +Inf and
    -Inf -> canonical qNaN; else any +/-Inf -> that infinity; else the
    correctly rounded finite sum.
    """
    digits, negative = canonicalize_digits(acc.limbs)
    bits = round_digits_to_f64_bits(digits, negative, acc.fmt)

    nan_c = acc.special[..., SPECIAL_NAN]
    pos_c = acc.special[..., SPECIAL_POS_INF]
    neg_c = acc.special[..., SPECIAL_NEG_INF]
    is_nan = jnp.logical_or(
        nan_c > 0, jnp.logical_and(pos_c > 0, neg_c > 0)
    )
    bits = jnp.where(neg_c > 0, NINF_BITS, bits)
    bits = jnp.where(pos_c > 0, PINF_BITS, bits)
    bits = jnp.where(is_nan, QNAN_BITS, bits)
    return bits


def f64_bits_to_hi_lo(bits):
    bits = bits.astype(_U64)
    hi = (bits >> _U64(32)).astype(jnp.uint32)
    lo = (bits & _U64(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo
