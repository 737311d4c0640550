"""Correctly-rounded conversion: superaccumulator limbs -> IEEE binary64 bits.

The reference rounds via Normalize + leading-limb search + a three-way
round-to-odd combination (Boldo-Melquiond; reference superaccumulator.cpp:80-162).
Because our accumulator value is an exact integer, we instead round the exact
value directly to nearest-even -- same correctly-rounded result, simpler to
verify, and expressible entirely in integer ops (the TPU cannot do fp64 float
arithmetic at all, so the result double is *assembled bitwise*).

Everything below runs in int32/uint32 (wide int64 limb sums are first
compressed by vectorized carry passes): int64 arithmetic is emulated on TPU
and -- much worse -- int64-heavy graphs take *minutes* to compile through the
x64-rewriting pass, so int64/uint64 appear only in trivial constant-shift
packs.
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
_I32 = jnp.int32
_U32 = jnp.uint32

QNAN_BITS = jnp.uint64(0x7FF8000000000000)
PINF_BITS = jnp.uint64(0x7FF0000000000000)
NINF_BITS = jnp.uint64(0xFFF0000000000000)


def canonicalize_digits(limbs):
    """Propagate carries: signed limbs (..., L) -> (digits, negative).

    digits: int32 (..., L), each in [0, 2^20) -- base-2^20 representation of
    |V| if V >= 0, or of 2^(20L) - |V| if V < 0 (two's complement).
    negative: bool (...,) -- sign of the exact value.

    int32 limbs are scanned directly (running carries stay < 2^12); wider
    limbs are scanned in int64.  (An earlier version compressed int64
    limbs to int32 with vectorized carry passes whose top-limb carry was
    dropped -- that corrupts "parked" representations of negative values,
    where the digits are in [0, 2^20) and a borrowed carry sits in the
    top limb; the direct int64 scan is value-exact for every
    representation with |V| < 2^(20L).)
    """
    if limbs.dtype == jnp.int32:
        x = jnp.moveaxis(limbs, -1, 0)   # (L, ...)

        def step(carry, limb):
            d = limb + carry
            digit = d & _I32(LIMB_MASK)
            return (d - digit) >> _I32(LIMB_BITS), digit

        carry_out, digits = jax.lax.scan(
            step, jnp.zeros(x.shape[1:], _I32), x, unroll=8
        )
    else:
        x = jnp.moveaxis(limbs.astype(_I64), -1, 0)

        def step(carry, limb):
            d = limb + carry
            digit = d & _I64(LIMB_MASK)
            return (d - digit) >> _I64(LIMB_BITS), digit.astype(_I32)

        carry_out, digits = jax.lax.scan(
            step, jnp.zeros(x.shape[1:], _I64), x, unroll=8
        )
    negative = carry_out < 0
    return jnp.moveaxis(digits, 0, -1), negative


def negate_digits(digits):
    """Two's complement negation in base 2^20: 2^(20L) - D."""
    x = jnp.moveaxis(digits, -1, 0)

    def step(carry, digit):
        t = (digit ^ _I32(LIMB_MASK)) + carry
        return t >> _I32(LIMB_BITS), t & _I32(LIMB_MASK)

    _, out = jax.lax.scan(step, jnp.ones(x.shape[1:], _I32), x, unroll=8)
    return jnp.moveaxis(out, 0, -1)


def rel_limbs_to_abs_limbs(rel, p0, fmt: AccFormat):
    """Shift RELATIVE int64 limbs into an ABSOLUTE accumulator frame.

    rel: (Lr,) int64 redundant limbs of one exact value; rel bit 0 lands
    at absolute bit ``p0`` (an int32 scalar that already includes
    ``fmt.offset_bits``).  Returns (fmt.n_limbs,) int64 absolute limbs --
    the distributed psum wire frame shared with the VPU/XLA accumulators.

    Precondition (callers' windows guarantee it): the represented value
    is an integer multiple of absolute bit 0, so canonical digits
    entirely below bit 0 are zero and at most one digit straddles it
    (folded with an exact right shift).  Used by the MXU sum/dot
    Superacc twins (kernels/sum_mxu.py, kernels/dot_mxu.py).
    """
    digits, negative = canonicalize_digits(rel[None, :])
    mag = jnp.where(negative[:, None], negate_digits(digits), digits)[0]
    sgn = jnp.where(negative[0], _I64(-1), _I64(1))

    q0 = p0 // _I32(LIMB_BITS)
    rb = (p0 - q0 * _I32(LIMB_BITS)).astype(_I64)
    qs = jnp.arange(fmt.n_limbs, dtype=_I32)
    abs_limbs = jnp.zeros((fmt.n_limbs,), _I64)
    for j in range(rel.shape[0]):
        q = q0 + _I32(j)
        vj = (mag[j].astype(_I64) << rb) * sgn          # |vj| < 2^40
        sh = (jnp.maximum(-q, 0) * _I32(LIMB_BITS)).astype(_I64)
        vj = jnp.where(sh > _I64(LIMB_BITS + 19), _I64(0),
                       vj >> jnp.minimum(sh, _I64(62)))
        abs_limbs = abs_limbs + jnp.where(
            qs == jnp.maximum(q, _I32(0)), vj, _I64(0))
    return abs_limbs


def _msb_index20(d):
    """Index of the most significant set bit of int32 d in [1, 2^20)."""
    f = d.astype(jnp.float32)  # exact: d < 2^24
    return (
        (jax.lax.bitcast_convert_type(f, _U32) >> _U32(23)).astype(_I32)
        - _I32(127)
    )


def _u32(x):
    return x.astype(_U32)


def _clip32(x, lo, hi):
    return jnp.minimum(jnp.maximum(x.astype(_I32), _I32(lo)), _I32(hi))


def _pair_shr(mh, ml, c):
    """(mh:ml) >> c for a 55-bit value in u32 words, c int32 in [0, 63].

    Returns (oh, ol).  All variable shifts are on uint32 (variable uint64
    shifts compile catastrophically under TPU int64 emulation).
    """
    c_lo = _u32(_clip32(c, 0, 31))
    up = _u32(_clip32(32 - c, 0, 31))
    ol_small = (ml >> c_lo) | jnp.where(c > 0, mh << up, _U32(0))
    oh_small = mh >> c_lo
    c_hi = _u32(_clip32(c - 32, 0, 31))
    ol_big = mh >> c_hi
    big = c >= 32
    ol = jnp.where(big, ol_big, ol_small)
    oh = jnp.where(big, _U32(0), oh_small)
    return oh, ol


def _pair_bit(mh, ml, k):
    """Bit k of (mh:ml), k int32 in [0, 54]."""
    lo_bit = (ml >> _u32(_clip32(k, 0, 31))) & _U32(1)
    hi_bit = (mh >> _u32(_clip32(k - 32, 0, 31))) & _U32(1)
    return jnp.where(k < 32, lo_bit, hi_bit)


def _pair_low_mask_nonzero(mh, ml, k):
    """Any of bits [0, k) of (mh:ml) set?  k int32 in [0, 55]."""
    k_lo = _clip32(k, 0, 32)
    ml_masked = jnp.where(
        k_lo >= 32, ml, ml & ((_U32(1) << _u32(_clip32(k_lo, 0, 31))) - _U32(1))
    )
    k_hi = _clip32(k - 32, 0, 23)
    mh_masked = mh & ((_U32(1) << _u32(k_hi)) - _U32(1))
    return jnp.logical_or(ml_masked != 0, mh_masked != 0)


def ieee_encode_round_pair(sign, e_msb, m55_hi, m55_lo, sticky_below):
    """Encode and round a positive value ``m55 * 2^(e_msb - 54)`` (+ sticky
    tail strictly below) to binary64 bits, round-to-nearest-even.

    sign: int32 0/1.  e_msb: int32, unbiased exponent of the leading bit
    (bit 54 of m55 is set).  m55 is a 55-bit value in two uint32 words
    (m55_hi = bits 32..54, m55_lo = bits 0..31).  sticky_below: bool.

    Returns (hi32, lo32) uint32 words -- pure int32/uint32 ops, usable
    inside Pallas kernels.  Handles overflow (-> Inf) and subnormals.
    """
    mh = _u32(m55_hi)
    ml = _u32(m55_lo)
    e = e_msb.astype(_I32)
    sign = sign.astype(_U32)
    sticky_below = sticky_below.astype(jnp.bool_)

    # Shift distance: 2 for normals; 2 + (-1022 - e) for subnormals.
    subn = e < _I32(-1022)
    d = jnp.where(subn, _I32(-1022) - e, _I32(0))
    c = _clip32(d + 2, 2, 63)

    m53h, m53l = _pair_shr(mh, ml, c)       # candidate 53-bit mantissa
    guard = _pair_bit(mh, ml, c - _I32(1))
    sticky = jnp.logical_or(
        sticky_below, _pair_low_mask_nonzero(mh, ml, c - _I32(1))
    )
    # Deep underflow: everything dropped.
    deep = d >= _I32(60)
    m53h = jnp.where(deep, _U32(0), m53h)
    m53l = jnp.where(deep, _U32(0), m53l)
    guard = jnp.where(deep, _U32(0), guard)
    sticky = jnp.logical_or(sticky, deep)

    round_up = jnp.logical_and(
        guard != 0, jnp.logical_or(sticky, (m53l & _U32(1)) != 0)
    )
    ru = jnp.where(round_up, _U32(1), _U32(0))
    ml2 = m53l + ru
    carry = jnp.where(
        jnp.logical_and(ru != 0, ml2 == 0), _U32(1), _U32(0)
    )
    mh2 = m53h + carry

    # Mantissa overflow on round-up (normal path): 2^53 -> 2^52, e += 1.
    overflowed = jnp.logical_and(
        jnp.logical_not(subn),
        jnp.logical_and(mh2 == _U32(1 << 21), ml2 == 0),
    )
    mh2 = jnp.where(overflowed, _U32(1 << 20), mh2)
    e = e + jnp.where(overflowed, _I32(1), _I32(0))

    # Encode: frac = m & (2^52 - 1); subnormal expfield = bit 52 of m (a
    # subnormal that rounded up to 2^52 becomes the smallest normal).
    frac_hi = mh2 & _U32(0xFFFFF)
    expf_n = e + _I32(1023)
    expf = jnp.where(subn, ((mh2 >> _U32(20)) & _U32(1)).astype(_I32), expf_n)

    hi32 = (sign << _U32(31)) | (_u32(expf) << _U32(20)) | frac_hi
    lo32 = ml2
    # Overflow to infinity.
    over = jnp.logical_and(jnp.logical_not(subn), expf >= 2047)
    hi32 = jnp.where(over, (sign << _U32(31)) | _U32(0x7FF00000), hi32)
    lo32 = jnp.where(over, _U32(0), lo32)
    return hi32, lo32


def ieee_encode_round(sign, e_msb, m55_hi, m55_lo, sticky_below):
    """As :func:`ieee_encode_round_pair` but packed to uint64 (XLA level)."""
    hi32, lo32 = ieee_encode_round_pair(sign, e_msb, m55_hi, m55_lo,
                                        sticky_below)
    return (hi32.astype(_U64) << _U64(32)) | lo32.astype(_U64)


def round_digits_to_f64_bits(digits, negative, fmt: AccFormat,
                             e_adjust=None):
    """Round canonical base-2^20 digits (..., L) to binary64 bits (uint64).

    ``fmt.offset_bits`` positions absolute accumulators (bit p has
    exponent ``p - offset_bits``).  For *relative* accumulators pass
    ``e_adjust`` (int32, broadcastable to the batch shape): bit p then has
    exponent ``p + e_adjust`` (used by the MXU GEMV epilogue whose limbs
    are anchored per output row).
    """
    n_limbs = fmt.n_limbs
    mag = jnp.where(negative[..., None], negate_digits(digits), digits)

    nonzero = mag != 0
    any_nonzero = jnp.any(nonzero, axis=-1)
    # Highest nonzero digit index.
    rev_arg = jnp.argmax(nonzero[..., ::-1].astype(jnp.int32), axis=-1)
    jstar = _I32(n_limbs - 1) - rev_arg.astype(_I32)
    jstar = jnp.where(any_nonzero, jstar, _I32(0))

    top = jnp.take_along_axis(mag, jstar[..., None], axis=-1)[..., 0]
    top = jnp.maximum(top, _I32(1))  # avoid log of 0 for the all-zero case
    msb = _msb_index20(top)
    p_msb = jstar * _I32(LIMB_BITS) + msb  # bit position of the leading bit

    # Assemble the 55-bit leading window: bits [p_msb - 54, p_msb], zero-padded
    # below bit 0 of the accumulator.  All variable shifts are on uint32.
    pos_low = p_msb - _I32(54)
    j0 = pos_low // _I32(LIMB_BITS)  # floor division (may be negative)
    shift = (pos_low - j0 * _I32(LIMB_BITS)).astype(_I32)  # in [0, 20)

    def digit_at(t):
        idx = j0 + _I32(t)
        valid = jnp.logical_and(idx >= 0, idx < n_limbs)
        safe = jnp.clip(idx, 0, n_limbs - 1)
        v = jnp.take_along_axis(mag, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, v, _I32(0)).astype(_U32)

    d0, d1, d2, d3, d4 = (digit_at(t) for t in range(5))
    # 100-bit window in three u32 words (wrapping shifts keep the low bits).
    w0 = d0 | (d1 << _U32(20))
    w1 = (d1 >> _U32(12)) | (d2 << _U32(8)) | (d3 << _U32(28))
    w2 = (d3 >> _U32(4)) | (d4 << _U32(16))
    sh = _u32(shift)
    up = _u32(_clip32(32 - shift, 0, 31))
    hi_or = lambda a, b: jnp.where(shift > 0, a << up, _U32(0)) | b  # noqa: E731
    ol = hi_or(w1, w0 >> sh)
    oh = hi_or(w2, w1 >> sh)
    m55_lo = ol
    m55_hi = oh & _U32(0x7FFFFF)

    # Sticky: any bit strictly below pos_low.
    idxs = jnp.arange(n_limbs, dtype=_I32)
    below = idxs < j0[..., None]
    sticky = jnp.any(jnp.logical_and(below, nonzero), axis=-1)
    part = jnp.take_along_axis(mag, jnp.clip(j0, 0, n_limbs - 1)[..., None],
                               axis=-1)[..., 0].astype(_U32)
    part_bits = part & ((_U32(1) << sh) - _U32(1))
    sticky = jnp.logical_or(
        sticky, jnp.logical_and(j0 >= 0, part_bits != 0)
    )

    if e_adjust is None:
        e_msb = p_msb - _I32(fmt.offset_bits)
    else:
        e_msb = p_msb + e_adjust
    bits = ieee_encode_round(
        negative.astype(_I32), e_msb, m55_hi, m55_lo, sticky
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
