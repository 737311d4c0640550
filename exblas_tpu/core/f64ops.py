"""Correctly-rounded binary64 multiply and divide on bit patterns.

The TPU cannot execute fp64 float ops (f64 is emulated as f32 pairs and is
not even value-preserving), so the scalar fp64 arithmetic the BLAS-2 routines
need -- ``fl(alpha*x)`` for ExGEMV (reference applies alpha as a plain fp64
multiply before the EFT, ExGEMV.Superacc.cl:238) and the diagonal divide of
ExTRSV (Round-then-divide, ExTRSV.lnn.Superacc.cl:317-340) -- is implemented
here as exact integer arithmetic on bit patterns, vectorized at the XLA level
(u64 mul/div are emulated with int32 pairs on TPU; these are O(n) prologue /
O(block) solve costs, not the hot path).

Both operations are *correctly rounded* (round-to-nearest-even), which is
stronger than the reference's faithfully-rounded divide.

Implementation rules learned on this TPU: variable-amount uint64 shifts
compile catastrophically under int64 emulation, so every variable shift here
is performed on uint32 words; uint64 appears only with constant shift
amounts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ieee import decode_fields
from .deposit import classify
from .rounding import QNAN_BITS, ieee_encode_round, ieee_encode_round_pair

_U64 = jnp.uint64
_U32 = jnp.uint32
_I32 = jnp.int32


def _u64(x):
    return x.astype(_U64)


def _msb53(mhi21, mlo32):
    """Index of the most significant set bit of a nonzero <=53-bit value
    given as u32 words (exact via the f32-exponent trick on <2^24 pieces)."""
    def msb24(v):
        # bitcast u32 -> i32 before max/convert (values are < 2^24 so
        # sign-safe); Mosaic lowers neither u32 max nor u32 -> f32 converts.
        vi = jnp.maximum(jax.lax.bitcast_convert_type(v, _I32), _I32(1))
        f = vi.astype(jnp.float32)  # exact for < 2^24
        return (
            (jax.lax.bitcast_convert_type(f, _U32) >> _U32(23)).astype(_I32)
            - _I32(127)
        )

    hi_nz = mhi21 != 0
    mid = mlo32 >> _U32(24)  # bits 24..31
    mid_nz = mid != 0
    out = jnp.where(
        hi_nz, msb24(mhi21) + _I32(32),
        jnp.where(mid_nz, msb24(mid) + _I32(24), msb24(mlo32 & _U32(0xFFFFFF)))
    )
    return out


def _normalize53_pair(mhi21, mlo32, e_lsb):
    """Shift a nonzero significand left so its msb lands at bit 52; returns
    (hi21, lo32, e_lsb') u32 words with value preserved."""
    msb = _msb53(mhi21, mlo32)
    k = _I32(52) - msb  # in [0, 52]
    k_lo = k.astype(_U32) & _U32(31)
    big = k >= 32
    # left shift by k < 32:
    # (32 - k_lo) & 31 avoids both a u32 max (no Mosaic lowering) and an
    # out-of-range shift; the k_lo == 0 lane reads garbage that the jnp.where
    # discards.
    oh_s = jnp.where(
        k > 0,
        (mhi21 << k_lo) | (mlo32 >> ((_U32(32) - k_lo) & _U32(31))),
        mhi21,
    )
    ol_s = mlo32 << k_lo
    # left shift by k in [32, 52]: result bits 32.. come from mlo only.
    oh_b = mlo32 << k_lo
    ol_b = _U32(0)
    oh = jnp.where(big, oh_b, oh_s)
    ol = jnp.where(big, ol_b, ol_s)
    return oh, ol, e_lsb - k


def _normalize53(mhi21, mlo32, e_lsb):
    oh, ol, e = _normalize53_pair(mhi21, mlo32, e_lsb)
    return (_u64(oh) << _U64(32)) | _u64(ol), e


def _fields_norm_pair(hi, lo):
    """Decode + normalize to u32 words (Pallas-safe: no u64 anywhere)."""
    sign, expf, mhi, mlo = decode_fields(hi, lo)
    zero, inf, nan = classify(expf, mhi, mlo)
    e = jnp.maximum(expf, 1) - _I32(1075)
    # Substitute 1.0's significand for zero/special inputs so the arithmetic
    # below stays well-defined; specials override the result at the end.
    bad = jnp.logical_or(zero, expf == 0x7FF)
    mhi = jnp.where(bad, _U32(1 << 20), mhi)
    mlo = jnp.where(bad, _U32(0), mlo)
    oh, ol, e = _normalize53_pair(mhi, mlo, e)
    return sign, e, oh, ol, zero, inf, nan


def _fields_norm(hi, lo):
    sign, e, oh, ol, zero, inf, nan = _fields_norm_pair(hi, lo)
    mant = (_u64(oh) << _U64(32)) | _u64(ol)
    return sign, e, mant, zero, inf, nan


def _sign_bits(sign):
    return _u64(sign) << _U64(63)


def _apply_specials(bits, sign, is_zero, is_inf, is_nan):
    bits = jnp.where(is_zero, _sign_bits(sign), bits)
    bits = jnp.where(is_inf, _sign_bits(sign) | _U64(0x7FF0000000000000), bits)
    bits = jnp.where(is_nan, QNAN_BITS, bits)
    return bits


def f64_mul(hi_a, lo_a, hi_b, lo_b):
    """Correctly rounded a*b on binary64 bit patterns -> uint64 bits."""
    sa, ea, ma, za, ia, na = _fields_norm(hi_a, lo_a)
    sb, eb, mb, zb, ib, nb = _fields_norm(hi_b, lo_b)
    sign = jnp.bitwise_xor(sa, sb).astype(_I32)

    # Exact 106-bit product via 27-bit halves (u64, constant shifts only).
    # Both mantissas are normalized to [2^52, 2^53), so the product is in
    # [2^104, 2^106): its msb is at 104 or 105.
    a1, a0 = ma >> _U64(27), ma & _U64((1 << 27) - 1)
    b1, b0 = mb >> _U64(27), mb & _U64((1 << 27) - 1)
    p00 = a0 * b0            # < 2^54
    mid = a0 * b1 + a1 * b0  # < 2^54
    p11 = a1 * b1            # < 2^52
    mid_lo = mid & _U64((1 << 37) - 1)
    mid_hi = mid >> _U64(37)
    lo = p00 + (mid_lo << _U64(27))
    c1 = jnp.where(lo < p00, _U64(1), _U64(0))
    lo2 = lo + ((p11 & _U64(0x3FF)) << _U64(54))
    c2 = jnp.where(lo2 < lo, _U64(1), _U64(0))
    hi = (p11 >> _U64(10)) + mid_hi + c1 + c2  # bits 64..105

    top105 = ((hi >> _U64(41)) & _U64(1)) != 0
    m55_105 = (hi << _U64(13)) | (lo2 >> _U64(51))
    m55_104 = (hi << _U64(14)) | (lo2 >> _U64(50))
    m55 = jnp.where(top105, m55_105, m55_104)
    sticky_mask = jnp.where(top105, _U64((1 << 51) - 1), _U64((1 << 50) - 1))
    sticky = (lo2 & sticky_mask) != 0
    e_msb = ea + eb + jnp.where(top105, _I32(105), _I32(104))

    bits = ieee_encode_round(
        sign, e_msb,
        ((m55 >> _U64(32)) & _U64(0x7FFFFF)).astype(_U32),
        (m55 & _U64(0xFFFFFFFF)).astype(_U32),
        sticky,
    )

    any_nan = jnp.logical_or(na, nb)
    inf_x_zero = jnp.logical_or(jnp.logical_and(ia, zb),
                                jnp.logical_and(ib, za))
    is_nan = jnp.logical_or(any_nan, inf_x_zero)
    is_inf = jnp.logical_and(jnp.logical_or(ia, ib), jnp.logical_not(is_nan))
    is_zero = jnp.logical_and(jnp.logical_or(za, zb), jnp.logical_not(is_nan))
    return _apply_specials(bits, sign, is_zero, is_inf, is_nan)


def _pair_geq(ah, al, bh, bl):
    return jnp.logical_or(ah > bh, jnp.logical_and(ah == bh, al >= bl))


def _pair_sub(ah, al, bh, bl):
    """(ah:al) - (bh:bl) for u32 word pairs (caller guarantees a >= b)."""
    borrow = jnp.where(al < bl, _U32(1), _U32(0))
    return ah - bh - borrow, al - bl


def f64_div_pair(hi_a, lo_a, hi_b, lo_b):
    """Correctly rounded a/b on binary64 bit patterns -> (hi32, lo32).

    Pure u32 ops (restoring long division), usable inside Pallas kernels --
    the ExTRSV diagonal solve calls this per substitution step (reference
    Round-then-divide at ExTRSV.lnn.Superacc.cl:317-340; ours is correctly
    rounded, stronger than the reference's faithful divide).
    """
    sa, ea, mah, mal, za, ia, na = _fields_norm_pair(hi_a, lo_a)
    sb, eb, mbh, mbl, zb, ib, nb = _fields_norm_pair(hi_b, lo_b)
    sign = jnp.bitwise_xor(sa, sb).astype(_I32)

    # Q = floor(ma * 2^55 / mb) by restoring division.  Normalized mantissas
    # are in [2^52, 2^53), so ma/mb is in (1/2, 2) and Q in [2^54, 2^56):
    # the top quotient bit (weight 2^55) is ma >= mb; then 55 shift-subtract
    # steps.  The remainder stays < mb < 2^53 (fits a u32 pair).
    bit = _pair_geq(mah, mal, mbh, mbl)
    sh, sl = _pair_sub(mah, mal, mbh, mbl)
    rh = jnp.where(bit, sh, mah)
    rl = jnp.where(bit, sl, mal)
    # Q is shifted in bit by bit (56 bits total: the initial one + 55 loop
    # bits); qh ends up holding Q bits 32..55.
    ql = jnp.where(bit, _U32(1), _U32(0))
    qh = jnp.zeros_like(ql)
    for _ in range(55):
        rh = (rh << _U32(1)) | (rl >> _U32(31))
        rl = rl << _U32(1)
        bit = _pair_geq(rh, rl, mbh, mbl)
        sh, sl = _pair_sub(rh, rl, mbh, mbl)
        rh = jnp.where(bit, sh, rh)
        rl = jnp.where(bit, sl, rl)
        qh = (qh << _U32(1)) | (ql >> _U32(31))
        ql = (ql << _U32(1)) | jnp.where(bit, _U32(1), _U32(0))

    top = (qh >> _U32(23)) != 0  # Q >= 2^55
    m55h = jnp.where(top, (qh >> _U32(1)), qh)
    m55l = jnp.where(top, (ql >> _U32(1)) | (qh << _U32(31)), ql)
    sticky = jnp.logical_or(
        jnp.logical_or(rh != 0, rl != 0),
        jnp.logical_and(top, (ql & _U32(1)) != 0),
    )
    # value = (ma/mb) * 2^(ea-eb) with ma/mb in (1/2, 2): the leading bit sits
    # at ea-eb when ma >= mb (top), else one below.
    e_msb = (ea - eb) + jnp.where(top, _I32(0), _I32(-1))

    hi32, lo32 = ieee_encode_round_pair(
        sign, e_msb, m55h & _U32(0x7FFFFF), m55l, sticky
    )

    any_nan = jnp.logical_or(na, nb)
    is_nan = jnp.logical_or(
        any_nan,
        jnp.logical_or(jnp.logical_and(za, zb), jnp.logical_and(ia, ib)),
    )
    is_inf = jnp.logical_and(
        jnp.logical_or(jnp.logical_and(ia, jnp.logical_not(ib)),
                       jnp.logical_and(zb, jnp.logical_not(za))),
        jnp.logical_not(is_nan),
    )
    is_zero = jnp.logical_and(
        jnp.logical_or(za, ib), jnp.logical_not(is_nan)
    )
    sign_hi = sign.astype(_U32) << _U32(31)
    hi32 = jnp.where(is_zero, sign_hi, hi32)
    lo32 = jnp.where(is_zero, _U32(0), lo32)
    hi32 = jnp.where(is_inf, sign_hi | _U32(0x7FF00000), hi32)
    lo32 = jnp.where(is_inf, _U32(0), lo32)
    hi32 = jnp.where(is_nan, _U32(0x7FF80000), hi32)
    lo32 = jnp.where(is_nan, _U32(0), lo32)
    return hi32, lo32


def f64_div(hi_a, lo_a, hi_b, lo_b):
    """Correctly rounded a/b on binary64 bit patterns -> uint64 bits."""
    hi32, lo32 = f64_div_pair(hi_a, lo_a, hi_b, lo_b)
    return (_u64(hi32) << _U64(32)) | _u64(lo32)
