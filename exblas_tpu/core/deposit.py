"""Branch-free decomposition of doubles (and exact double products) into
base-2^20 limb deposits.

This replaces the reference's ``Superaccumulator::Accumulate(double)`` mantissa
slicing (reference superaccumulator.hpp:173-194: ``exponent(x)/52`` indexing +
rint-and-rescale) and its FMA ``TwoProductFMA`` (reference ExDOT.FPE.cl:25-28)
with pure int32 bit arithmetic:

* a double contributes ``mant53 << r`` at limb index ``q`` where the bit
  position of its significand LSB is ``p = E + offset_bits``, ``q = p // 20``,
  ``r = p % 20`` -- four 20-bit pieces;
* an exact 106-bit product ``mant_a * mant_b`` is formed from 14-bit mantissa
  pieces (16 int32 multiplies, grouped into 7 "shift classes" of < 2^30 each,
  exactly like a schoolbook multiply) and deposited class by class.

Everything here is shape-polymorphic jnp code on int32/uint32, valid both at
the XLA level and inside Pallas TPU kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ieee import decode_fields
from .types import F64_EXP_SPECIAL, LIMB_BITS, LIMB_MASK

_U = jnp.uint32
_I = jnp.int32


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _clip_i32(x, lo: int, hi: int):
    """Clamp int32 (Mosaic-safe: jnp.clip/minimum on uint32 or with Python
    bounds mis-lowers on TPU -- int32 min/max with typed literals only)."""
    return jnp.minimum(jnp.maximum(x, _I(lo)), _I(hi))


def split_value30(c, r):
    """Split ``c * 2^r`` (c uint32 < 2^30, 0 <= r < 20) into three limb pieces.

    Returns (p0, p1, p2) uint32, each < 2^20, at limb offsets 0, 1, 2.
    """
    c = _u(c)
    r = _u(r)
    lo20 = c & _U(LIMB_MASK)
    hi = c >> _U(LIMB_BITS)  # < 2^10 when c < 2^30
    p0 = (lo20 << r) & _U(LIMB_MASK)
    # lo20 >> (20 - r) is safe: 1 <= 20 - r <= 20 < 32; when r == 0 it is
    # lo20 >> 20 == 0 as required.
    t = (lo20 >> (_U(LIMB_BITS) - r)) + (hi << r)
    p1 = t & _U(LIMB_MASK)
    p2 = t >> _U(LIMB_BITS)
    return p0, p1, p2


def classify(expfield, mant_hi21, mant_lo32):
    """(is_zero, is_inf, is_nan) for decoded fields."""
    frac_nonzero = jnp.logical_or(
        mant_lo32 != 0, (mant_hi21 & _U(0xFFFFF)) != 0
    )
    is_special = expfield == F64_EXP_SPECIAL
    is_nan = jnp.logical_and(is_special, frac_nonzero)
    is_inf = jnp.logical_and(is_special, jnp.logical_not(frac_nonzero))
    is_zero = jnp.logical_and(
        expfield == 0, jnp.logical_and(mant_lo32 == 0, mant_hi21 == 0)
    )
    return is_zero, is_inf, is_nan


def sum_terms(hi, lo, offset_bits):
    """Decompose doubles into limb deposits for a sum accumulator.

    Returns a dict with (all shaped like ``hi``):
      q       int32  -- base limb index (garbage 0 for invalid terms)
      pieces  tuple of 4 int32 -- signed 20-bit deposits for limbs q..q+3
      nan/pinf/ninf  int32 0/1 -- special counters
    """
    sign, expfield, mant_hi21, mant_lo32 = decode_fields(hi, lo)
    is_zero, is_inf, is_nan = classify(expfield, mant_hi21, mant_lo32)
    valid = jnp.logical_not(
        jnp.logical_or(expfield == F64_EXP_SPECIAL, is_zero)
    )

    # Significand LSB exponent E = max(expfield,1) - 1075; bit position
    # p = E + offset_bits >= 0 by construction of the accumulator format.
    # (offset_bits may be a per-element array for anchored/relative
    # accumulators; deposits that would land below bit 0 are dropped --
    # callers guarantee coverage before dispatching such data.)
    e = jnp.maximum(expfield, 1) - _I(1075)
    p = e + _I(offset_bits)
    valid = jnp.logical_and(valid, p >= 0)
    p = jnp.where(valid, p, _I(0))
    q = p // _I(LIMB_BITS)
    r = p - q * _I(LIMB_BITS)

    s = jnp.where(sign == 1, _I(-1), _I(1))
    s = jnp.where(valid, s, _I(0))
    # shifted significand mant53 << r (<= 73 bits) as three u32 words, then
    # four static 20-bit field extractions -- cheaper than per-piece funnels
    mlo = _u(mant_lo32)
    mhi = _u(mant_hi21)
    ru = _u(r)
    down = _u(_clip_i32(32 - r, 1, 31))
    w0 = mlo << ru
    w1 = jnp.where(r > 0, (mhi << ru) | (mlo >> down), mhi)
    w2 = jnp.where(r > 0, mhi >> down, _U(0))
    m20 = _U(LIMB_MASK)
    p0 = w0 & m20
    p1 = ((w0 >> _U(20)) | (w1 << _U(12))) & m20
    p2 = (w1 >> _U(8)) & m20
    p3 = ((w1 >> _U(28)) | (w2 << _U(4))) & m20
    pieces = tuple(_i(p) * s for p in (p0, p1, p2, p3))
    q = jnp.where(valid, q, _I(0))

    one, zero = _I(1), _I(0)
    nan = jnp.where(is_nan, one, zero)
    pinf = jnp.where(jnp.logical_and(is_inf, sign == 0), one, zero)
    ninf = jnp.where(jnp.logical_and(is_inf, sign == 1), one, zero)
    return dict(q=q, pieces=pieces, valid=valid, nan=nan, pinf=pinf, ninf=ninf)


def segment_deposit_products(limbs_flat, t, seg_base, n_limbs):
    """XLA-level exact deposit of product_terms ``t`` into flattened per-row
    limb accumulators via segment sums.

    limbs_flat: int64 (R * n_limbs,); seg_base: int32 row ids * n_limbs,
    broadcastable against t's arrays.  Returns the updated limbs_flat.
    (Shared by the exgemv/exgemm/extrsv XLA paths and the SpMV app.)
    """
    import jax

    q, r, s = t["q"], t["r"], t["s"].astype(jnp.int64)
    for k, cls in enumerate(t["classes"]):
        pbit = r + 14 * k
        dq = pbit // LIMB_BITS
        rr = pbit - dq * LIMB_BITS
        p0, p1, p2 = split_value30(cls.astype(jnp.uint32), rr)
        for off, piece in enumerate((p0, p1, p2)):
            seg = seg_base + q + dq + off
            limbs_flat = limbs_flat + jax.ops.segment_sum(
                (piece.astype(jnp.int64) * s).reshape(-1),
                seg.reshape(-1),
                num_segments=limbs_flat.shape[0],
            )
    return limbs_flat


def mant_pieces14(mant_hi21, mant_lo32):
    """Split a 53-bit significand into four 14-bit pieces (LSB first)."""
    mlo = _u(mant_lo32)
    mhi = _u(mant_hi21)
    p0 = mlo & _U(0x3FFF)
    p1 = (mlo >> 14) & _U(0x3FFF)
    p2 = ((mlo >> 28) | (mhi << 4)) & _U(0x3FFF)
    p3 = (mhi >> 10) & _U(0x3FFF)
    return p0, p1, p2, p3


def product_terms(hi_a, lo_a, hi_b, lo_b, offset_bits):
    """Decompose exact products a[i]*b[i] into limb deposits.

    The 106-bit product mant_a*mant_b is computed exactly as 7 shift classes
    ``S_k = sum_{i+j=k} A_i*B_j < 2^30`` at bit offsets 14k.  Each class is
    deposited independently; with a dot-format accumulator (offset 2148) even
    products that would underflow double precision are kept exactly.

    Returns a dict with:
      q        int32 -- base limb index of the product LSB
      r        int32 -- bit offset within limb q
      classes  tuple of 7 int32 (unsigned magnitude < 2^30)
      s        int32 -- overall sign (+1/-1/0-if-invalid)
      nan/pinf/ninf counters (0*Inf -> NaN, Inf*finite -> Inf, NaN -> NaN)
    """
    sign_a, exp_a, mhi_a, mlo_a = decode_fields(hi_a, lo_a)
    sign_b, exp_b, mhi_b, mlo_b = decode_fields(hi_b, lo_b)
    zero_a, inf_a, nan_a = classify(exp_a, mhi_a, mlo_a)
    zero_b, inf_b, nan_b = classify(exp_b, mhi_b, mlo_b)

    sign = jnp.bitwise_xor(sign_a, sign_b)
    any_nan = jnp.logical_or(nan_a, nan_b)
    inf_times_zero = jnp.logical_or(
        jnp.logical_and(inf_a, zero_b), jnp.logical_and(inf_b, zero_a)
    )
    is_nan = jnp.logical_or(any_nan, inf_times_zero)
    is_inf = jnp.logical_and(
        jnp.logical_or(inf_a, inf_b), jnp.logical_not(is_nan)
    )
    special = jnp.logical_or(exp_a == F64_EXP_SPECIAL, exp_b == F64_EXP_SPECIAL)
    valid = jnp.logical_not(
        jnp.logical_or(special, jnp.logical_or(zero_a, zero_b))
    )

    e_a = jnp.maximum(exp_a, 1) - _I(1075)
    e_b = jnp.maximum(exp_b, 1) - _I(1075)
    p = e_a + e_b + _I(offset_bits)  # >= 0 for dot format
    # offset_bits may be per-element (relative accumulators); drop deposits
    # below bit 0 -- coverage is the caller's contract.
    valid = jnp.logical_and(valid, p >= 0)
    p = jnp.where(valid, p, _I(0))
    q = p // _I(LIMB_BITS)
    r = p - q * _I(LIMB_BITS)

    a = mant_pieces14(mhi_a, mlo_a)
    b = mant_pieces14(mhi_b, mlo_b)
    classes = []
    for k in range(7):
        acc = None
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                term = _i(a[i]) * _i(b[j])  # < 2^28
                acc = term if acc is None else acc + term
        classes.append(acc)  # < 2^30

    s = jnp.where(sign == 1, _I(-1), _I(1))
    s = jnp.where(valid, s, _I(0))
    q = jnp.where(valid, q, _I(0))
    r = jnp.where(valid, r, _I(0))

    one, zero = _I(1), _I(0)
    nan = jnp.where(is_nan, one, zero)
    pinf = jnp.where(jnp.logical_and(is_inf, sign == 0), one, zero)
    ninf = jnp.where(jnp.logical_and(is_inf, sign == 1), one, zero)
    return dict(
        q=q, r=r, classes=tuple(classes), s=s, valid=valid,
        nan=nan, pinf=pinf, ninf=ninf,
    )
