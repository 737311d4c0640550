"""In-kernel (Pallas) correctly-rounded conversion of lane-parallel
superaccumulators to binary64 bit pairs.

Operates on the (L*8, 128) phase-layout accumulator used by the GEMV/GEMM
kernels: 128 independent accumulators (one per lane), each with L limbs x 8
k-phase rows.  Everything is int32/uint32; the per-lane dynamic "find the
leading limb" is done without cross-lane gathers by streaming all L limb
rows through vectorized max / shift-accumulate passes.

Counterpart of the reference's on-device Round() in its completion kernels
(ExSUM.FPE.cl:393-453 runs Round on the GPU after the merge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...core.rounding import ieee_encode_round_pair
from ...core.types import LIMB_BITS, LIMB_MASK

_I = jnp.int32
_U = jnp.uint32
LANES = 128


def _msb20(d):
    """msb index of int32 d in [1, 2^20) via the exact f32-exponent trick."""
    f = jnp.maximum(d, _I(1)).astype(jnp.float32)
    return (
        (jax.lax.bitcast_convert_type(f, _U) >> _U(23)).astype(_I) - _I(127)
    )


def round_phase_acc(acc_ref, spec_rows, n_limbs, offset_bits, dig_scratch):
    """Round a (L*8, 128) phase accumulator to (hi32, lo32), both (1, 128).

    acc_ref: VMEM ref (n_limbs*8, 128) int32 (phase layout).
    spec_rows: (3, 128) int32 array of NaN/+Inf/-Inf counts per lane.
    dig_scratch: VMEM ref (n_limbs, 128) int32 for canonical digits.
    """
    L = n_limbs

    # Phase merge + canonicalize + conditional negate, one pass per limb.
    def canon(j, carry):
        row = jnp.sum(
            acc_ref[pl.ds(j * 8, 8), :], axis=0, keepdims=True, dtype=_I
        )
        d = row + carry
        digit = d & _I(LIMB_MASK)
        dig_scratch[pl.ds(j, 1), :] = digit
        return (d - digit) >> _I(LIMB_BITS)

    carry_out = jax.lax.fori_loop(
        _I(0), _I(L), canon, jnp.zeros((1, LANES), _I)
    )
    negative = carry_out < 0  # (1, 128)

    def negate(j, borrow):
        d = dig_scratch[pl.ds(j, 1), :]
        t = (d ^ _I(LIMB_MASK)) + borrow
        nd = t & _I(LIMB_MASK)
        dig_scratch[pl.ds(j, 1), :] = jnp.where(negative, nd, d)
        return t >> _I(LIMB_BITS)

    jax.lax.fori_loop(_I(0), _I(L), negate, jnp.ones((1, LANES), _I))

    # Leading bit position P per lane (-1 if the accumulator is zero).
    def find_p(j, p):
        d = dig_scratch[pl.ds(j, 1), :]
        cand = _I(LIMB_BITS) * j + _msb20(d)
        return jnp.where(d != 0, jnp.maximum(p, cand), p)

    p_msb = jax.lax.fori_loop(
        _I(0), _I(L), find_p, jnp.full((1, LANES), -1, _I)
    )

    # Accumulate the 55-bit window [P-54, P] and the sticky tail.
    pos_low = p_msb - _I(54)

    def window(j, st):
        w_hi, w_lo, sticky = st
        d = _u(dig_scratch[pl.ds(j, 1), :])
        s = _I(LIMB_BITS) * j - pos_low  # this limb's lsb lands at bit s
        # contribution to window bits [s, s+20):
        in_lo = jnp.logical_and(s > -20, s < 32)
        in_hi = jnp.logical_and(s > 12, s < 55)
        sh_l = _u(_clip(s, 0, 31))
        sh_nl = _u(_clip(-s, 0, 31))
        lo_part = jnp.where(
            s >= 0, (d << sh_l), (d >> sh_nl)
        )
        w_lo = jnp.where(in_lo, w_lo | lo_part, w_lo)
        sh32 = _u(_clip(s - 32, 0, 31))
        sh32n = _u(_clip(32 - s, 0, 31))
        hi_part = jnp.where(s >= 32, d << sh32, d >> sh32n)
        w_hi = jnp.where(in_hi, w_hi | hi_part, w_hi)
        # sticky: bits strictly below pos_low (int32 0/1 carry: boolean
        # vector loop carries fail to legalize in Mosaic's scf.for)
        below_all = s <= _I(-20)
        part_mask = (_U(1) << sh_nl) - _U(1)
        part = jnp.logical_and(
            jnp.logical_and(s < 0, jnp.logical_not(below_all)),
            (d & part_mask) != 0,
        )
        hit = jnp.logical_or(jnp.logical_and(below_all, d != 0), part)
        sticky = sticky | jnp.where(hit, _I(1), _I(0))
        return w_hi, w_lo, sticky

    w_hi, w_lo, sticky_i = jax.lax.fori_loop(
        _I(0), _I(L), window,
        (jnp.zeros((1, LANES), _U), jnp.zeros((1, LANES), _U),
         jnp.zeros((1, LANES), _I)),
    )
    sticky = sticky_i != 0
    m55_hi = w_hi & _U(0x7FFFFF)
    m55_lo = w_lo

    sign = jnp.where(negative, _I(1), _I(0))
    e_msb = p_msb - _I(offset_bits)
    hi32, lo32 = ieee_encode_round_pair(sign, e_msb, m55_hi, m55_lo, sticky)

    # Zero accumulator -> +0.
    is_zero = p_msb < 0
    hi32 = jnp.where(is_zero, _U(0), hi32)
    lo32 = jnp.where(is_zero, _U(0), lo32)

    # Specials.
    nan_c = spec_rows[0:1, :]
    pos_c = spec_rows[1:2, :]
    neg_c = spec_rows[2:3, :]
    is_nan = jnp.logical_or(nan_c > 0, jnp.logical_and(pos_c > 0, neg_c > 0))
    hi32 = jnp.where(neg_c > 0, _U(0xFFF00000), hi32)
    lo32 = jnp.where(neg_c > 0, _U(0), lo32)
    hi32 = jnp.where(pos_c > 0, _U(0x7FF00000), hi32)
    lo32 = jnp.where(pos_c > 0, _U(0), lo32)
    hi32 = jnp.where(is_nan, _U(0x7FF80000), hi32)
    lo32 = jnp.where(is_nan, _U(0), lo32)
    return hi32, lo32


def _u(x):
    return x.astype(jnp.uint32)


def _clip(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, _I(lo)), _I(hi))

def _lsb20(d):
    return _msb20(d & (-d))


def round_lanes_acc(dacc, spec, n_limbs, offset_bits, e_adjust=None,
                    j_lo=None, j_hi=None):
    """Correctly round all 128 lane accumulators of dacc (L, 128) at once.

    ``offset_bits`` positions absolute accumulators (bit p of the
    accumulator has exponent ``p - offset_bits``).  For *relative*
    accumulators pass ``e_adjust`` (a (1, 128) int32 row): bit p then has
    exponent ``p + e_adjust[lane]`` (used by the MXU GEMV kernel whose
    accumulator is anchored per output row).

    ``j_lo``/``j_hi`` (traced int32 scalars) optionally bound the occupied
    limb range [j_lo, j_hi]; every limb outside MUST be zero.  The TRSV
    diagonal solve tracks its deposit windows and passes them here, cutting
    pass 1 from n_limbs (216) iterations to the ~10-limb live range.
    An empty range (j_lo > j_hi) rounds to +0.

    Pass 1 canonicalizes (sequential carry chain over the live limbs)
    *with write-back* -- dacc limbs stay canonical, so per-step deposit
    growth can never overflow -- while tracking, per lane: the leading-bit
    position of the positive and of the negated digit stream, and the
    lowest set bit (which yields the sticky exactly and lets the negated
    digits be reconstructed pointwise in pass 2).  Pass 2 assembles the
    55-bit leading window over at most a handful of limbs.

    Returns (hi32, lo32) of shape (1, 128).
    """
    if j_lo is None:
        j_lo = _I(0)
    if j_hi is None:
        j_hi = _I(n_limbs - 1)

    def pass1(j, st):
        carry, seen, p_pos, p_neg, q_lsb = st
        row = dacc[pl.ds(j, 1), :]
        d = row + carry
        digit = d & _I(LIMB_MASK)
        carry = (d - digit) >> _I(LIMB_BITS)
        dacc[pl.ds(j, 1), :] = digit
        nz = digit != 0
        is_jq = jnp.logical_and(nz, seen == 0)
        q_lsb = jnp.where(
            is_jq, _I(LIMB_BITS) * j + _lsb20(digit), q_lsb)
        nd = (digit ^ _I(LIMB_MASK)) + jnp.where(is_jq, _I(1), _I(0))
        valid_nd = jnp.logical_and(
            nd != 0, jnp.logical_or(seen != 0, is_jq))
        p_neg = jnp.where(
            valid_nd,
            jnp.maximum(p_neg, _I(LIMB_BITS) * j + _msb20(nd)), p_neg)
        p_pos = jnp.where(
            nz, jnp.maximum(p_pos, _I(LIMB_BITS) * j + _msb20(digit)), p_pos)
        seen = jnp.where(nz, _I(1), seen)
        return carry, seen, p_pos, p_neg, q_lsb

    zero_row = jnp.zeros((1, LANES), _I)
    carry, _, p_pos, p_neg, q_lsb = jax.lax.fori_loop(
        j_lo, j_hi + 1, pass1,
        (zero_row, zero_row, jnp.full((1, LANES), -1, _I),
         jnp.full((1, LANES), -1, _I), jnp.full((1, LANES), n_limbs * LIMB_BITS + 99, _I)),
    )
    # Final carry is in {-1, 0} by format headroom; fold it into the top limb
    # so dacc keeps representing the exact value (pass 2 masks it back out).
    # (Empty range: carry is 0, the clamped write is a no-op.)
    j_top = jnp.clip(j_hi, _I(0), _I(n_limbs - 1))
    dacc[pl.ds(j_top, 1), :] += carry << _I(LIMB_BITS)
    negative = carry < 0

    p_msb = jnp.where(negative, p_neg, p_pos)
    pos_low = p_msb - _I(54)
    jq = q_lsb // _I(LIMB_BITS)

    j_lo = jnp.maximum(jnp.min(pos_low) // _I(LIMB_BITS), _I(0))
    j_hi = jnp.max(p_msb) // _I(LIMB_BITS)

    def pass2(j, st):
        w_hi, w_lo = st
        draw = dacc[pl.ds(j, 1), :] & _I(LIMB_MASK)
        nd = (draw ^ _I(LIMB_MASK)) + jnp.where(jq == j, _I(1), _I(0))
        nd = jnp.where(j < jq, _I(0), nd)
        d = _u(jnp.where(negative, nd, draw))
        s = _I(LIMB_BITS) * j - pos_low  # this limb's lsb lands at bit s
        in_lo = jnp.logical_and(s > -20, s < 32)
        in_hi = jnp.logical_and(s > 12, s < 55)
        sh_l = _u(_clip(s, 0, 31)) & _U(31)
        sh_nl = _u(_clip(-s, 0, 31)) & _U(31)
        lo_part = jnp.where(s >= 0, d << sh_l, d >> sh_nl)
        w_lo = jnp.where(in_lo, w_lo | lo_part, w_lo)
        sh32 = _u(_clip(s - 32, 0, 31)) & _U(31)
        sh32n = _u(_clip(32 - s, 0, 31)) & _U(31)
        hi_part = jnp.where(s >= 32, d << sh32, d >> sh32n)
        w_hi = jnp.where(in_hi, w_hi | hi_part, w_hi)
        return w_hi, w_lo

    w_hi, w_lo = jax.lax.fori_loop(
        j_lo, j_hi + 1, pass2,
        (jnp.zeros((1, LANES), _U), jnp.zeros((1, LANES), _U)),
    )
    sticky = q_lsb < pos_low
    m55_hi = w_hi & _U(0x7FFFFF)
    m55_lo = w_lo

    sign = jnp.where(negative, _I(1), _I(0))
    if e_adjust is None:
        e_msb = p_msb - _I(offset_bits)
    else:
        e_msb = p_msb + e_adjust
    hi32, lo32 = ieee_encode_round_pair(sign, e_msb, m55_hi, m55_lo, sticky)

    is_zero = p_msb < 0
    hi32 = jnp.where(is_zero, _U(0), hi32)
    lo32 = jnp.where(is_zero, _U(0), lo32)

    nan_c = spec[0:1, :]
    pos_c = spec[1:2, :]
    neg_c = spec[2:3, :]
    is_nan = jnp.logical_or(nan_c > 0, jnp.logical_and(pos_c > 0, neg_c > 0))
    hi32 = jnp.where(neg_c > 0, _U(0xFFF00000), hi32)
    lo32 = jnp.where(neg_c > 0, _U(0), lo32)
    hi32 = jnp.where(pos_c > 0, _U(0x7FF00000), hi32)
    lo32 = jnp.where(pos_c > 0, _U(0), lo32)
    hi32 = jnp.where(is_nan, _U(0x7FF80000), hi32)
    lo32 = jnp.where(is_nan, _U(0), lo32)
    return hi32, lo32
