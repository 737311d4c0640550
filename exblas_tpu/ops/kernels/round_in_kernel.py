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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# One-launch rounding of a static-position scaled-term sum
# ---------------------------------------------------------------------------
#
# The MXU sum/dot epilogues reduce to "correctly round V = sum_t v_t *
# 2^(p_t)" for <= 128 int64 terms v_t at STATIC bit positions p_t.  Doing
# the limb build + canonicalize + round at the XLA level costs ~150 tiny
# tensor ops -- ~0.1-0.25 ms of pure launch overhead per call on this
# chip, a large slice of the whole n=2^23 dot ladder (DESIGN.md roadmap
# item 3).  This kernel does the entire tail in ONE launch: each lane
# owns one term, deposits its three 16-bit pieces into a per-lane
# relative limb accumulator at its lane's static position, lanes are
# folded exactly (12-bit split through one f32 selection matmul --
# cross-lane compaction has no cheap VPU form, cf. gemv_mxu.
# _fold_byte_lanes), and round_lanes_acc rounds the single result.

def _round_terms_kernel(vl_ref, vm_ref, vh_ref, bof_ref, eadj_ref,
                        out_ref, acc, dacc, *, l_pad):
    bofs = bof_ref[0:1, :]

    # per-lane deposits: term t contributes v_part * 2^(bofs[t] + 16*part).
    # Each (part, term) lands in exactly one limb row j0 = bit//20 with
    # in-limb shift sh in [0, 20): value-preserving split v*2^sh =
    # low + h*2^20 (h arithmetic-shifted: exact for the signed high part
    # too), low -> row j0, h -> row j0+1.
    acc[...] = jnp.zeros_like(acc)
    for part, ref in ((0, vl_ref), (16, vm_ref), (32, vh_ref)):
        v = ref[0:1, :]
        bit = bofs + _I(part)
        for j in range(l_pad):
            sh = bit - _I(LIMB_BITS * j)
            in_w = jnp.logical_and(sh >= 0, sh < _I(LIMB_BITS))
            shp = _clip(sh, 0, LIMB_BITS - 1)
            k = _I(LIMB_BITS) - shp              # in [1, 20]
            h = v >> k
            low = (v - (h << k)) << shp
            acc[pl.ds(j, 1), :] += jnp.where(in_w, low, _I(0))
            if j + 1 < l_pad:
                acc[pl.ds(j + 1, 1), :] += jnp.where(in_w, h, _I(0))

    # exact cross-lane fold: 12-bit split keeps every f32 operand and
    # every 128-term sum below 2^24 (exactly representable)
    a = acc[...]
    h12 = a >> _I(12)
    l12 = a - (h12 << _I(12))
    ones = jnp.ones((LANES, LANES), jnp.float32)
    fold = lambda x: jax.lax.dot_general(  # noqa: E731
        x.astype(jnp.float32), ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(_I)
    sl = fold(l12)           # (l_pad, 128), every lane the total
    sh_ = fold(h12)
    # recombine sh*2^12 + sl without int32 overflow: push sh's high part
    # one limb up
    hh = sh_ >> _I(8)
    hl = sh_ - (hh << _I(8))
    dacc[...] = jnp.zeros_like(dacc)
    dacc[pl.ds(0, l_pad), :] = sl + (hl << _I(12))
    dacc[pl.ds(1, l_pad), :] += hh
    spec0 = jnp.zeros((3, LANES), _I)
    hi32, lo32 = round_lanes_acc(dacc, spec0, l_pad + 1,
                                 0, e_adjust=eadj_ref[0:1, :])
    out_ref[0:1, :] = hi32
    out_ref[1:2, :] = lo32
    out_ref[2:8, :] = jnp.zeros((6, LANES), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("bits_pos", "l_rel"))
def round_scaled_terms(vals, bits_pos: tuple, e_adjust, l_rel: int):
    """Correctly round ``sum_t vals[t] * 2^(bits_pos[t] + e_adjust)``.

    vals: (T,) int64, T <= 128, |vals| < 2^52; bits_pos: static python
    tuple of T non-negative ints; e_adjust: traced int32 scalar (the
    exponent of relative bit 0); l_rel: static limb count covering
    max(bits_pos) + 53 bits.  Returns (hi32, lo32) uint32 scalars.
    One Pallas launch replaces the XLA limb build + canonicalize +
    round tail of the MXU sum/dot epilogues.
    """
    T = vals.shape[0]
    assert T == len(bits_pos) and T <= LANES
    l_pad = l_rel + 3
    vl = (vals & jnp.int64(0xFFFF)).astype(_I)
    vm = ((vals >> jnp.int64(16)) & jnp.int64(0xFFFF)).astype(_I)
    vh = (vals >> jnp.int64(32)).astype(_I)         # signed, |vh| < 2^20
    pad = LANES - T
    vl, vm, vh = (jnp.pad(v, (0, pad)).reshape(1, LANES)
                  for v in (vl, vm, vh))
    bofs = jnp.asarray(list(bits_pos) + [0] * pad, _I).reshape(1, LANES)
    eadj = jnp.broadcast_to(jnp.asarray(e_adjust, _I).reshape(1, 1),
                            (1, LANES))

    _z = np.int32(0)   # index maps must return i32 under x64
    out = pl.pallas_call(
        functools.partial(_round_terms_kernel, l_pad=l_pad),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, LANES), lambda i: (_z, _z),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((8, LANES), lambda i: (_z, _z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((l_pad, LANES), jnp.int32),
            pltpu.VMEM((l_pad + 1, LANES), jnp.int32),
        ],
    )(vl, vm, vh, bofs, eadj)
    return out[0, 0], out[1, 0]
