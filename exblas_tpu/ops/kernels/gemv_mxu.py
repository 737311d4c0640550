"""MXU fast path for ExGEMV: exact byte-plane decomposition + int8 matmuls.

The VPU digit-plane GEMV kernel (gemv_kernel.py) costs ~140 integer ops per
A-element; at 8192^2 that holds ExGEMV near 140 GB/s while the chip can
stream >600 GB/s.  This path moves the product arithmetic to the MXU while
keeping every intermediate an exactly-representable integer, so the result
is exact and hence bit-identical to the VPU/XLA paths:

* per-row anchors ``E_i`` (an upper bound on the msb exponent of row i of
  A); each element is shifted to a W-bit fixed-point integer relative to
  its row anchor, two's-complemented, and XOR'd with 0x80808080 -- a
  ``pltpu.bitcast`` to int8 then IS the excess-128 byte-plane stack
  (row 4i+b = byte b of row i), so the whole decomposition is ~32 VPU
  ops/element with no per-plane extract ladder;
* ``z = fl(alpha*x)`` is decomposed once at the XLA level into ``NZ``
  *balanced signed base-256 digits* (values in [-128, 127], exactly int8)
  against a global anchor F;
* ONE int8 MXU matmul per 32-bit word computes all four plane x digit
  sums at once with exact int32 accumulation:
  ``N_w[t, 4i+b] = sum_k (byte_b(w)[i,k] - 128) * d_t[k]``;
* spills land in a per-byte-lane *relative* accumulator (lane 4i+b, bit
  position lane-shifted by 8b);
* beta == 0 (the common case): the last grid step folds byte lanes (one
  tiny f32 selection matmul), applies the excess-128 compensation (a
  global limb constant from the z-digit column sums) and the sign-mask
  matmul correction, canonicalizes and correctly rounds every row
  accumulator IN-KERNEL (all int32) -- nothing but the result bit pairs
  leaves the device path;
* beta != 0: an XLA epilogue does the same fold/corrections, shifts each
  row's relative limbs into the absolute DOT-format accumulator, deposits
  ``beta*y`` exactly there (no coverage constraint), and rounds once.

Reference counterpart: ExGEMV.Superacc.cl:192-293 keeps one global-memory
superaccumulator per row and EFT-accumulates scalar products; the MXU
slice scheme has no reference analog (same design family as gemm_mxu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import deposit as dep
from ...core.types import LIMB_BITS, LIMB_MASK

LANES = 128
KT = 256            # k-tile (two lane tiles)
_I = jnp.int32
_U = jnp.uint32
_I64 = jnp.int64
_U64 = jnp.uint64
_Z = _np.int32(0)

# Largest k slice-sum run between limb spills: |sum_k (b-128)*d| <= k * 2^14
# must stay < 2^30 so the spill deposit's piece split fits, hence
# k_run <= 2^15.
SPILL_K = 32768
SPILL_TILES = SPILL_K // KT

# Total-k cap: a carry pass runs right after every spill, so per-spill
# limb growth (<~ 2^29.5) can never accumulate.  1024 spills keep (a) the
# whole-kept top limb row under ~2^10 incoming carry per spill -> < 2^21,
# so the f32 byte-lane fold stays exact (operands < 2^22, 4-term sums
# < 2^24 -- see _fold_byte_lanes), and (b) the sign-mask accumulator's
# spilled high part |hi| <= k/128 < 2^18 (see the cacc hi/lo split in
# _gemv_mxu_kernel).  The accumulator top growth itself is absorbed by
# the `extra` bits in _rung_params.  Raised from 128 spills (2^22) in
# round 3 by splitting cacc, whose int32 bound k*128 < 2^31 was the real
# 2^22 limit.
MAX_K_MXU = 1024 * SPILL_K


def _rung_params(nwa: int, nwz: int, k_pad: int = SPILL_K):
    """Static geometry for a (nwa, nwz)-word rung.

    nwa: 32-bit words per A element (2..16 -> W = 64..512 anchored bits).
    nwz: words per z element (Wz = 32*nwz; NZ = Wz/8 + 1 balanced digits;
    nwz <= 7 so NZ fits make_z_digits' 32-sublane digit block).
    k_pad: padded column count -- class totals reach k_pad * 2^14, so the
    accumulator top grows by log2(k_pad / 2^15) bits beyond the one-spill
    geometry.  (beta*y lives in the XLA-side absolute accumulator, not
    here.)
    """
    w_a = 32 * nwa
    w_z = 32 * nwz
    ns = w_a // 8
    nz = w_z // 8 + 1
    r0 = w_a + w_z            # acc bit 0 has exponent e_base - r0
    extra = max(0, (max(k_pad, 1) - 1).bit_length() - 15)
    top_bit = max(8 * (ns + nz - 2) + 30 + extra,  # plane x digit deposits
                  w_a + 8 * (nz - 1) + 23 + extra)  # negm x digit deposits
    l_rel = -(-(top_bit + 2) // LIMB_BITS) + 1
    return w_a, w_z, ns, nz, r0, l_rel


# ---------------------------------------------------------------------------
# Analysis (anchors + coverage) -- one cheap pass over a_hi only
# ---------------------------------------------------------------------------

# Large matrices run the row analysis as a streaming Pallas kernel: the XLA
# reduction pass costs ~0.9 ms at 8192^2 (as much as the MXU kernel itself)
# while the Pallas pass runs at the 4-byte/elem streaming rate.
_ANALYZE_PALLAS_MIN = 1 << 20

_E_SENT = -10000        # "no finite element" row-anchor sentinel
_LSB_SENT = 10000       # "no definite element" lsb sentinel


def _analyze_rows_kernel(a_hi_ref, out_ref, e_acc, l_acc, f_acc,
                         *, k, k_pad):
    """Accumulates per-row [e_max, lsb_min, special?, hi_inv?] into the
    (LANES, 8) out block (cols 0..3) across the k grid axis.

    Elementwise accumulation into (LANES, KT) scratches; the cross-lane
    reduction runs once at the last k step (per-block reductions cost
    ~32 extra ops/element -- measured 2.4x slower end-to-end)."""
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        e_acc[...] = jnp.full(e_acc.shape, _E_SENT, _I)
        l_acc[...] = jnp.full(l_acc.shape, _LSB_SENT, _I)
        f_acc[...] = jnp.zeros(f_acc.shape, _I)

    his = jax.lax.bitcast_convert_type(a_hi_ref[...], _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    e_bound = jnp.where(special, _I(_E_SENT),
                        jnp.maximum(expf, _I(1)) - _I(1023))
    hi_inv = (his & _I(0x7FFFFFFF)) == 0
    lsb = jnp.maximum(expf, _I(1)) - _I(1075)
    excl = jnp.logical_or(special, hi_inv)
    lsb_x = jnp.where(excl, _I(_LSB_SENT), lsb)
    flags = (special.astype(_I) << _I(1)) | hi_inv.astype(_I)
    if k != k_pad:
        # mask the zero-padded tail columns (padded zeros would set the
        # hi_inv flag and force the rare a_lo pass on every call)
        col = (jax.lax.broadcasted_iota(_I, his.shape, 1)
               + ik * _I(KT))
        valid = col < _I(k)
        e_bound = jnp.where(valid, e_bound, _I(_E_SENT))
        lsb_x = jnp.where(valid, lsb_x, _I(_LSB_SENT))
        flags = jnp.where(valid, flags, _I(0))
    e_acc[...] = jnp.maximum(e_acc[...], e_bound)
    l_acc[...] = jnp.minimum(l_acc[...], lsb_x)
    f_acc[...] = f_acc[...] | flags

    @pl.when(ik == nk - 1)
    def _():
        out_ref[:, 0:1] = jnp.max(e_acc[...], axis=1, keepdims=True)
        out_ref[:, 1:2] = jnp.min(l_acc[...], axis=1, keepdims=True)
        fl = f_acc[...]
        out_ref[:, 2:3] = jnp.max((fl >> _I(1)) & _I(1), axis=1,
                                  keepdims=True)
        out_ref[:, 3:4] = jnp.max(fl & _I(1), axis=1, keepdims=True)
        out_ref[:, 4:8] = jnp.zeros((out_ref.shape[0], 4), _I)


def _analyze_rows_stats(a_hi):
    """Pallas per-row stats: (e_max, lsb_min, row_special, row_hi_inv),
    each (m,) over the unpadded rows."""
    m, k = a_hi.shape
    m_pad = -(-m // LANES) * LANES
    k_pad = -(-k // KT) * KT
    a_hi_p = jnp.pad(a_hi, ((0, m_pad - m), (0, k_pad - k)))
    out = pl.pallas_call(
        functools.partial(_analyze_rows_kernel, k=k, k_pad=k_pad),
        grid=(m_pad // LANES, k_pad // KT),
        in_specs=[pl.BlockSpec((LANES, KT), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((LANES, 8), lambda i, j: (i, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LANES, KT), jnp.int32)] * 3,
    )(a_hi_p)
    return (out[:m, 0], out[:m, 1], out[:m, 2] > 0, out[:m, 3] > 0)


def analyze_gemv_rows(a_hi, a_lo):
    """Per-row anchors and coverage spread from the hi words (one 4-byte/elem
    pass); a_lo is touched only when hi-invisible elements (hi word 0 mod
    sign: true zeros vs sub-2^-1043 subnormals) could break coverage.

    Returns (ea (m,) int32 anchor bounds, spread int32 scalar,
    has_special bool) -- all device values.
    """
    m, k = a_hi.shape
    if m * k >= _ANALYZE_PALLAS_MIN:
        ea, lsb_min, row_special, row_hi_inv = _analyze_rows_stats(a_hi)
        spread_def = jnp.max(jnp.where(
            lsb_min >= _I(_LSB_SENT), _I(0), ea - lsb_min + _I(1)))

        def tiny_spread(_):
            his = jax.lax.bitcast_convert_type(a_hi, _I)
            cand = jnp.logical_and((his & _I(0x7FFFFFFF)) == 0, a_lo != 0)
            return jnp.max(jnp.where(cand, ea[:, None] + _I(1075), _I(0)))

        spread_tiny = jax.lax.cond(
            jnp.any(row_hi_inv), tiny_spread, lambda _: _I(0), operand=None)
        return (ea, jnp.maximum(spread_def, spread_tiny),
                jnp.any(row_special))

    his = jax.lax.bitcast_convert_type(a_hi, _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    # msb exponent upper bound: normals exact; expf==0 covers subnormal-or-
    # zero at -1022 (safe overestimate); specials excluded.
    e_bound = jnp.where(special, _I(-10000),
                        jnp.maximum(expf, _I(1)) - _I(1023))
    ea = jnp.max(e_bound, axis=1)
    # definite elements: significand lsb bound is known from hi alone
    hi_inv = (his & _I(0x7FFFFFFF)) == 0   # maybe-zero (lo unknown)
    lsb = jnp.maximum(expf, _I(1)) - _I(1075)
    excl = jnp.logical_or(special, hi_inv)
    spread_def = jnp.max(jnp.where(
        excl, _I(0), ea[:, None] - lsb + _I(1)))

    # hi-invisible elements that are actually nonzero span down to -1074.
    def tiny_spread(_):
        nz = a_lo != 0
        cand = jnp.logical_and(hi_inv, nz)
        return jnp.max(jnp.where(cand, ea[:, None] + _I(1075), _I(0)))

    spread_tiny = jax.lax.cond(
        jnp.any(hi_inv), tiny_spread, lambda _: _I(0), operand=None)
    return ea, jnp.maximum(spread_def, spread_tiny), jnp.any(special)


def analyze_z(z_hi, z_lo):
    """Exact scalar anchor F, spread, and special flag for the z vector."""
    from .gemm_mxu import _exp_msb

    e, is_zero, special = _exp_msb(z_hi, z_lo)
    f = jnp.max(e)
    lsb = jnp.maximum((jax.lax.bitcast_convert_type(z_hi, _I) >> _I(20))
                      & _I(0x7FF), _I(1)) - _I(1075)
    valid = jnp.logical_not(jnp.logical_or(is_zero, special))
    spread = jnp.max(jnp.where(valid, f - lsb + _I(1), _I(0)))
    return f, spread, jnp.any(special)


# ---------------------------------------------------------------------------
# XLA-level z preparation: balanced signed base-256 digits
# ---------------------------------------------------------------------------

def make_z_digits(z_hi, z_lo, f_anchor, nwz: int):
    """Decompose z into NZ balanced signed digits: z[k] = (sum_t d_t 2^(8t))
    * 2^(F + 1 - Wz) with d_t in [-128, 127].

    Returns (zdig int8 (32, k), zsum int64 (NZ,)) -- digit planes padded to
    32 sublanes and their column sums (for the excess-128 compensation).
    Coverage (spread_z <= Wz) is the caller's contract; uncovered elements
    would silently truncate.
    """
    w_z = 32 * nwz
    nz = w_z // 8 + 1
    assert nz <= 32, "z-digit block holds 32 sublanes: nwz <= 7"
    his = jax.lax.bitcast_convert_type(z_hi, _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    mhi = (his & _I(0xFFFFF)) | (jnp.minimum(expf, _I(1)) << _I(20))
    mhi = jnp.where(special, _I(0), mhi)
    mlo = jnp.where(special, _I(0),
                    jax.lax.bitcast_convert_type(z_lo, _I))
    mant = ((mhi.astype(_U64) << _U64(32))
            | jax.lax.bitcast_convert_type(mlo, _U).astype(_U64))
    e_lsb = jnp.maximum(expf, _I(1)) - _I(1075)
    shz = e_lsb - (f_anchor + _I(1) - _I(w_z))   # in [0, Wz - 53]
    neg = jnp.logical_and(his < 0, mant != 0)

    # unsigned bytes of mant << shz (digit t covers bits [8t, 8t+8))
    bytes_u = []
    for t in range(nz):
        sh = _I(8 * t) - shz
        pos = jnp.clip(sh, 0, 63).astype(_U64)
        negsh = jnp.clip(-sh, 0, 63).astype(_U64)
        b = jnp.where(sh >= 0, mant >> pos, mant << negsh)
        bytes_u.append((b & _U64(0xFF)).astype(_I))

    # balanced recode: digits in [-128, 127]
    digits = []
    carry = jnp.zeros_like(bytes_u[0])
    for t in range(nz):
        b = bytes_u[t] + carry
        carry = jnp.where(b >= 128, _I(1), _I(0))
        digits.append(b - (carry << _I(8)))
    # negate for negative z; re-balance the +128/+129 overflow cases
    # (d in [-127, 129]: -digit <= 128 plus an incoming carry)
    carry = jnp.zeros_like(digits[0])
    for t in range(nz):
        d = jnp.where(neg, -digits[t], digits[t]) + carry
        carry = jnp.where(d >= 128, _I(1), _I(0))
        digits[t] = d - (carry << _I(8))

    zdig = jnp.zeros((32, z_hi.shape[0]), jnp.int8)
    for t in range(nz):
        zdig = zdig.at[t].set(digits[t].astype(jnp.int8))
    zsum = jnp.stack([jnp.sum(d.astype(_I64)) for d in digits])
    return zdig, zsum


def make_excess_corr_limbs(zsum, nwa: int, nwz: int, l_rel: int):
    """Limb decomposition of the excess-128 compensation.

    The kernel's matmuls compute sum_k (b_s - 128) d_t; the missing
    +128 * sum_k d_t per (s, t) pair is a global constant.  Total value:
    sum_c corr_c 2^(8c) with corr_c = 128 * sum_{s+t=c} zsum_t, returned as
    an (l_rel,) int32 base-2^20 digit vector (top digit signed).
    """
    ns = 32 * nwa // 8
    nz = 32 * nwz // 8 + 1
    limbs = jnp.zeros((l_rel,), _I64)
    for c in range(ns + nz - 2 + 1):
        tot = None
        for t in range(nz):
            if 0 <= c - t < ns:
                tot = zsum[t] if tot is None else tot + zsum[t]
        if tot is None:
            continue
        v = tot * _I64(128)
        q, r = divmod(8 * c, LIMB_BITS)
        limbs = limbs.at[q].add((v << _I64(r)) & _I64((1 << 40) - 1))
        limbs = limbs.at[q + 2].add(v >> _I64(40 - r))
    # canonicalize the 40-bit chunks down to signed 20-bit digits
    out = []
    carry = jnp.int64(0)
    for j in range(l_rel):
        d = limbs[j] + carry
        digit = d & _I64(LIMB_MASK)
        carry = (d - digit) >> _I64(LIMB_BITS)
        out.append(digit)
    out[-1] = out[-1] + (carry << _I64(LIMB_BITS))
    return jnp.stack(out).astype(_I)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _slice_byte_words(a_hi, a_lo, erow, nwa: int, check: bool = False):
    """(128, KT) bit-pair block -> (tc, negm[, bad]) for the byte matmuls.

    tc: list of nwa uint32 words of the two's-complement anchored value,
    each XOR'd with 0x80808080 so that a byte-wise reinterpretation
    (pltpu.bitcast to int8) yields the excess-128 planes b - 128 directly
    -- no per-plane extract ladder.
    negm: int8 0/1 negative mask (the 2^W sign correction plane).
    check: also return a per-element "not covered by the anchor" mask
    (anchor too low/high, hidden tiny subnormal, or NaN/Inf) -- lets the
    caller use an estimated anchor and fall back on the flag instead of
    paying an exact analysis pass (the sum_mxu fast path).
    """
    w_a = 32 * nwa
    his = jax.lax.bitcast_convert_type(a_hi, _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    mhi = (his & _I(0xFFFFF)) | (jnp.minimum(expf, _I(1)) << _I(20))
    mhi = jnp.where(special, _I(0), mhi)
    mlo = jnp.where(special, _I(0),
                    jax.lax.bitcast_convert_type(a_lo, _I))
    e_lsb = jnp.maximum(expf, _I(1)) - _I(1075)
    sh = e_lsb - (erow + _I(1) - _I(w_a))     # [0, W-53] for covered rows
    bad = None
    if check:
        # nonzero value whose bits don't all fit in [anchor+1-W, anchor]
        # (for hi-invisible subnormals e_lsb here is the conservative
        # -1074 bound, so genuinely tiny values flag themselves), or a
        # special.  Flagged results are discarded by the caller.
        nz = (mhi | mlo) != 0
        oob = jnp.logical_or(sh < _I(0), sh > _I(w_a - 53))
        bad = jnp.logical_or(jnp.logical_and(nz, oob), special)
    ws = None
    if nwa == 3:
        big = sh >= _I(32)
        sh = sh - jnp.where(big, _I(32), _I(0))
    elif nwa >= 4:
        # sh in [0, 32*(nwa-2) + 11]: split into a whole-word shift
        # ws in [0, nwa-2] applied logarithmically below and a bit shift
        # in [0, 31] (round 3: the per-word conditional chain cost
        # O(nwa^2) selects; the log shifter costs O(nwa log nwa))
        ws = sh >> _I(5)
        sh = sh & _I(31)
    shu = jax.lax.bitcast_convert_type(sh, _U)
    shn = jax.lax.bitcast_convert_type(_I(31) - sh, _U)
    mlou = jax.lax.bitcast_convert_type(mlo, _U)
    mhiu = jax.lax.bitcast_convert_type(mhi, _U)
    w0 = mlou << shu
    w1 = (mhiu << shu) | ((mlou >> _U(1)) >> shn)
    if nwa == 3:
        w2 = (mhiu >> _U(1)) >> shn
        w2 = jnp.where(big, w1, w2)
        w1 = jnp.where(big, w0, w1)
        w0 = jnp.where(big, _U(0), w0)
        words = [w0, w1, w2]
    elif nwa >= 4:
        w2 = (mhiu >> _U(1)) >> shn
        words = [w0, w1, w2] + [jnp.zeros_like(w2)] * (nwa - 3)
        step = 1
        while step <= nwa - 2:   # log shifter: move the stack up by the
            b = (ws & _I(step)) != 0   # set bits of the word shift
            for j in range(nwa - 1, -1, -1):
                src = words[j - step] if j >= step else _U(0)
                words[j] = jnp.where(b, src, words[j])
            step <<= 1
    else:
        words = [w0, w1]

    valid = (mhi | mlo) != 0
    neg = jnp.logical_and(his < 0, valid)
    m = jnp.where(neg, _I(-1), _I(0))
    mu = jax.lax.bitcast_convert_type(m, _U)
    # two's complement across words (carry = all lower words zero)
    zall = None
    tc = []
    for i, w in enumerate(words):
        if i == 0:
            t = (w ^ mu) + (mu & _U(1))
            zall = w == _U(0)
        else:
            c = jnp.where(jnp.logical_and(neg, zall), _U(1), _U(0))
            t = (w ^ mu) + c
            zall = jnp.logical_and(zall, w == _U(0))
        tc.append(t ^ _U(0x80808080))        # excess-128, all bytes at once
    negm = (m & _I(1)).astype(jnp.int8)
    if check:
        return tc, negm, bad
    return tc, negm


def _renorm_rel3(arel_ref):
    """Value-preserving carry pass on the (1, l_rel, 512) accumulator ref:
    bits above LIMB_BITS move up one limb row; the top row is kept whole
    (any carry stays in place, as in the reference's Normalize,
    superaccumulator.cpp:138-162)."""
    a = arel_ref[0]
    c = a >> _I(LIMB_BITS)          # arithmetic: floor, value-preserving
    low = a - (c << _I(LIMB_BITS))
    row = jax.lax.broadcasted_iota(_I, a.shape, 0)
    top = _I(a.shape[0] - 1)
    low = jnp.where(row == top, a, low)      # keep the top row whole
    c_up = pltpu.roll(c, shift=jnp.int32(1), axis=0)
    c_up = jnp.where(row == 0, _I(0), c_up)
    arel_ref[0] = low + c_up


def _spill_lane_deposit(arel_ref, v, base: int, bofs, l_rel: int):
    """arel += v * 2^(base + bofs[lane]); v (1, 512) int32, |v| < 2^30,
    bofs (1, 512) in {0, 8, 16, 24} (byte offset of the interleaved lane),
    base static.  Splits v into a nonnegative low 20-bit part (two masked
    pieces) and a small signed high part (deposited whole -- the int32
    carry slack absorbs the overlap)."""
    h = v >> _I(LIMB_BITS)
    low = v - (h << _I(LIMB_BITS))           # in [0, 2^20)
    bit_l = bofs + _I(base)
    for j in range(base // LIMB_BITS,
                   min(l_rel, (base + 44) // LIMB_BITS + 1)):
        sh = bit_l - _I(LIMB_BITS * j)
        shp = dep._clip_i32(sh, 0, 31)
        shn = dep._clip_i32(-sh, 0, 31)
        # (low << sh) & M is 0 for sh >= 20; low >> -sh is 0 for -sh >= 20
        lo_c = jnp.where(sh >= 0, (low << shp) & _I(LIMB_MASK),
                         low >> shn)
        shh = sh + _I(LIMB_BITS)
        h_c = jnp.where(jnp.logical_and(shh >= 0, shh < _I(LIMB_BITS)),
                        h << dep._clip_i32(shh, 0, LIMB_BITS - 1), _I(0))
        arel_ref[0, pl.ds(j, 1), :] += lo_c + h_c


def _fold_byte_lanes(a, l_rel):
    """(l_rel, 512) byte-interleaved limbs -> (l_rel, 128): lane i receives
    lanes 4i..4i+3 summed, via one tiny f32 selection matmul (cross-lane
    compaction has no cheap VPU form).  Exact: post-renorm limbs are in
    [0, 2^20) and the whole-kept top row only accumulates renorm carries
    (< 2^11 per spill, <= 128 spills => < 2^18), so every operand and
    every 4-term sum is an integer < 2^22, exactly representable in f32
    (HIGHEST precision: the default single-pass bf16 MXU path WOULD round
    -- bf16 carries 8 mantissa bits)."""
    r_idx = jax.lax.broadcasted_iota(_I, (4 * LANES, LANES), 0)
    c_idx = jax.lax.broadcasted_iota(_I, (4 * LANES, LANES), 1)
    sel = jnp.where((r_idx >> _I(2)) == c_idx, jnp.float32(1.0),
                    jnp.float32(0.0))
    folded = jax.lax.dot_general(
        a.astype(jnp.float32), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return folded.astype(_I)


def _gemv_round_in_kernel(arel_out, cacc_out, corr_ref, eadj_ref, bits_out,
                          dacc, *, nwa, nwz, l_rel, r0):
    """Last-k-step epilogue: fold byte lanes, apply the sign-mask and
    excess-128 corrections, canonicalize and correctly round each of the
    128 row accumulators -- all in int32 on the VPU.  Replaces the XLA
    epilogue for beta == 0 (int64 emulation there cost ~25% of the whole
    call at 8192^2)."""
    from .round_in_kernel import round_lanes_acc

    w_a = 32 * nwa
    nz = 32 * nwz // 8 + 1
    l_pad = l_rel + 2

    rel = _fold_byte_lanes(arel_out[0], l_rel)          # (l_rel, 128)
    dacc[pl.ds(0, l_rel), :] = rel + corr_ref[0:l_rel, :]
    dacc[pl.ds(l_rel, l_pad - l_rel), :] = jnp.zeros(
        (l_pad - l_rel, LANES), _I)
    # sign-mask correction: -2^w_a * sum_k negm_k * z; digit t at relative
    # bit w_a + 8t.  cacc is hi/lo split (spill block): the low rows are
    # a remainder < 2^14 (the last grid step spills before rounding) and
    # the high rows carry weight 2^14, |hi| < 2^18 -- both parts deposit
    # as (low20, high) int32-safe splits.
    for t in range(nz):
        for part, extra_bits in ((0, 0), (32, 14)):
            j, rr = divmod(w_a + 8 * t + extra_bits, LIMB_BITS)
            v = -cacc_out[0, part + t, :][None, :]
            h = v >> _I(LIMB_BITS - rr)
            low = (v << _I(rr)) & _I(LIMB_MASK)
            dacc[pl.ds(j, 1), :] += low
            dacc[pl.ds(j + 1, 1), :] += h
    spec0 = jnp.zeros((3, LANES), _I)
    hi32, lo32 = round_lanes_acc(
        dacc, spec0, l_pad, 0, e_adjust=eadj_ref[0, 0:1, :] - _I(r0))
    bits_out[0, 0:1, :] = hi32
    bits_out[0, 1:2, :] = lo32
    bits_out[0, 2:8, :] = jnp.zeros((6, LANES), jnp.uint32)


def _gemv_mxu_kernel(a_hi_ref, a_lo_ref, e_ref, zd_ref, corr_ref, eadj_ref,
                     arel_out, cacc_out, bits_out, macc, dacc,
                     *, nwa, nwz, k_pad, spill_tiles, fuse_round):
    w_a, w_z, ns, nz, r0, l_rel = _rung_params(nwa, nwz, k_pad)
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        macc[...] = jnp.zeros_like(macc)
        arel_out[...] = jnp.zeros_like(arel_out)
        cacc_out[...] = jnp.zeros_like(cacc_out)

    tc, negm = _slice_byte_words(
        a_hi_ref[...], a_lo_ref[...], e_ref[:, 0:1], nwa)
    zd = zd_ref[...]
    # ONE matmul per 32-bit word: pltpu.bitcast interleaves the four
    # excess-128 byte planes into the sublane axis (row 4i+b = byte b of
    # A row i), so the (32, KT) x (512, KT) product computes all four
    # plane x digit sums at once -- no per-plane extraction.
    for w in range(nwa):
        n_w = jax.lax.dot_general(
            zd, pltpu.bitcast(tc[w], jnp.int8),
            (((1,), (1,)), ((), ())), preferred_element_type=_I)
        macc[pl.ds(w * 32, 32), :] += n_w    # (32, 512): rows = digit t
    cacc_out[0, 0:32, :] += jax.lax.dot_general(
        zd, negm, (((1,), (1,)), ((), ())), preferred_element_type=_I)

    # Spill the int32 sums into the limb accumulator every SPILL_TILES
    # k-steps (|macc| <= SPILL_K * 2^14 < 2^30) and at the end; the carry
    # pass right after every spill re-bounds the limbs (per-spill growth
    # <~ 2^29.5, slack 2^31 - 2^21).
    spill = jnp.logical_or(
        jnp.bitwise_and(ik + 1, _I(spill_tiles - 1)) == 0, ik == nk - 1)

    @pl.when(spill)
    def _():
        bofs = (jax.lax.broadcasted_iota(_I, (1, 4 * LANES), 1)
                & _I(3)) << _I(3)            # byte offset 8*(lane % 4)
        for w in range(nwa):
            for t in range(nz):
                _spill_lane_deposit(
                    arel_out, macc[pl.ds(w * 32 + t, 1), :],
                    32 * w + 8 * t, bofs, l_rel)
        macc[...] = jnp.zeros_like(macc)
        _renorm_rel3(arel_out)
        # sign-mask accumulator hi/lo split: rows 0..31 keep a bounded
        # low part (< 2^14 after the split; grows by <= SPILL_K * 128 =
        # 2^22 per run), rows 32..63 accumulate the value-preserving high
        # part (|hi| <= k/128 < 2^18 at the 2^25 k cap).  Without the
        # split, |sum_k negm*zd| <= k * 128 was the real k <= 2^22 cap.
        v = cacc_out[0, 0:32, :]
        h = v >> _I(14)
        cacc_out[0, 0:32, :] = v - (h << _I(14))
        cacc_out[0, 32:64, :] += h

    if fuse_round:
        @pl.when(ik == nk - 1)
        def _():
            _gemv_round_in_kernel(arel_out, cacc_out, corr_ref, eadj_ref,
                                  bits_out, dacc, nwa=nwa, nwz=nwz,
                                  l_rel=l_rel, r0=r0)


@functools.partial(jax.jit, static_argnames=("nwa", "nwz", "beta_mode",
                                             "spill_tiles"))
def gemv_bits_mxu(a_hi, a_lo, z_hi, z_lo, ea, f_anchor,
                  y_hi=None, y_lo=None, beta_hi=None, beta_lo=None,
                  beta_mode: str = "zero", nwa: int = 2, nwz: int = 2,
                  spill_tiles: int = SPILL_TILES):
    """y = beta*y + A @ z via the exact MXU byte-plane path.

    a: (m, k) bit pairs; z: (k,) bit pairs (already alpha-scaled);
    ea: (m,) int32 per-row msb-exponent bounds; f_anchor: int32 scalar z
    anchor.  Caller must have verified coverage: per-row spread of A
    <= 32*nwa, z spread <= 32*nwz, padded k <= MAX_K_MXU.  beta*y needs
    no coverage: it is deposited exactly into the absolute accumulator in
    the XLA epilogue (with full NaN/Inf semantics via round_rows).

    beta == 0: fold, corrections, canonicalize and correctly-rounded
    conversion all run in the kernel's last grid step (int32 VPU).
    beta != 0: the kernel emits raw per-byte-lane relative limbs and an
    XLA epilogue folds byte lanes, applies the excess-128 and sign-mask
    corrections, shifts each row's relative limbs into the absolute
    DOT-format accumulator, deposits beta*y, and rounds.  Both paths are
    bit-identical to the VPU/XLA kernels.  Returns (hi, lo) uint32 (m,).
    """
    m, k = a_hi.shape
    m_pad = -(-m // LANES) * LANES
    k_pad = -(-k // KT) * KT
    assert k_pad <= MAX_K_MXU
    assert (spill_tiles & (spill_tiles - 1)) == 0 \
        and spill_tiles <= SPILL_TILES
    w_a, w_z, ns, nz, r0, l_rel = _rung_params(nwa, nwz, k_pad)
    a_hi = jnp.pad(a_hi, ((0, m_pad - m), (0, k_pad - k)))
    a_lo = jnp.pad(a_lo, ((0, m_pad - m), (0, k_pad - k)))
    z_hi = jnp.pad(z_hi, (0, k_pad - k))
    z_lo = jnp.pad(z_lo, (0, k_pad - k))

    zdig, zsum = make_z_digits(z_hi, z_lo, f_anchor, nwz)
    corr = make_excess_corr_limbs(zsum, nwa, nwz, l_rel)

    ea_pad = jnp.pad(ea, (0, m_pad - m))
    # 8 lanes (the kernel reads column 0 only): a 128-lane broadcast
    # would add ~20% HBM traffic on top of the A stream
    e_sub = jnp.broadcast_to(ea_pad[:, None], (m_pad, 8))
    m_blocks = m_pad // LANES
    k_blocks = k_pad // KT

    fuse_round = beta_mode == "zero"
    corr_b = jnp.broadcast_to(corr[:, None], (l_rel, LANES))
    # per-row msb-exponent adjust for the in-kernel rounding: rel bit 0 of
    # row i has exponent ea_i + f + 2 - r0 (the kernel subtracts r0)
    eadj = (ea_pad + f_anchor + _I(2)).reshape(m_blocks, 1, LANES)

    arel, cacc, bits_k = pl.pallas_call(
        functools.partial(_gemv_mxu_kernel, nwa=nwa, nwz=nwz,
                          k_pad=k_pad, spill_tiles=spill_tiles,
                          fuse_round=fuse_round),
        grid=(m_blocks, k_blocks),
        in_specs=[
            pl.BlockSpec((LANES, KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 8), lambda i, j: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, KT), lambda i, j: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_rel, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l_rel, 4 * LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_blocks, l_rel, 4 * LANES), jnp.int32),
            jax.ShapeDtypeStruct((m_blocks, 64, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m_blocks, 8, LANES), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nwa * 32, 4 * LANES), jnp.int32),
            pltpu.VMEM((l_rel + 2, LANES), jnp.int32),
        ],
    )(a_hi, a_lo, e_sub, zdig, corr_b, eadj)

    if fuse_round:
        # The kernel already folded, corrected, canonicalized and rounded
        # every row accumulator; just reassemble the bit pairs.
        hi = bits_k[:, 0, :].reshape(m_pad)[:m]
        lo = bits_k[:, 1, :].reshape(m_pad)[:m]
        return hi, lo

    # ---- XLA epilogue (O(m * l_rel) work) ----
    from ...core.types import DOT_FORMAT

    # fold the four interleaved byte lanes: lane 4i+b holds byte b's limbs
    rel = jnp.sum(arel.reshape(m_blocks, l_rel, LANES, 4).astype(_I64),
                  axis=-1)                       # (mb, l_rel, 128)
    # sign-mask correction: -2^(W_a) * sum_k negm_k * z  (digit t at
    # relative bit w_a + 8t; cacc rows 32+t hold the spilled high part
    # with weight 2^14 -- recombined exactly in int64)
    for t in range(nz):
        j, rr = divmod(w_a + 8 * t, LIMB_BITS)
        v = (cacc[:, t, :].astype(_I64)
             + (cacc[:, 32 + t, :].astype(_I64) << _I64(14)))
        rel = rel.at[:, j, :].add(-(v << _I64(rr)))
    # excess-128 compensation (global limb constant)
    rel = rel + corr.astype(_I64)[None, :, None]

    # row i's rel bit 0 has exponent e_base_i - r0
    rel2 = jnp.transpose(rel, (0, 2, 1)).reshape(m_pad, l_rel)
    e_base = ea_pad + f_anchor + _I(2)

    # canonicalize the relative limbs once: digits in [0, 2^20), two's
    # complement for negative rows.  Canonicalizing BEFORE the absolute-
    # window shift is load-bearing for the beta path: raw rel limbs reach
    # ~2^45 via the sign-mask correction, so `raw << rb` (rb up to 19)
    # would overflow int64.  5 zero limbs of padding restore
    # canonicalize_digits' int64-compression headroom invariant
    # |V| < 2^(20L - 64) (values reach the top of the unpadded window).
    from ...core.rounding import canonicalize_digits, negate_digits

    l_pad = l_rel + 5
    rel2p = jnp.pad(rel2, ((0, 0), (0, 5)))
    digits, negative = canonicalize_digits(rel2p)

    # beta != 0: shift the canonical digits into the absolute DOT-format
    # accumulator, deposit beta*y exactly there (no coverage constraint),
    # one rounding.  Sign-magnitude form (negate_digits) so no 2^(20*l_pad)
    # top-correction limb is needed for negative rows.
    mag = jnp.where(negative[:, None], negate_digits(digits), digits)
    sgn = jnp.where(negative, _I64(-1), _I64(1))
    p0 = e_base - _I(r0) + _I(DOT_FORMAT.offset_bits)
    q0 = p0 // _I(LIMB_BITS)
    rb = (p0 - q0 * _I(LIMB_BITS)).astype(_I64)
    L = DOT_FORMAT.n_limbs
    # masked broadcast instead of take_along_axis (TPU gathers are slow):
    # abs limb q receives rel digit j = q - q0 shifted by the row's bit
    # offset rb -- O(l_pad * m * L) selects, all vectorized.  Deep-
    # subnormal rows can have q0 + j < 0: every row value is a multiple of
    # 2^-2148 = abs bit 0 (each a_i * z_i product is), so canonical digits
    # entirely below bit 0 are zero and at most one digit straddles it --
    # fold that one into limb 0 with an exact right shift (multiple-of-
    # 2^20 by the same granularity argument).  Digits above the format top
    # are likewise zero for in-range values and drop out of the select.
    qs = jnp.arange(L, dtype=jnp.int32)[None, :]
    abs_limbs = jnp.zeros((m_pad, L), _I64)
    for j in range(l_pad):
        q = q0 + _I(j)                                    # (m_pad,)
        vj = (mag[:, j].astype(_I64) << rb) * sgn         # |vj| < 2^39
        sh = (jnp.maximum(-q, 0) * _I(LIMB_BITS)).astype(_I64)
        vj = jnp.where(sh > _I64(LIMB_BITS), _I64(0),
                       vj >> jnp.minimum(sh, _I64(LIMB_BITS)))
        abs_limbs = abs_limbs + jnp.where(
            qs == jnp.maximum(q, _I(0))[:, None], vj[:, None], _I64(0))

    special = jnp.zeros((m_pad, 3), jnp.int32)
    from ..exgemv import _apply_beta_rows, round_rows

    y_hi = jnp.pad(y_hi, (0, m_pad - m))
    y_lo = jnp.pad(y_lo, (0, m_pad - m))
    abs_limbs, special = _apply_beta_rows(
        abs_limbs, special, beta_hi, beta_lo, y_hi, y_lo, beta_mode)

    bits = round_rows(abs_limbs, special)[:m]
    return ((bits >> _U64(32)).astype(jnp.uint32),
            (bits & _U64(0xFFFFFFFF)).astype(jnp.uint32))
