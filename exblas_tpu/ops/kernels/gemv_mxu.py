"""MXU fast path for ExGEMV: exact byte-plane decomposition + int8 matmuls.

The VPU digit-plane GEMV kernel (gemv_kernel.py) costs ~140 integer ops per
A-element; at 8192^2 that holds ExGEMV near 140 GB/s while the chip can
stream >600 GB/s.  This path moves the product arithmetic to the MXU while
keeping every intermediate an exactly-representable integer, so the result
is exact and hence bit-identical to the VPU/XLA paths:

* per-row anchors ``E_i`` (an upper bound on the msb exponent of row i of
  A); each element is shifted to a W-bit fixed-point integer relative to
  its row anchor, two's-complemented, and split into ``W/8`` *byte planes*
  with an excess-128 offset -- each plane value ``b - 128`` fits int8.
  The whole decomposition is ~40 VPU ops/element (no per-slice extract
  ladder: one funnel shift + one XOR per word + one truncating int8
  convert per plane);
* ``z = fl(alpha*x)`` is decomposed once at the XLA level into ``NZ``
  *balanced signed base-256 digits* (values in [-128, 127], exactly int8)
  against a global anchor F;
* plane x digit products are int8 MXU matmuls with exact int32
  accumulation: ``N_s[t, i] = sum_k (b_s[i,k] - 128) * d_t[k]``;
* the -128 excess is compensated by a precomputed limb vector (the z-digit
  column sums are global constants), and the two's-complement sign by one
  extra matmul against the negative-mask plane;
* deposits land in a small per-row *relative* accumulator (bit p has
  exponent ``E_i + F + 2 - R0 + p``); one in-kernel correctly-rounded
  conversion per row finishes the job.  ``beta*y`` is deposited exactly
  into the same accumulator (106-bit product, coverage-checked by the
  dispatcher).

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
from .round_in_kernel import round_lanes_acc

LANES = 128
KT = 256            # k-tile (two lane tiles)
_I = jnp.int32
_U = jnp.uint32
_I64 = jnp.int64
_U64 = jnp.uint64
_Z = _np.int32(0)

# Largest k slice-sum run between limb spills: |sum_k (b-128)*d| <= k * 2^14
# must stay < 2^30 so _deposit_row3 pieces fit, hence k_run <= 2^15.
SPILL_K = 32768
SPILL_TILES = SPILL_K // KT

# Each spill grows the busiest relative-accumulator limb by up to
# ~3 piece positions x min(ns, nz) (s,t) pairs x 2^20 (p0/p1 deposit pieces
# are NONNEGATIVE -- the sign travels in h2 two limbs up -- so growth is
# monotone): <~ 40 * 2^20 ~ 2^25.5 per spill.  A value-preserving carry
# pass every RENORM_SPILLS spills re-bounds the limbs
# (16 * 2^25.5 ~ 2^29.5 << 2^31), making the 128-spill total-k cap safe.
RENORM_SPILLS = 16
MAX_K_MXU = 128 * SPILL_K

# Extra headroom (bits above the anchor base e_base = E_i + F + 2) that
# beta*y products may occupy; coverage-checked by the dispatcher.
MXU_BETA_HEAD = 36


def _rung_params(nwa: int, nwz: int, beta_mode: str, k_pad: int = SPILL_K):
    """Static geometry for a (nwa, nwz)-word rung.

    nwa: 32-bit words per A element (2 or 3 -> W = 64 / 96 anchored bits).
    nwz: words per z element (Wz = 64 / 96; NZ = Wz/8 + 1 balanced digits).
    k_pad: padded column count -- class totals reach k_pad * 2^14, so the
    accumulator top grows by log2(k_pad / 2^15) bits beyond the one-spill
    geometry.
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
    if beta_mode != "zero":
        l_rel += 3
    return w_a, w_z, ns, nz, r0, l_rel


# ---------------------------------------------------------------------------
# XLA-level analysis (anchors + coverage) -- one cheap pass over a_hi only
# ---------------------------------------------------------------------------

def analyze_gemv_rows(a_hi, a_lo):
    """Per-row anchors and coverage spread from the hi words (one 4-byte/elem
    pass); a_lo is touched only when hi-invisible elements (hi word 0 mod
    sign: true zeros vs sub-2^-1043 subnormals) could break coverage.

    Returns (ea (m,) int32 anchor bounds, spread int32 scalar,
    has_special bool) -- all device values.
    """
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

def _slice_byte_planes(a_hi, a_lo, erow, nwa: int):
    """(128, KT) bit-pair block -> (planes, negm) for the matmuls.

    planes: list of W/8 int8 arrays, plane s = byte s of the two's-
    complement anchored value, excess-128 (so plane = b_s - 128).
    negm: int8 0/1 negative mask (the 2^W sign correction plane).
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
    if nwa == 3:
        big = sh >= _I(32)
        sh = sh - jnp.where(big, _I(32), _I(0))
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

    planes = []
    for s in range(w_a // 8):
        w = jax.lax.bitcast_convert_type(tc[s // 4], _I)
        j = s % 4
        p = (w >> _I(8 * j)) if j else w
        planes.append(p.astype(jnp.int8))    # truncating: (b ^ 0x80) - 256
    negm = (m & _I(1)).astype(jnp.int8)
    return planes, negm


def _renorm_rel(acc):
    """Value-preserving carry pass on the (l_rel, 128) relative accumulator:
    each limb's bits above LIMB_BITS move up one row.  The top row is left
    whole (any carry stays in place, as in the reference's Normalize,
    superaccumulator.cpp:138-162), so no bits can ever be dropped."""
    a = acc[...]
    c = a >> _I(LIMB_BITS)          # arithmetic: floor, value-preserving
    low = a - (c << _I(LIMB_BITS))
    row = jax.lax.broadcasted_iota(_I, a.shape, 0)
    top = _I(a.shape[0] - 1)
    low = jnp.where(row == top, a, low)      # keep the top row whole
    c_up = pltpu.roll(c, shift=jnp.int32(1), axis=0)
    c_up = jnp.where(row == 0, _I(0), c_up)
    acc[...] = low + c_up


def _deposit_row3(acc, v, q: int, r: int, sign: int = 1):
    """acc[q..q+2] += v * 2^r (v (1,128) int32, |v| < 2^30, static q/r)."""
    if sign < 0:
        v = -v
    h = v >> _I(LIMB_BITS)
    low = v - (h << _I(LIMB_BITS))
    p0 = (low << _I(r)) & _I(LIMB_MASK)
    hs = h << _I(r)
    h2 = hs >> _I(LIMB_BITS)
    mid = hs - (h2 << _I(LIMB_BITS))
    p1 = (low >> _I(LIMB_BITS - r)) + mid if r else mid
    acc[pl.ds(q, 1), :] += p0
    acc[pl.ds(q + 1, 1), :] += p1
    acc[pl.ds(q + 2, 1), :] += h2


def _deposit_beta_y(acc, y_hi, y_lo, bb_hi, bb_lo, e_base, r0, l_rel):
    """Deposit the exact 106-bit product beta*y into the relative
    accumulator rows: element lane i's product bit 0 sits at relative bit
    (e_lsb(beta) + e_lsb(y)) + r0 - e_base.  Coverage guaranteed by the
    dispatcher (cf. exgemv._mxu_beta_cover)."""
    t = dep.product_terms(bb_hi, bb_lo, y_hi, y_lo, _I(r0) - e_base)
    q, r, s = t["q"], t["r"], t["s"]
    big = _I(l_rel + 8)
    for k, cls in enumerate(t["classes"]):
        pbit = r + _I(14 * k)
        dq = pbit // _I(LIMB_BITS)
        rr = pbit - dq * _I(LIMB_BITS)
        p0, p1, p2 = dep.split_value30(cls.astype(_U), rr)
        pieces = tuple(p.astype(_I) * s for p in (p0, p1, p2))
        qk = q + dq
        qmin = jnp.min(jnp.where(t["valid"], qk, big))
        qmax = jnp.max(jnp.where(t["valid"], qk, _I(-1)))

        def body(w, carry, qk=qk, pieces=pieces):
            d = w - qk
            contrib = jnp.where(d == 0, pieces[0], _I(0))
            contrib = jnp.where(d == 1, pieces[1], contrib)
            contrib = jnp.where(d == 2, pieces[2], contrib)
            acc[pl.ds(w, 1), :] += contrib
            return carry

        jax.lax.fori_loop(qmin, qmax + 3, body, _I(0))


def _gemv_mxu_kernel(a_hi_ref, a_lo_ref, e_ref, zd_ref, corr_ref,
                     ebase_ref, y_hi_ref, y_lo_ref, bb_hi_ref, bb_lo_ref,
                     yhi_out, ylo_out, macc, cacc, arel,
                     *, nwa, nwz, beta_mode, k_pad, spill_tiles):
    w_a, w_z, ns, nz, r0, l_rel = _rung_params(nwa, nwz, beta_mode, k_pad)
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        macc[...] = jnp.zeros_like(macc)
        cacc[...] = jnp.zeros_like(cacc)
        arel[...] = jnp.zeros_like(arel)

    planes, negm = _slice_byte_planes(
        a_hi_ref[...], a_lo_ref[...], e_ref[:, 0:1], nwa)
    zd = zd_ref[...]
    for s in range(ns):
        n_s = jax.lax.dot_general(
            zd, planes[s], (((1,), (1,)), ((), ())),
            preferred_element_type=_I)       # (32, 128): rows = digit t
        macc[pl.ds(s * 32, 32), :] += n_s
    cacc[...] += jax.lax.dot_general(
        zd, negm, (((1,), (1,)), ((), ())), preferred_element_type=_I)

    # Spill the int32 slice sums into the limb accumulator every SPILL_TILES
    # k-steps (so |macc row| <= SPILL_K * 2^14 < 2^30 always fits a
    # _deposit_row3) and at the end.  Per-limb spill growth is <~ 6 * 2^20,
    # so <= 128 spills (MAX_K_MXU) stay inside the int32 carry slack.
    is_last = ik == nk - 1
    spill = jnp.logical_or(
        jnp.bitwise_and(ik + 1, _I(spill_tiles - 1)) == 0, is_last)

    @pl.when(spill)
    def _():
        # plane x digit deposits at bit 8(s+t); ~3 overlapping positions
        # x <= min(ns, nz) pairs each of <= 2^20 pieces per spill.
        for s in range(ns):
            for t in range(nz):
                q, r = divmod(8 * (s + t), LIMB_BITS)
                _deposit_row3(arel, macc[pl.ds(s * 32 + t, 1), :], q, r)
        # two's-complement sign correction: -2^(W) * sum_k negm * z
        for t in range(nz):
            q, r = divmod(w_a + 8 * t, LIMB_BITS)
            _deposit_row3(arel, cacc[pl.ds(t, 1), :], q, r, sign=-1)
        macc[...] = jnp.zeros_like(macc)
        cacc[...] = jnp.zeros_like(cacc)

        # spill deposits are sign-skewed (p0/p1 >= 0), so limbs grow
        # monotonically; re-bound them every RENORM_SPILLS spills
        @pl.when(jnp.bitwise_and(
            ik + 1, _I(RENORM_SPILLS * spill_tiles - 1)) == 0)
        def _():
            _renorm_rel(arel)

    @pl.when(is_last)
    def _():
        # excess-128 compensation (global limb constant, all lanes)
        arel[...] += corr_ref[...]
        e_base = ebase_ref[0]
        if beta_mode != "zero":
            _deposit_beta_y(arel, y_hi_ref[0], y_lo_ref[0],
                            bb_hi_ref[...], bb_lo_ref[...],
                            e_base, r0, l_rel)
        zero3 = jnp.zeros((3, LANES), _I)
        hi32, lo32 = round_lanes_acc(arel, zero3, l_rel, 0,
                                     e_adjust=e_base - _I(r0))
        yhi_out[0] = hi32
        ylo_out[0] = lo32


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
    <= 32*nwa, z spread <= 32*nwz, padded k <= MAX_K_MXU, and beta*y
    products within [e_base - r0, e_base + MXU_BETA_HEAD] bits.

    Returns (hi, lo) uint32 (m,) -- bit-identical to the VPU/XLA paths.
    """
    m, k = a_hi.shape
    m_pad = -(-m // LANES) * LANES
    k_pad = -(-k // KT) * KT
    assert k_pad <= MAX_K_MXU
    assert (spill_tiles & (spill_tiles - 1)) == 0 and spill_tiles <= SPILL_TILES
    w_a, w_z, ns, nz, r0, l_rel = _rung_params(nwa, nwz, beta_mode, k_pad)
    a_hi = jnp.pad(a_hi, ((0, m_pad - m), (0, k_pad - k)))
    a_lo = jnp.pad(a_lo, ((0, m_pad - m), (0, k_pad - k)))
    z_hi = jnp.pad(z_hi, (0, k_pad - k))
    z_lo = jnp.pad(z_lo, (0, k_pad - k))

    zdig, zsum = make_z_digits(z_hi, z_lo, f_anchor, nwz)
    corr = make_excess_corr_limbs(zsum, nwa, nwz, l_rel)
    corr_b = jnp.broadcast_to(corr[:, None], (l_rel, LANES))

    e_sub = jnp.broadcast_to(
        jnp.pad(ea, (0, m_pad - m))[:, None], (m_pad, LANES))
    m_blocks = m_pad // LANES
    # (m_blocks, 1, LANES): Pallas TPU requires the last two block dims to
    # divide (8, 128) or equal the array dims, so per-row-block operands get
    # a leading grid axis instead of a (1, 128) block over (m_blocks, 128).
    ebase = (jnp.pad(ea, (0, m_pad - m)) + f_anchor + _I(2)).reshape(
        m_blocks, 1, LANES)

    if beta_mode == "zero":
        y_hi = jnp.zeros((m_blocks, 1, LANES), jnp.uint32)
        y_lo = jnp.zeros((m_blocks, 1, LANES), jnp.uint32)
        beta_hi = jnp.uint32(0)
        beta_lo = jnp.uint32(0)
    else:
        y_hi = jnp.pad(y_hi, (0, m_pad - m)).reshape(m_blocks, 1, LANES)
        y_lo = jnp.pad(y_lo, (0, m_pad - m)).reshape(m_blocks, 1, LANES)
    bb_h = jnp.broadcast_to(beta_hi, (1, LANES))
    bb_l = jnp.broadcast_to(beta_lo, (1, LANES))

    k_blocks = k_pad // KT

    hi, lo = pl.pallas_call(
        functools.partial(_gemv_mxu_kernel, nwa=nwa, nwz=nwz,
                          beta_mode=beta_mode, k_pad=k_pad,
                          spill_tiles=spill_tiles),
        grid=(m_blocks, k_blocks),
        in_specs=[
            pl.BlockSpec((LANES, KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i, j: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, KT), lambda i, j: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_rel, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_blocks, 1, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((m_blocks, 1, LANES), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ns * 32, LANES), jnp.int32),
            pltpu.VMEM((32, LANES), jnp.int32),
            pltpu.VMEM((l_rel, LANES), jnp.int32),
        ],
    )(a_hi, a_lo, e_sub, zdig, corr_b, ebase, y_hi, y_lo, bb_h, bb_l)
    return hi.reshape(-1)[:m], lo.reshape(-1)[:m]
