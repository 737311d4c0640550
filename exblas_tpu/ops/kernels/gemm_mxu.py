"""MXU fast path for ExGEMM: exact Ozaki-style slice decomposition.

The VPU-exact GEMM costs ~100 integer ops per MAC.  This path moves the
FLOPs to the MXU while keeping every intermediate an exactly-representable
integer, so the result stays exact and hence bit-identical to the VPU/XLA
paths:

* anchor exponents: E_i = max exponent of row i of A, F_j = max exponent of
  column j of B;
* each element is recoded into SA+1 (resp. SB+1) *balanced signed base-256
  digits* (int8, in [-128, 127]; the extra digit absorbs the recode carry)
  aligned to its row/column anchor (``make_digits``).  An element is
  *covered* iff its significand lies within 8*SA bits of the anchor;
  callers must check coverage and fall back to the VPU kernel otherwise;
* digit-pair products: ``M_st = sum_k A_s[i,k] * B_t[k,j]`` over k-tiles
  of 256 are int8 MXU matmuls with exact int32 accumulation -- measured at
  ~1.6x the bf16 rate (156 vs 98 Tmac/s), which more than pays for the
  (SA+1)(SB+1) vs SA*SB extra products;
* class deposits: ``a*b = sum_c M_c * 2^(E_i + F_j + 2 - 8c)``.  In an
  accumulator held *relative to the per-element anchor base* the deposit
  position depends only on c = s+t -- a compile-time constant -- so deposits
  are two static vector adds per digit pair, no windowed scatter at all;
* rounding happens in-kernel on the small relative accumulator with the
  per-element absolute exponent ``E_i + F_j`` re-applied.

Reference counterpart: this is the "(b) Ozaki-style splitting on the MXU"
plan of SURVEY.md §7; the reference itself has no analog (its GPU GEMM is a
per-MAC EFT loop, ExGEMM.Superacc.cl:200-284).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import deposit as dep
from ...core.ieee import decode_fields
from ...core.rounding import ieee_encode_round_pair
from ...core.types import LIMB_BITS, LIMB_MASK

LANES = 128
KT = 1024         # max k-tile; large rungs shrink it to fit VMEM (_pick_kt)
_I = jnp.int32
_U = jnp.uint32
_Z = _np.int32(0)


# ---------------------------------------------------------------------------
# XLA-level prep: anchors, coverage, slices
# ---------------------------------------------------------------------------

def _exp_msb(hi, lo):
    """Exponent of the leading bit; -10000 for zeros/specials (excluded)."""
    sign, expf, mhi, mlo = decode_fields(hi, lo)
    is_zero = jnp.logical_and(expf == 0,
                              jnp.logical_and(mhi == 0, mlo == 0))
    special = expf == 0x7FF
    e = expf - _I(1023)  # normals: value in [2^e, 2^(e+1))
    # subnormals: find the actual msb (expf == 0)
    sub = jnp.logical_and(expf == 0, jnp.logical_not(is_zero))
    # msb of the fraction via the exact float32-exponent trick on halves
    def msb24(v):
        f = jnp.maximum(v, _U(1)).astype(jnp.float32)
        return ((jax.lax.bitcast_convert_type(f, _U) >> _U(23))
                .astype(_I) - _I(127))
    hi_msb = jnp.where(mhi != 0, msb24(mhi) + _I(32), msb24(mlo))
    # subnormal value = frac * 2^-1074; msb position = msb(frac) - 1074
    e_sub = hi_msb - _I(1074)
    e = jnp.where(sub, e_sub, e)
    e = jnp.where(jnp.logical_or(is_zero, special), _I(-10000), e)
    return e, is_zero, special


def analyze_gemm_operands(a_hi, a_lo, b_hi, b_lo):
    """Anchors and coverage spreads.  Returns (ea (m,), fb (n,), spread_a,
    spread_b, has_special) -- all device arrays; spread_x is the max over
    elements of (anchor - element lsb exponent), i.e. slices needed for
    that operand = ceil((spread+1)/8).  Per-operand spreads let the
    dispatcher pick asymmetric (sa, sb) rungs: matmul count is sa*sb, so
    e.g. a narrow A against a wide B runs (8, 12) = 96 products instead of
    the symmetric (12, 12) = 144."""
    e_a, zero_a, spec_a = _exp_msb(a_hi, a_lo)
    e_b, zero_b, spec_b = _exp_msb(b_hi, b_lo)
    ea = jnp.max(e_a, axis=1)               # (m,) row anchors
    fb = jnp.max(e_b, axis=0)               # (n,) col anchors
    # element lsb >= e_msb - 52 (conservative for trailing zeros)
    lsb_a = jnp.where(zero_a | spec_a, _I(10000), e_a - _I(52))
    lsb_b = jnp.where(zero_b | spec_b, _I(10000), e_b - _I(52))
    spread_a = jnp.max(jnp.where(
        lsb_a == 10000, _I(0), ea[:, None] - lsb_a + _I(1)))
    spread_b = jnp.max(jnp.where(
        lsb_b == 10000, _I(0), fb[None, :] - lsb_b + _I(1)))
    has_special = jnp.logical_or(jnp.any(spec_a), jnp.any(spec_b))
    return ea, fb, spread_a, spread_b, has_special


def _extract8(mlo, mhi, s):
    """Bits [s, s+8) of the 53-bit value (mhi21:mlo32); s in [-7, 60]."""
    def clip(x, lo, hi):
        return jnp.minimum(jnp.maximum(x, _I(lo)), _I(hi))

    k = _u(clip(-s, 0, 31))
    neg = (mlo << k) & _U(0xFF)
    s_lo = _u(clip(s, 0, 31))
    up = _u(clip(32 - s, 0, 31))
    low = ((mlo >> s_lo) | jnp.where(s > 0, mhi << up, _U(0))) & _U(0xFF)
    s_hi = _u(clip(s - 32, 0, 31))
    high = (mhi >> s_hi) & _U(0xFF)
    out = jnp.where(s < 0, neg, jnp.where(s < 32, low, high))
    return jnp.where(s >= 61, _U(0), out)


def _u(x):
    return x.astype(_U)


def make_digits(hi, lo, anchors, n_slices: int, axis: int):
    """Balanced signed base-256 digits as int8: (n_slices + 1, m, k).

    Digit u holds weight 2^(anchor + 1 - 8u); u = 0 is the carry digit in
    {-1, 0, 1}, u >= 1 are the recoded byte slices, each in [-128, 127].
    The recode is exact: sum_u d_u * 2^(anchor+1-8u) equals the signed
    element value (coverage: element lsb >= anchor + 1 - 8*n_slices, as
    checked by the dispatcher).  int8 digits let the slice-pair products
    ride the MXU's int8 path (measured ~1.6x the bf16 rate) with exact
    int32 accumulation; zeros/specials become all-zero digits.  axis=0:
    anchors per row (shape (m,)); axis=1: anchors per column ((k,)).
    """
    sign, expf, mhi, mlo = decode_fields(hi, lo)
    e_lsb = jnp.maximum(expf, _I(1)) - _I(1075)
    anc = anchors[:, None] if axis == 0 else anchors[None, :]
    sgn = jnp.where(sign == 1, _I(-1), _I(1))
    valid = jnp.logical_and(expf != 0x7FF,
                            jnp.logical_or(expf != 0,
                                           jnp.logical_or(mhi != 0,
                                                          mlo != 0)))
    out = [None] * (n_slices + 1)
    carry = jnp.zeros_like(sgn)
    for s in reversed(range(n_slices)):     # least-significant slice first
        cut = anc + _I(1) - _I(8 * (s + 1))
        byte = _extract8(mlo, mhi, cut - e_lsb).astype(_I)
        byte = jnp.where(valid, byte, _I(0))
        t = sgn * byte + carry              # in [-256, 256]
        d = ((t + _I(128)) & _I(255)) - _I(128)   # in [-128, 127]
        carry = (t - d) >> _I(8)            # in {-1, 0, 1}
        out[s + 1] = d.astype(jnp.int8)
    out[0] = carry.astype(jnp.int8)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _round_rel_kernel_part(acc, e_base, l_rel, rel0):
    """Round the (l_rel*128, bn) relative accumulator -> (hi, lo) u32
    (128, bn).  acc rows [q*128, (q+1)*128) hold limb q of all 128 x bn
    elements.  e_base (128, bn) int32: absolute exponent of rel bit rel0.

    Canonicalization happens IN PLACE (each limb row is read once and
    overwritten with its canonical digit; the carry moves forward in the
    loop state), which removes the separate digit scratch -- at the wide
    rungs that scratch was ~40% of the kernel's VMEM and priced the
    (48, 48) rung out of the 14 MB budget.
    """
    bn = acc.shape[1]

    def canon(j, carry):
        d = acc[pl.ds(j * LANES, LANES), :] + carry
        digit = d & _I(LIMB_MASK)
        acc[pl.ds(j * LANES, LANES), :] = digit
        return (d - digit) >> _I(LIMB_BITS)

    carry_out = jax.lax.fori_loop(
        _I(0), _I(l_rel), canon, jnp.zeros((LANES, bn), _I))
    negative = carry_out < 0

    def negate(j, borrow):
        d = acc[pl.ds(j * LANES, LANES), :]
        t = (d ^ _I(LIMB_MASK)) + borrow
        acc[pl.ds(j * LANES, LANES), :] = jnp.where(negative,
                                                    t & _I(LIMB_MASK), d)
        return t >> _I(LIMB_BITS)

    jax.lax.fori_loop(_I(0), _I(l_rel), negate,
                      jnp.ones((LANES, bn), _I))

    def msb20(d):
        f = jnp.maximum(d, _I(1)).astype(jnp.float32)
        return ((jax.lax.bitcast_convert_type(f, _U) >> _U(23))
                .astype(_I) - _I(127))

    def find_p(j, p):
        d = acc[pl.ds(j * LANES, LANES), :]
        cand = _I(LIMB_BITS) * j + msb20(d)
        return jnp.where(d != 0, jnp.maximum(p, cand), p)

    p_msb = jax.lax.fori_loop(_I(0), _I(l_rel), find_p,
                              jnp.full((LANES, bn), -1, _I))
    pos_low = p_msb - _I(54)

    def clip(x, lo, hi_):
        return jnp.minimum(jnp.maximum(x, _I(lo)), _I(hi_))

    def window(j, st):
        w_hi, w_lo, sticky = st
        d = _u(acc[pl.ds(j * LANES, LANES), :])
        s = _I(LIMB_BITS) * j - pos_low
        in_lo = jnp.logical_and(s > -20, s < 32)
        in_hi = jnp.logical_and(s > 12, s < 55)
        sh_l = _u(clip(s, 0, 31))
        sh_nl = _u(clip(-s, 0, 31))
        lo_part = jnp.where(s >= 0, d << sh_l, d >> sh_nl)
        w_lo = jnp.where(in_lo, w_lo | lo_part, w_lo)
        sh32 = _u(clip(s - 32, 0, 31))
        sh32n = _u(clip(32 - s, 0, 31))
        hi_part = jnp.where(s >= 32, d << sh32, d >> sh32n)
        w_hi = jnp.where(in_hi, w_hi | hi_part, w_hi)
        below_all = s <= _I(-20)
        part_mask = (_U(1) << sh_nl) - _U(1)
        hit = jnp.logical_or(
            jnp.logical_and(below_all, d != 0),
            jnp.logical_and(jnp.logical_and(s < 0,
                                            jnp.logical_not(below_all)),
                            (d & part_mask) != 0))
        sticky = sticky | jnp.where(hit, _I(1), _I(0))
        return w_hi, w_lo, sticky

    w_hi, w_lo, sticky_i = jax.lax.fori_loop(
        _I(0), _I(l_rel), window,
        (jnp.zeros((LANES, bn), _U), jnp.zeros((LANES, bn), _U),
         jnp.zeros((LANES, bn), _I)))

    sign = jnp.where(negative, _I(1), _I(0))
    e_msb = p_msb + e_base - _I(rel0)
    hi32, lo32 = ieee_encode_round_pair(
        sign, e_msb, w_hi & _U(0x7FFFFF), w_lo, sticky_i != 0)
    is_zero = p_msb < 0
    hi32 = jnp.where(is_zero, _U(0), hi32)
    lo32 = jnp.where(is_zero, _U(0), lo32)
    return hi32, lo32


def _renorm_rel(acc):
    """Value-preserving carry pass on the (l_rel*128, bn) relative
    accumulator: carries move up one limb row; the TOP limb row is kept
    WHOLE.  Stripping the top row's carry (the pre-round-2b behavior)
    silently added 2^(20*l_rel) to any state whose top limb was negative
    -- reachable when the class-0 (carry-digit x carry-digit) sums are
    negative and rel0 % 20 == 0 puts their high part in the top limb --
    which flipped the rounded sign (fuzz seed 20260820 case 1).  Same
    invariant as the reference's Normalize, which deliberately keeps the
    final carry in the top limb (superaccumulator.cpp:138-162), and as
    gemv_mxu._renorm_rel3.  Top-limb growth stays in int32: <= ~2^20 per
    spill from class-0 deposits + <= 2^11 per pass of incoming carries,
    bounded by the k_pad <= 2^22 cap in gemm_bits_mxu."""
    a = acc[...]
    c = a >> _I(LIMB_BITS)
    low = a - (c << _I(LIMB_BITS))
    row = jax.lax.broadcasted_iota(_I, a.shape, 0)
    low = jnp.where(row >= _I(a.shape[0] - LANES), a, low)
    c_up = pltpu.roll(c, shift=jnp.int32(LANES), axis=0)
    c_up = jnp.where(row < LANES, _I(0), c_up)
    acc[...] = low + c_up


def _deposit_beta_c_rel(acc, c_hi, c_lo, bb_hi, bb_lo, e_base, rel0, l_rel):
    """Deposit the exact 106-bit products beta*c into the relative
    accumulator: element (i, j)'s bit 0 sits at absolute exponent
    e_base_ij - rel0, so the deposit offset is per-element (rel0 - e_base).
    Coverage (checked by the dispatcher) guarantees every product fits
    within [0, l_rel*20) relative bits."""
    t = dep.product_terms(bb_hi, bb_lo, c_hi, c_lo, _I(rel0) - e_base)
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
            acc[pl.ds(w * LANES, LANES), :] += contrib
            return carry

        jax.lax.fori_loop(qmin, qmax + 3, body, _I(0))


def _mxu_kernel(a_sl_ref, b_sl_ref, e_ref, f_ref, c_hi_ref, c_lo_ref,
                bb_hi_ref, bb_lo_ref, yhi_out, ylo_out,
                acc, cls, *, sa, sb, l_rel, rel0, beta_mode, kt):
    kt_i = pl.program_id(2)
    n_cls = sa + sb + 1

    @pl.when(kt_i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        cls[...] = jnp.zeros_like(cls)
        if beta_mode != "zero":
            bn = acc.shape[1]
            e_base = e_ref[:, 0:1] + f_ref[0:1, :] + _I(2)
            bb_h = jnp.broadcast_to(bb_hi_ref[0:1, 0:1], (LANES, bn))
            bb_l = jnp.broadcast_to(bb_lo_ref[0:1, 0:1], (LANES, bn))
            _deposit_beta_c_rel(acc, c_hi_ref[...], c_lo_ref[...],
                                bb_h, bb_l, e_base, rel0, l_rel)

    # digit-pair products fold into per-CLASS int32 accumulators (the
    # deposit position depends only on c = s+t): one add per pair instead
    # of a full limb-split deposit.  int8 x int8 -> int32 matmuls run at
    # ~1.6x the bf16 rate on the MXU (measured 156 vs 98 Tmac/s), which
    # beats the (sa+1)(sb+1)/(sa*sb) extra-carry-digit cost at every rung.
    # Class sums stay exact in int32: <= (min(sa, sb)+1) pairs x run *
    # 2^14 <= ~2^29.2 by the _spill_run sizing below.
    # pair-major order keeps a_s stationary in the MXU across the t loop
    # (class-major register accumulation measured ~4% slower).  Wide
    # rungs (the dynamic-range ladder extension) loop s dynamically:
    # fully unrolling (sa+1)(sb+1) > ~300 matmuls made Mosaic compiles
    # take minutes per rung with no runtime win (the matmul stream, not
    # issue overhead, dominates at kt >= 256).
    if (sa + 1) * (sb + 1) <= 300:
        for s in range(sa + 1):
            a_s = a_sl_ref[s]          # (128, KT) int8
            for t in range(sb + 1):
                b_t = b_sl_ref[t]      # (KT, 128) int8
                m = jax.lax.dot_general(
                    a_s, b_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=_I)
                cls[pl.ds((s + t) * LANES, LANES), :] += m
    else:
        def s_body(s, carry):
            a_s = a_sl_ref[s]          # (128, KT) int8, dynamic s
            for t in range(sb + 1):
                b_t = b_sl_ref[t]      # (KT, 128) int8
                m = jax.lax.dot_general(
                    a_s, b_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=_I)
                cls[pl.ds((s + t) * LANES, LANES), :] += m
            return carry

        jax.lax.fori_loop(_I(0), _I(sa + 1), s_body, _I(0))

    # every `run` k-elements (and at the end): limb-split the n_cls class
    # rows into the relative accumulator and renorm.  The run length is
    # sized so class sums stay < ~2^29.2 (see _spill_run), so the spill
    # split's high part h < 2^9.2 and each limb's per-spill gain (~3 p0 +
    # ~3 up terms) stays < 2^30 against the int32 slack; renorm right
    # after re-bounds the limbs.
    period = max(1, _spill_run(sa, sb) // kt)
    spill = jnp.logical_or(
        jnp.bitwise_and(kt_i + 1, _I(period - 1)) == 0,
        kt_i == pl.num_programs(2) - 1)

    @pl.when(spill)
    def _():
        for c in range(n_cls):
            m = cls[pl.ds(c * LANES, LANES), :]
            # digit u weight 2^(anchor+1-8u) => pair (s, t) weight
            # 2^(e_base - 8(s+t)); acc bit 0 sits at e_base - rel0
            p_rel = rel0 - 8 * c
            q, r = divmod(p_rel, LIMB_BITS)
            h = m >> _I(LIMB_BITS)
            l_ = m - (h << _I(LIMB_BITS))
            p0 = ((_u(l_) << _U(r)) & _U(LIMB_MASK)).astype(_I)
            p1 = (_u(l_) >> _U(LIMB_BITS - r)).astype(_I) if r else _I(0)
            acc[pl.ds(q * LANES, LANES), :] += p0
            up = (h << _I(r)) + p1
            acc[pl.ds((q + 1) * LANES, LANES), :] += up
        cls[...] = jnp.zeros_like(cls)
        _renorm_rel(acc)

    @pl.when(kt_i == pl.num_programs(2) - 1)
    def _():
        e_base = e_ref[:, 0:1] + f_ref[0:1, :] + _I(2)  # (128,1) + (1,bn)
        hi32, lo32 = _round_rel_kernel_part(acc, e_base, l_rel, rel0)
        yhi_out[...] = hi32
        ylo_out[...] = lo32


def _spill_run(sa: int, sb: int) -> int:
    """Largest power-of-2 spill-run length (k elements between limb
    spills) keeping per-class int32 sums exact: a class accumulates
    (min(sa, sb) + 1) digit pairs per k element, each |pair| <= 127*128
    < 2^14, so |cls| <= (min+1) * run * 2^14 -- bounded at ~2^29.2 so the
    spill split's high part stays < 2^9.2 (the original 2048-element run
    at (16, 16) sat at exactly this bound)."""
    allowed = 36000 // (min(sa, sb) + 1)          # run * (min+1) <= ~2^15.2
    return max(256, 1 << (allowed.bit_length() - 1))


def mxu_l_rel(sa: int, sb: int, beta_mode: str, k_pad: int) -> int:
    """Relative-accumulator depth (limbs) for a digit configuration.

    Digit-pair deposits land in [0, rel0]; the exact value itself is
    bounded by k * 2^e_base, i.e. top bit rel0 + ceil(log2 k), and spill
    transients stay within ~rel0 + 8.  beta*C products may additionally
    reach up to ~MXU_BETA_HEAD bits above the anchor (coverage-checked by
    the dispatcher), so the beta modes carry three extra limbs."""
    rel0 = 8 * (sa + sb)
    klog = max(k_pad - 1, 1).bit_length()
    l_rel = (rel0 + max(klog + 1, 8) + 2) // LIMB_BITS + 2
    if beta_mode != "zero":
        l_rel += 3
    return l_rel


# Bits of headroom above the anchor that beta*C products may occupy (the
# three extra limbs minus two limbs' carry slack).
MXU_BETA_HEAD = 36


def _vmem_estimate(sa: int, sb: int, l_rel: int, bn: int, kt: int) -> int:
    # acc (l_rel rows, canonicalized in place -- no digit scratch) + cls
    scratch = (l_rel + (sa + sb + 1)) * LANES * bn * 4
    blocks = 2 * ((sa + 1) * LANES * kt + (sb + 1) * kt * bn
                  + 2 * LANES * bn * 4 + 2 * LANES * bn * 4)
    return scratch + blocks


def _pick_kt_bn(sa: int, sb: int, l_rel: int) -> tuple[int, int]:
    """(k-tile, out-block width) for a rung.  Bigger k-tiles amortize the
    per-pair cls adds (~1 VPU add per C element per pair per tile --
    measured 49.9 -> 43.8 ms at n=4096 going 256 -> 1024, and a further
    48 -> 45.5 ms at kt=2048); the tile never exceeds the spill run (the
    int32 class-sum bound, _spill_run); large rungs shrink the tile to
    stay within ~14 MB of the ~16 MB/core VMEM (scratch + pipelined
    blocks).  bn is pinned at 128: Pallas TPU requires the last block
    dim be a multiple of 128 (bn=64 fails to lower -- caught on hardware
    by the round-4 wide rungs), and bn=256 measured slightly slower at
    (8,8)."""
    run = _spill_run(sa, sb)
    for kt in (2048, 1024, 512, 256, 128):
        if kt > run:
            continue
        if _vmem_estimate(sa, sb, l_rel, 128, kt) <= 14 * 2**20:
            return kt, 128
    # Unreachable for the shipped ladder ((48,48) fits at kt=128); a
    # future wider rung must fail HERE, not at Mosaic lowering with an
    # opaque VMEM exhaustion.
    raise ValueError(
        f"MXU GEMM rung ({sa},{sb}) exceeds the VMEM budget even at "
        f"kt=128 ({_vmem_estimate(sa, sb, l_rel, 128, 128)} bytes); "
        "route this spread to the VPU fallback")


@functools.partial(jax.jit, static_argnames=("sa", "sb", "beta_mode"))
def gemm_bits_mxu(a_hi, a_lo, b_hi, b_lo, c_hi=None, c_lo=None,
                  beta_hi=None, beta_lo=None, beta_mode: str = "zero",
                  sa: int = 10, sb: int = 10):
    """C = beta*C + A@B via the exact MXU slice path.  Caller must have
    verified coverage: per-row/column mantissa-bit spread <= 8*sa for A and
    <= 8*sb for B (the slices hold 8 bits each), no specials, and -- for
    beta modes -- every beta*c product within [anchor - 8(sa+sb),
    anchor + MXU_BETA_HEAD] bits (see exgemm._mxu_coverage).

    Returns (hi, lo) uint32 arrays of shape (m, n), bit-identical to the
    VPU/XLA exact paths.
    """
    m, k = a_hi.shape
    _, n = b_hi.shape
    kt0, bn = _pick_kt_bn(sa, sb,
                          mxu_l_rel(sa, sb, beta_mode, -(-k // KT) * KT))
    k_pad = -(-k // kt0) * kt0
    # top-limb int32 growth bound for the value-preserving renorm
    # (see _renorm_rel): ~2^20 per 2048-element spill run
    assert k_pad <= 1 << 22, "MXU GEMM k cap; route larger k to the VPU path"
    m_pad = -(-m // LANES) * LANES
    n_pad = -(-n // bn) * bn
    a_hi = jnp.pad(a_hi, ((0, m_pad - m), (0, k_pad - k)))
    a_lo = jnp.pad(a_lo, ((0, m_pad - m), (0, k_pad - k)))
    b_hi = jnp.pad(b_hi, ((0, k_pad - k), (0, n_pad - n)))
    b_lo = jnp.pad(b_lo, ((0, k_pad - k), (0, n_pad - n)))
    if beta_mode == "zero":
        c_hi = jnp.zeros((m_pad, n_pad), jnp.uint32)
        c_lo = jnp.zeros((m_pad, n_pad), jnp.uint32)
        beta_hi = jnp.uint32(0)
        beta_lo = jnp.uint32(0)
    else:
        c_hi = jnp.pad(c_hi, ((0, m_pad - m), (0, n_pad - n)))
        c_lo = jnp.pad(c_lo, ((0, m_pad - m), (0, n_pad - n)))
    bb_h = jnp.broadcast_to(beta_hi, (1, LANES))
    bb_l = jnp.broadcast_to(beta_lo, (1, LANES))

    ea, fb, _, _, _ = analyze_gemm_operands(a_hi, a_lo, b_hi, b_lo)
    ea = jnp.where(ea < -9000, _I(0), ea)  # all-zero rows: anchor irrelevant
    fb = jnp.where(fb < -9000, _I(0), fb)

    a_sl = make_digits(a_hi, a_lo, ea, sa, axis=0)   # (sa+1, m, k) int8
    b_sl = make_digits(b_hi, b_lo, fb, sb, axis=1)   # (sb+1, k, n) int8

    rel0 = 8 * (sa + sb)
    l_rel = mxu_l_rel(sa, sb, beta_mode, k_pad)

    e_b = jnp.broadcast_to(ea[:, None], (m_pad, 8))          # (m, 8)
    f_b = jnp.broadcast_to(fb[None, :], (8, n_pad))          # (8, n)

    hi, lo = pl.pallas_call(
        functools.partial(_mxu_kernel, sa=sa, sb=sb, l_rel=l_rel,
                          rel0=rel0, beta_mode=beta_mode, kt=kt0),
        grid=(m_pad // LANES, n_pad // bn, k_pad // kt0),
        in_specs=[
            pl.BlockSpec((sa + 1, LANES, kt0), lambda i, j, kt: (_Z, i, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb + 1, kt0, bn), lambda i, j, kt: (_Z, kt, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 8), lambda i, j, kt: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i, j, kt: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, bn), lambda i, j, kt: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, bn), lambda i, j, kt: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j, kt: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j, kt: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((LANES, bn), lambda i, j, kt: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, bn), lambda i, j, kt: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((m_pad, n_pad), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((l_rel * LANES, bn), jnp.int32),
            pltpu.VMEM(((sa + sb + 1) * LANES, bn), jnp.int32),
        ],
    )(a_sl, b_sl, e_b, f_b, c_hi, c_lo, bb_h, bb_l)
    return hi[:m, :n], lo[:m, :n]
