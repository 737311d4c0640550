"""Pallas TPU kernel for ExSUM: exact limb accumulation on the VPU.

Decomposition (cf. reference GPU kernel ExSUM.Superacc.cl:219-291, re-designed
for TPU):

* the grid walks row-blocks of the (rows, 128) uint32 bit-pair stream
  sequentially (TPU grid steps run in order on a core, so one VMEM scratch
  accumulator of shape (L_SUM, 128) serves the whole pass -- each of the 128
  VPU lanes owns a private superaccumulator column; no atomics, no races,
  unlike the reference's interleaved __local sub-superaccs);
* each element deposits its 53-bit significand as four signed 20-bit pieces
  into limbs q..q+3; the deposit is a *windowed* branch-free compare/select
  loop over only the limb rows the whole block actually touches
  (data-dependent runtime, data-independent results);
* a vectorized carry pass every ``RENORM_EVERY`` grid steps keeps limbs inside
  int32 slack (the no-atomics replacement for the reference's AccumulateWord
  carry machinery);
* lane columns are merged (exact int add) and renormalized outside the kernel.

NaN/Inf are counted in a side scratch and merged the same way.

Mosaic gotchas encoded here (discovered on v5e):
* index-map literals and loop carries must be int32 (x64 mode promotes bare
  Python ints to i64, which Mosaic cannot lower);
* jnp.clip / jnp.minimum on uint32 mis-lowers -- clamp in int32 only
  (see core.deposit._clip_i32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.accumulator import to_int32_limbs
from ...core.types import L_SUM, LIMB_BITS, LIMB_MASK, SUM_FORMAT, Superacc

LANES = 128
_I = jnp.int32
_Z = _np.int32(0)

# Limb growth between carry passes: a phase row receives at most 4 piece
# planes per block, each a sum of rows/8 pieces < 2^20, so growth over
# RENORM_EVERY blocks is RENORM_EVERY * (rows/2) * 2^20, which (plus the
# canonical base < 2^21) must stay < 2^31:  rows * RENORM_EVERY <= 4064.
RENORM_EVERY = 4
MAX_ROWS_X_RENORM = 4064


def _renorm8(acc_ref):
    """Carry pass on the (L*8, 128) phase layout: carries move 8 rows up.

    The TOP limb rows are kept whole (their carries stay in place, as in
    the reference's Normalize, superaccumulator.cpp:138-162, and the MXU
    GEMM's _renorm_rel3 fix): although deposits never reach the headroom
    limbs, a lane whose RUNNING TOTAL is negative carries a persistent -1
    that climbs one limb per renorm pass -- after >= L renorm passes
    (large n with a small rows variant) it reaches the top row, and
    stripping it there would corrupt the value by +2^(20*L).  Keeping the
    top row whole is value-preserving for any carry state; the top limb
    only ever holds these +-small climbing carries, so int32 is safe.
    """
    a = acc_ref[...]
    c = a >> LIMB_BITS
    low = a - (c << LIMB_BITS)
    row = jax.lax.broadcasted_iota(_I, a.shape, 0)
    low = jnp.where(row >= _I(a.shape[0] - 8), a, low)  # keep top limb whole
    c_up = pltpu.roll(c, shift=jnp.int32(8), axis=0)
    c_up = jnp.where(row < 8, _I(0), c_up)
    acc_ref[...] = low + c_up


def _tree8(x):
    """(rows, 128) -> (8, 128) phase reduction by static halving adds.

    Bit-identical to ``jnp.sum(x.reshape(group, 8, 128), axis=0)`` (int32
    addition is associative mod 2^32) but lowers to full-width vector adds
    instead of a strided reshape reduction -- measured ~25% faster end to
    end on the DOT kernel."""
    r = x.shape[0]
    while r % 16 == 0:
        h = r // 2
        x = x[:h] + x[h:]
        r = h
    if r > 8:
        acc = x[0:8]
        for s in range(8, r, 8):
            acc = acc + x[s:s + 8]
        x = acc
    return x


def _decode_sum_fast(hi, lo):
    """Minimal-op decomposition of doubles into (q, signed pieces, flags).

    Trimmed for kernel throughput (the streaming decode is the dominant cost
    of ExSUM): specials have their mantissa masked to zero (so their pieces
    deposit nothing) and are counted separately; zeros keep q valid=false
    for the window bounds but naturally deposit zero pieces, so the
    all-same-exponent fast path can include them at any q.
    """
    his = jax.lax.bitcast_convert_type(hi, _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    mhi = (his & _I(0xFFFFF)) | (jnp.minimum(expf, _I(1)) << _I(20))
    mhi = jnp.where(special, _I(0), mhi)
    mlo = jnp.where(special, _I(0), jax.lax.bitcast_convert_type(lo, _I))
    nonzero = (mhi | mlo) != 0
    bvalid = nonzero  # specials already have mhi|mlo == 0

    p = jnp.maximum(expf, _I(1)) + _I(SUM_FORMAT.offset_bits - 1075)
    q = p // _I(LIMB_BITS)
    r = p - q * _I(LIMB_BITS)

    # mant53 << r as three u32 words; (x >> 1) >> (31 - r) keeps every
    # variable shift amount in [0, 31] with no clamps or selects.
    ru = jax.lax.bitcast_convert_type(r, jnp.uint32)
    rn = jax.lax.bitcast_convert_type(_I(31) - r, jnp.uint32)
    mhu = jax.lax.bitcast_convert_type(mhi, jnp.uint32)
    mlu = jax.lax.bitcast_convert_type(mlo, jnp.uint32)
    w0 = mlu << ru
    w1 = (mhu << ru) | ((mlu >> jnp.uint32(1)) >> rn)
    w2 = (mhu >> jnp.uint32(1)) >> rn
    m20 = jnp.uint32(LIMB_MASK)
    p0 = w0 & m20
    p1 = ((w0 >> jnp.uint32(20)) | (w1 << jnp.uint32(12))) & m20
    p2 = (w1 >> jnp.uint32(8)) & m20
    p3 = ((w1 >> jnp.uint32(28)) | (w2 << jnp.uint32(4))) & m20

    # sign via xor/sub with the broadcast sign word (cheaper than int mul)
    m = his >> _I(31)
    pieces = tuple(
        (jax.lax.bitcast_convert_type(x, _I) ^ m) - m
        for x in (p0, p1, p2, p3)
    )
    return q, pieces, bvalid, special, his


def _deposit_phase_planes(acc, v, pieces, group):
    """Add the four piece planes at limb rows v..v+3 of the phase acc."""
    del group
    for t, plane in enumerate(pieces):
        acc[pl.ds((v + _I(t)) * 8, 8), :] += _tree8(plane)


def _sum_deposit(acc, q, pieces, bvalid, group):
    """Windowed deposit of the four piece planes at per-element base q.

    Fast path: when every valid element shares one base limb (the common
    case for realistic exponent ranges), deposit the unmasked phase sums
    at that base -- zeros/specials have all-zero pieces, so including them
    at any base adds nothing.  Otherwise run the branch-free select loop
    over the block's distinct bases.  Results are bit-identical."""
    big = _I(L_SUM + 8)
    qmin = jnp.min(jnp.where(bvalid, q, big))
    qmax = jnp.max(jnp.where(bvalid, q, _I(-1)))

    @pl.when(qmin == qmax)
    def _():
        _deposit_phase_planes(acc, qmin, pieces, group)

    @pl.when(qmin != qmax)
    def _():
        def body(v, carry):
            mask = q == v
            sel = tuple(jnp.where(mask, x, _I(0)) for x in pieces)
            _deposit_phase_planes(acc, v, sel, group)
            return carry

        jax.lax.fori_loop(qmin, qmax + 1, body, _I(0))


def _sum_kernel(hi_ref, lo_ref, limb_out, spec_out, acc, spec, *, rows):
    i = pl.program_id(0)
    group = rows // 8

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    q, pieces, bvalid, special, his = _decode_sum_fast(
        hi_ref[...], lo_ref[...])
    _sum_deposit(acc, q, pieces, bvalid, group)

    # Specials are rare: count them only when the block has any.
    any_special = jnp.max(jnp.where(special, _I(1), _I(0)))

    @pl.when(any_special > 0)
    def _():
        his = jax.lax.bitcast_convert_type(hi_ref[...], _I)
        expf = (his >> _I(20)) & _I(0x7FF)
        special = expf == _I(0x7FF)
        frac_nz = jnp.logical_or(
            (his & _I(0xFFFFF)) != 0, lo_ref[...] != 0)
        is_nan = jnp.logical_and(special, frac_nz)
        is_inf = jnp.logical_and(special, jnp.logical_not(frac_nz))
        neg = his < 0
        one, zero = _I(1), _I(0)
        spec[0:1, :] += jnp.sum(
            jnp.where(is_nan, one, zero), axis=0, keepdims=True, dtype=_I)
        spec[1:2, :] += jnp.sum(
            jnp.where(jnp.logical_and(is_inf, jnp.logical_not(neg)),
                      one, zero), axis=0, keepdims=True, dtype=_I)
        spec[2:3, :] += jnp.sum(
            jnp.where(jnp.logical_and(is_inf, neg), one, zero),
            axis=0, keepdims=True, dtype=_I)

    # RENORM_EVERY is a power of two; use a mask (scalar % lowering is fragile)
    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        _renorm8(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _renorm8(acc)
        # Merge the 8 k-phases in-kernel (static unrolled): the XLA-level
        # epilogue then only lane-merges a (L_SUM, 128) array, as before the
        # phase layout (the 8x bigger merge under int64 emulation measurably
        # drags the whole call).
        for j in range(L_SUM):
            limb_out[j:j + 1, :] = jnp.sum(
                acc[8 * j:8 * j + 8, :], axis=0, keepdims=True, dtype=_I)
        spec_out[...] = spec[...]


@functools.partial(jax.jit, static_argnames=("rows",))
def exsum_pallas(hi, lo, rows: int = 256) -> Superacc:
    """Exact sum of doubles given as uint32 bit pairs -> Superacc.

    hi/lo: uint32 arrays of identical shape (flattened internally).
    rows: grid block height (a tiling knob; results are invariant to it).

    The accumulator uses the 8-phase layout (limb j of lane l lives in rows
    8j..8j+8): deposits are aligned (8, 128) adds, and per-block limb growth
    is bounded by 4 * (rows/8) * 2^20 per distinct exponent window.
    """
    assert rows % 8 == 0 and rows * RENORM_EVERY <= MAX_ROWS_X_RENORM
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    n = hi.shape[0]
    per_block = rows * LANES
    nblocks = max(1, -(-n // per_block))
    # Bucket the grid size to the next power of two: zero padding deposits
    # nothing, so results are bit-identical, and distinct input sizes share
    # compiled kernels (remote TPU compiles are expensive here).
    nblocks = 1 << (nblocks - 1).bit_length()
    pad = nblocks * per_block - n
    if pad:
        hi = jnp.pad(hi, (0, pad))  # +0.0 bits: deposits nothing
        lo = jnp.pad(lo, (0, pad))
    hi = hi.reshape(-1, LANES)
    lo = lo.reshape(-1, LANES)

    limbs_lanes, spec_lanes = pl.pallas_call(
        functools.partial(_sum_kernel, rows=rows),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L_SUM, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L_SUM, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L_SUM * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )(hi, lo)

    # Exact lane merge (int64 at XLA level) + renormalize back to int32.
    limbs = jnp.sum(limbs_lanes.astype(jnp.int64), axis=-1)
    special = jnp.sum(spec_lanes[0:3, :].astype(jnp.int64), axis=-1)
    return Superacc(
        limbs=to_int32_limbs(limbs),
        special=special.astype(jnp.int32),
        fmt=SUM_FORMAT,
    )


def _sum_round_tail(acc, spec, dacc):
    """Final-step epilogue: phase+lane merge and correctly-rounded
    conversion entirely in-kernel.  Every lane of dacc receives the
    lane-merged total (broadcast), so round_lanes_acc's per-lane result is
    the final answer in every lane."""
    from .round_in_kernel import round_lanes_acc

    for j in range(L_SUM):
        row = jnp.sum(acc[8 * j:8 * j + 8, :], axis=0, keepdims=True,
                      dtype=_I)
        tot = jnp.sum(row, axis=1, keepdims=True, dtype=_I)
        dacc[j:j + 1, :] = jnp.broadcast_to(tot, (1, LANES))
    sp = spec[0:3, :]
    sp_tot = jnp.sum(sp, axis=1, keepdims=True, dtype=_I)
    sp_b = jnp.broadcast_to(sp_tot, (3, LANES))
    return round_lanes_acc(dacc, sp_b, L_SUM, SUM_FORMAT.offset_bits)


def _sum_bits_kernel(hi_ref, lo_ref, bits_out, acc, spec, dacc, *, rows):
    i = pl.program_id(0)
    group = rows // 8

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    q, pieces, bvalid, special, his = _decode_sum_fast(
        hi_ref[...], lo_ref[...])
    _sum_deposit(acc, q, pieces, bvalid, group)

    any_special = jnp.max(jnp.where(special, _I(1), _I(0)))

    @pl.when(any_special > 0)
    def _():
        frac_nz = jnp.logical_or(
            (his & _I(0xFFFFF)) != 0, lo_ref[...] != 0)
        is_nan = jnp.logical_and(special, frac_nz)
        is_inf = jnp.logical_and(special, jnp.logical_not(frac_nz))
        neg = his < 0
        spec[0:1, :] += jnp.sum(
            jnp.where(is_nan, _I(1), _I(0)), axis=0, keepdims=True, dtype=_I)
        spec[1:2, :] += jnp.sum(
            jnp.where(jnp.logical_and(is_inf, jnp.logical_not(neg)),
                      _I(1), _I(0)), axis=0, keepdims=True, dtype=_I)
        spec[2:3, :] += jnp.sum(
            jnp.where(jnp.logical_and(is_inf, neg), _I(1), _I(0)),
            axis=0, keepdims=True, dtype=_I)

    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        _renorm8(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _renorm8(acc)
        hi32, lo32 = _sum_round_tail(acc, spec, dacc)
        bits_out[0:1, :] = hi32
        bits_out[1:2, :] = lo32


@functools.partial(jax.jit, static_argnames=("rows",))
def exsum_bits_pallas(hi, lo, rows: int = 512):
    """Fully fused exact sum: deposits, merges, AND the correctly-rounded
    conversion run in one kernel -- only 2x4 bytes leave the chip.  Returns
    uint64 bits (scalar).  Bit-identical to exsum_pallas + XLA rounding
    (same exact value, same rounding algorithm)."""
    assert rows % 8 == 0 and rows * RENORM_EVERY <= MAX_ROWS_X_RENORM
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    n = hi.shape[0]
    per_block = rows * LANES
    nblocks = max(1, -(-n // per_block))
    nblocks = 1 << (nblocks - 1).bit_length()
    pad = nblocks * per_block - n
    if pad:
        hi = jnp.pad(hi, (0, pad))
        lo = jnp.pad(lo, (0, pad))
    hi = hi.reshape(-1, LANES)
    lo = lo.reshape(-1, LANES)

    out = pl.pallas_call(
        functools.partial(_sum_bits_kernel, rows=rows),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((L_SUM * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((L_SUM, LANES), jnp.int32),
        ],
    )(hi, lo)
    return (out[0, 0].astype(jnp.uint64) << jnp.uint64(32)) | out[
        1, 0].astype(jnp.uint64)
