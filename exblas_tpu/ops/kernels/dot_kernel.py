"""Pallas TPU kernel for ExDOT: exact dot-product limb accumulation.

Replaces the reference's TwoProductFMA + FPE tail-insertion scheme
(reference ExDOT.FPE.cl:226-270) with an exact integer path: each product
``a[i]*b[i]`` is formed as seven 30-bit "shift classes" from 14-bit mantissa
pieces (an exact 106-bit schoolbook product -- the TPU has no fp64 FMA at
all).  Each class is then shifted ONCE by the
per-element intra-limb offset r into a (lo, hi) word pair, from which
seven redundant 20-bit limb digit planes are gathered with purely static
shifts, so one windowed pass over the block's distinct base limbs deposits
everything -- no per-class scatter loops, no per-plane variable shifts.

The accumulator covers the full product range down to 2^-2148, so products
that underflow double precision are kept exactly -- stronger than the
reference (whose TwoProdFMA residual silently underflows).

Deposits use the 8-phase layout (limb j in rows 8j..8j+8): every
accumulator access is an aligned (8, 128) add.  NaN/Inf are counted in a
side pass that runs only when the block actually contains specials.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import deposit as dep
from ...core.accumulator import to_int32_limbs
from ...core.types import L_DOT, DOT_FORMAT, LIMB_BITS, LIMB_MASK, Superacc
from .sum_kernel import LANES, _renorm8, _tree8

_I = jnp.int32
_U = jnp.uint32
_Z = _np.int32(0)

N_PLANES = 7  # (106 product bits + 19 offset bits) / 20 -> 7 digit planes

# Limb-row growth bound: each element contributes to a given limb row via
# exactly ONE of its 7 planes (the t with q + t = row), and a plane digit is
# a sum of <= 7 masked 20-bit parts (< 7 * 2^20, see _digit_planes), so
# growth <= RENORM_EVERY * (rows/8) * 7 * 2^20 must stay < 2^31 - 2^21
# => RENORM_EVERY * rows <= 2336.
RENORM_EVERY = 2
MAX_ROWS_X_RENORM = 640


def _mask_specials(hi, lo):
    """Decode one operand stream: (his, expf, mhi, mlo, special) with the
    mantissa of specials masked to zero (their flags are counted in a
    separate rare pass)."""
    his = jax.lax.bitcast_convert_type(hi, _I)
    expf = (his >> _I(20)) & _I(0x7FF)
    special = expf == _I(0x7FF)
    mhi = (his & _I(0xFFFFF)) | (jnp.minimum(expf, _I(1)) << _I(20))
    mhi = jnp.where(special, _I(0), mhi)
    mlo = jnp.where(special, _I(0), jax.lax.bitcast_convert_type(lo, _I))
    return his, expf, mhi, mlo, special


def _pieces14(mhi, mlo):
    """53-bit significand -> four 14-bit pieces (LSB first), int32."""
    p0 = mlo & _I(0x3FFF)
    p1 = (mlo >> _I(14)) & _I(0x3FFF)
    p2 = ((jax.lax.bitcast_convert_type(mlo, _U) >> _U(28)).astype(_I)
          | (mhi << _I(4))) & _I(0x3FFF)
    p3 = (mhi >> _I(10)) & _I(0x3FFF)
    return p0, p1, p2, p3


def _digit_planes(classes, r):
    """Combine the 7 shift classes into 7 unsigned redundant 20-bit digit
    planes of the product's bit image shifted left by r (r in [0, 20)).

    Two steps: (1) each class (< 2^30 at bit 14k of the product) is shifted
    by the per-element r ONCE into a (lo, hi) word pair -- cls * 2^r =
    lo + 2^32 * hi with lo at absolute bit 14k and hi at 14k + 32 (the only
    variable shifts, 3 ops per class); (2) plane j = bits [20j, 20j+20)
    gathers from those words with purely STATIC shifts -- no guards or
    selects (the previous per-(j,k) variable-shift scheme needed a wrap
    guard per pair; measured ~20% slower end to end).  Digits are redundant
    (plane j sums <= 7 masked 20-bit parts, < 2^23); carries resolve in the
    accumulator's renorm passes.  Exactness: sum_j plane_j * 2^20j equals
    sum_k cls_k * 2^(14k + r) exactly, so the accumulated value -- and
    hence the rounded result -- is bit-identical to any other exact
    decomposition.
    """
    ru = jax.lax.bitcast_convert_type(r, _U)
    rn = jax.lax.bitcast_convert_type(_I(20) - r, _U)
    m20 = _U(LIMB_MASK)
    cls_u = [jax.lax.bitcast_convert_type(c, _U) for c in classes]
    los = [c << ru for c in cls_u]                 # bits [14k, 14k+32)
    # cls >> (32 - r) with r in [0, 20): both shifts statically <= 31,
    # and r == 0 correctly yields 0
    his = [(c >> _U(12)) >> rn for c in cls_u]     # bits [14k+32, 14k+50)
    planes = []
    for j in range(N_PLANES):
        acc = None
        for k in range(N_PLANES):
            d = 20 * j - 14 * k
            if -20 < d < 32:                       # lo_k overlaps plane j
                part = (los[k] >> _U(d)) if d >= 0 else (los[k] << _U(-d))
                part = part & m20
                acc = part if acc is None else acc + part
            d2 = d - 32
            if -20 < d2 < 18:                      # hi_k overlaps plane j
                part = (his[k] >> _U(d2)) if d2 >= 0 else (his[k] << _U(-d2))
                part = part & m20
                acc = part if acc is None else acc + part
        planes.append(jax.lax.bitcast_convert_type(acc, _I))
    return planes


def _dot_decode(hi_a, lo_a, hi_b, lo_b):
    """Full product decomposition: (q, planes, bvalid, any_special_flag).

    q: base limb index of the product.  planes: 7 signed int32 digit
    planes (plane j deposits at limb q + j).  Zeros/specials produce zero
    planes; bvalid excludes them from window bounds.
    """
    his_a, expf_a, mhi_a, mlo_a, spec_a = _mask_specials(hi_a, lo_a)
    his_b, expf_b, mhi_b, mlo_b, spec_b = _mask_specials(hi_b, lo_b)

    a = _pieces14(mhi_a, mlo_a)
    b = _pieces14(mhi_b, mlo_b)
    classes = []
    for k in range(N_PLANES):
        acc = None
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                term = a[i] * b[j]  # < 2^28
                acc = term if acc is None else acc + term
        classes.append(acc)  # < 2^30

    p = (jnp.maximum(expf_a, _I(1)) + jnp.maximum(expf_b, _I(1))
         + _I(DOT_FORMAT.offset_bits - 2 * 1075))
    q = p // _I(LIMB_BITS)
    r = p - q * _I(LIMB_BITS)

    planes_u = _digit_planes(classes, r)
    m = (his_a ^ his_b) >> _I(31)
    planes = tuple((x ^ m) - m for x in planes_u)

    nz_a = (mhi_a | mlo_a) != 0
    nz_b = (mhi_b | mlo_b) != 0
    bvalid = jnp.logical_and(nz_a, nz_b)
    special = jnp.logical_or(spec_a, spec_b)
    # zero * nonzero products: planes are zero already (classes are zero)
    return q, planes, bvalid, special


def _count_specials(spec, hi_a, lo_a, hi_b, lo_b):
    """Rare path: per-lane NaN/+Inf/-Inf product counts for the block,
    matching dep.product_terms semantics exactly."""
    t = dep.product_terms(hi_a, lo_a, hi_b, lo_b,
                          DOT_FORMAT.offset_bits)
    spec[0:1, :] += jnp.sum(t["nan"], axis=0, keepdims=True, dtype=_I)
    spec[1:2, :] += jnp.sum(t["pinf"], axis=0, keepdims=True, dtype=_I)
    spec[2:3, :] += jnp.sum(t["ninf"], axis=0, keepdims=True, dtype=_I)


def _dot_deposit(acc, q, planes, bvalid, group):
    del group
    big = _I(L_DOT + 8)
    qmin = jnp.min(jnp.where(bvalid, q, big))
    qmax = jnp.max(jnp.where(bvalid, q, _I(-1)))

    # Fast path: all valid products share one base limb (common for
    # realistic exponent ranges) -- no per-plane selects; zero/special
    # products have all-zero planes, so including them at qmin is exact.
    @pl.when(qmin == qmax)
    def _():
        for t, plane in enumerate(planes):
            acc[pl.ds((qmin + _I(t)) * 8, 8), :] += _tree8(plane)

    @pl.when(qmin != qmax)
    def _():
        def body(v, carry):
            mask = q == v
            for t, plane in enumerate(planes):
                sel = jnp.where(mask, plane, _I(0))
                acc[pl.ds((v + _I(t)) * 8, 8), :] += _tree8(sel)
            return carry

        jax.lax.fori_loop(qmin, qmax + 1, body, _I(0))


def _dot_block(hi_a, lo_a, hi_b, lo_b, acc, spec, rows):
    """Decode + deposit one (rows, 128) block of products (arrays, not
    refs -- callers may pre-transform, e.g. ExTRSV negates one operand)."""
    group = rows // 8
    q, planes, bvalid, special = _dot_decode(hi_a, lo_a, hi_b, lo_b)
    _dot_deposit(acc, q, planes, bvalid, group)

    any_special = jnp.max(jnp.where(special, _I(1), _I(0)))

    @pl.when(any_special > 0)
    def _():
        _count_specials(spec, hi_a, lo_a, hi_b, lo_b)


def _dot_kernel(hi_a_ref, lo_a_ref, hi_b_ref, lo_b_ref,
                limb_out, spec_out, acc, spec, *, rows):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    _dot_block(hi_a_ref[...], lo_a_ref[...], hi_b_ref[...],
               lo_b_ref[...], acc, spec, rows)

    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        _renorm8(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _renorm8(acc)
        for j in range(L_DOT):
            limb_out[j:j + 1, :] = jnp.sum(
                acc[8 * j:8 * j + 8, :], axis=0, keepdims=True, dtype=_I)
        spec_out[...] = spec[...]


def _prep_blocks(hi_a, lo_a, hi_b, lo_b, rows):
    arrs = [x.reshape(-1) for x in (hi_a, lo_a, hi_b, lo_b)]
    n = arrs[0].shape[0]
    per_block = rows * LANES
    nblocks = max(1, -(-n // per_block))
    nblocks = 1 << (nblocks - 1).bit_length()  # shape bucketing
    pad = nblocks * per_block - n
    if pad:
        arrs = [jnp.pad(x, (0, pad)) for x in arrs]  # 0*0 deposits nothing
    return [x.reshape(-1, LANES) for x in arrs], nblocks


@functools.partial(jax.jit, static_argnames=("rows",))
def exdot_pallas(hi_a, lo_a, hi_b, lo_b, rows: int = 256) -> Superacc:
    """Exact dot product of doubles given as uint32 bit pairs -> Superacc."""
    assert rows % 8 == 0 and rows * RENORM_EVERY <= MAX_ROWS_X_RENORM
    arrs, nblocks = _prep_blocks(hi_a, lo_a, hi_b, lo_b, rows)

    limbs_lanes, spec_lanes = pl.pallas_call(
        functools.partial(_dot_kernel, rows=rows),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec((L_DOT, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L_DOT, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L_DOT * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )(*arrs)

    limbs = jnp.sum(limbs_lanes.astype(jnp.int64), axis=-1)
    special = jnp.sum(spec_lanes[0:3, :].astype(jnp.int64), axis=-1)
    return Superacc(
        limbs=to_int32_limbs(limbs),
        special=special.astype(jnp.int32),
        fmt=DOT_FORMAT,
    )


def _dot_round_tail(acc, spec, dacc):
    """Phase+lane merge and correctly-rounded conversion in-kernel."""
    from .round_in_kernel import round_lanes_acc

    for j in range(L_DOT):
        row = jnp.sum(acc[8 * j:8 * j + 8, :], axis=0, keepdims=True,
                      dtype=_I)
        tot = jnp.sum(row, axis=1, keepdims=True, dtype=_I)
        dacc[j:j + 1, :] = jnp.broadcast_to(tot, (1, LANES))
    sp_tot = jnp.sum(spec[0:3, :], axis=1, keepdims=True, dtype=_I)
    sp_b = jnp.broadcast_to(sp_tot, (3, LANES))
    return round_lanes_acc(dacc, sp_b, L_DOT, DOT_FORMAT.offset_bits)


def _dot_bits_kernel(hi_a_ref, lo_a_ref, hi_b_ref, lo_b_ref,
                     bits_out, acc, spec, dacc, *, rows):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    _dot_block(hi_a_ref[...], lo_a_ref[...], hi_b_ref[...],
               lo_b_ref[...], acc, spec, rows)

    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        _renorm8(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _renorm8(acc)
        hi32, lo32 = _dot_round_tail(acc, spec, dacc)
        bits_out[0:1, :] = hi32
        bits_out[1:2, :] = lo32


@functools.partial(jax.jit, static_argnames=("rows",))
def exdot_bits_pallas(hi_a, lo_a, hi_b, lo_b, rows: int = 256):
    """Fully fused exact dot: deposits, merges, and the correctly-rounded
    conversion in one kernel.  Returns uint64 bits (scalar)."""
    assert rows % 8 == 0 and rows * RENORM_EVERY <= MAX_ROWS_X_RENORM
    arrs, nblocks = _prep_blocks(hi_a, lo_a, hi_b, lo_b, rows)

    out = pl.pallas_call(
        functools.partial(_dot_bits_kernel, rows=rows),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, _Z),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((L_DOT * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((L_DOT, LANES), jnp.int32),
        ],
    )(*arrs)
    return (out[0, 0].astype(jnp.uint64) << jnp.uint64(32)) | out[
        1, 0].astype(jnp.uint64)
