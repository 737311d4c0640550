"""MXU fast path for ExSUM: anchored byte-plane sums in the flat layout.

The VPU sum kernel (sum_kernel.py) is decode-bound at ~55 integer ops per
element (~300 GB/s algorithmic roofline on this chip -- see RESULTS.md).
This path cuts the VPU work to the ~35-ops/element byte-plane slice of
gemv_mxu and moves the accumulation itself onto the MXU:

* the flat vector is reshaped to (R, 128) -- TILE-NATIVE for a flat f64
  bit-pair stream, so the reshape is free (the (m, k) matrix reshape the
  GEMV formulation would need costs a physical re-tiling copy, measured
  ~0.15 ms at n=2^24);
* every element is shifted to a W = 32*nwa-bit fixed-point integer
  relative to ONE GLOBAL anchor ``E`` and two's-complemented
  (`_slice_byte_words`, shared with gemv_mxu);
* ONE int8 MXU matmul per 32-bit word contracts the SUBLANE axis with a
  constant byte-plane selection matrix: ``macc[p, lane] += sum_r
  (byte_p(r, lane) - 128)`` -- the whole reduction rides the MXU, and
  ``|macc| <= 128 * R < 2^31`` means the int32 plane accumulators absorb
  the ENTIRE sum with no spills, no renorms, and no limb traffic for any
  n < 2^31;
* sign handling: per-lane negative counts (value = unsigned words
  - 2^W * neg), accumulated on the VPU;
* the epilogue is O(12) XLA scalar ops: lane-sum each plane into int64,
  add the closed-form excess-128 compensation (a trace-time constant),
  subtract the sign term, build ~9 limbs, canonicalize, and correctly
  round once with the relative-exponent rounding of round_digits.

Coverage contract: every element's bits must lie in [E+1-W, E] -- checked
PER ELEMENT inside the kernel (`bad` output), which lets the dispatcher
(ops/exsum.py) use a cheap *sampled* anchor estimate on the hot path
instead of an exact analysis pass: a miss costs a retry at the exact
anchor, never correctness.  NaN/Inf also flag; uncovered spreads fall
back to the exact VPU kernel.

Reference counterpart: the reference's ExSUM kernels are grid-stride
FPE+superaccumulator loops (ExSUM.FPE.cl:230-388) -- bandwidth-bound on
GPUs.  On TPU that formulation is VPU-decode-bound; the MXU byte-plane
scheme (same design family as gemv_mxu.py/gemm_mxu.py, no reference
analog) restores memory-bound behavior for covered data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import LIMB_BITS
from .gemv_mxu import LANES, _slice_byte_words

_I = jnp.int32
_U = jnp.uint32
_I64 = jnp.int64
_Z = _np.int32(0)

BLOCK_ROWS = 512        # (512, 128) uint32 blocks = 256 KB per input stream
# |macc| <= 128 * R_pad must stay < 2^31 (int32 plane sums): R_pad < 2^24,
# i.e. n <= 2^30 elements (an 8 GB input; larger routes to the VPU kernel).
MAX_N_MXU = 1 << 30


def sum_pad_rows(n: int) -> int:
    """Rows of the padded (R_pad, 128) layout for a flat length-n sum."""
    r = -(-n // LANES)
    return -(-r // BLOCK_ROWS) * BLOCK_ROWS


# ---------------------------------------------------------------------------
# Anchor estimation
# ---------------------------------------------------------------------------

_SAMPLE_CHUNK = 8192     # elements per sampled chunk (32 KB of hi words)
_SAMPLE_STRIDE = 8       # read every 8th chunk (~0.5 B/element)
_ANCHOR_SLACK = 8        # bits: tolerate a slightly-missed maximum


def sample_anchor(hi):
    """Cheap (anchor, spread) estimate from ~1/8 of the hi words
    (contiguous 32 KB chunks, full DMA efficiency) plus the tail chunk.

    anchor: max sampled exponent bumped by ``_ANCHOR_SLACK`` bits so a
    maximum a few binades above the sampled one is still covered.  SOUND
    BY CONSTRUCTION: any element the estimate does not cover is flagged
    by the in-kernel check and the dispatcher falls back to the exact
    anchor -- an underestimate can cost time, never correctness.  A
    sampled NaN/Inf (expf 0x7FF) drives the anchor above every finite
    element, forcing the same fallback.

    spread: anchor minus the smallest sampled significand-lsb exponent
    bound.  A SAMPLED spread can only UNDERestimate the true spread, so
    ``spread > window`` soundly proves the MXU path cannot cover the
    data and the dispatcher goes straight to the VPU kernel with no
    wasted MXU pass (sampled specials likewise force spread past any
    window)."""
    n = hi.shape[0]
    nch = n // _SAMPLE_CHUNK
    if nch >= 2:
        body = hi[: nch * _SAMPLE_CHUNK].reshape(
            nch, _SAMPLE_CHUNK)[::_SAMPLE_STRIDE].reshape(-1)
        s = jnp.concatenate([body, hi[-_SAMPLE_CHUNK:]])
    else:
        s = hi
    return _anchor_spread(s)


def full_anchor(hi):
    """Exact (anchor, spread) in sample_anchor's convention — one full
    streaming reduce over the hi words.  For data without nonzero
    subnormals, routing on these values can never under-cover: the
    spread is then an exponent-field UPPER bound on the occupied bits of
    every element, so any tier whose window admits it passes the
    in-kernel per-element check by construction (specials still drive
    the anchor past every window -> VPU).  Nonzero subnormals (expf==0)
    are excluded from the lsb min, so exact-resolved routing can still
    flag in-kernel and pay the exact-anchor retry + VPU fallback — the
    in-kernel check backstops correctness either way.  Used by the
    dispatchers to resolve guard-band-ambiguous sampled spreads instead
    of paying a wasted full MXU pass on a tier miss."""
    return _anchor_spread(hi)


def _anchor_spread(s):
    expf = (jax.lax.bitcast_convert_type(s, _I) >> _I(20)) & _I(0x7FF)
    anchor = jnp.max(expf) - _I(1023) + _I(_ANCHOR_SLACK)
    # lsb bound from the exponent field alone.  expf == 0 entries
    # (zeros/subnormals) are excluded from the min: zeros carry no bits
    # and an excluded nonzero subnormal only makes the sampled spread
    # SMALLER than the true one, which is the sound direction (the
    # in-kernel check still catches it).  All-expf-0 samples (pure
    # subnormal/zero data) fit any window: anchor is then <= -1015 and
    # subnormal lsb is -1074, within the 96-bit window.
    lsb = jnp.min(jnp.where(expf >= _I(1), expf - _I(1075), _I(2000)))
    spread = jnp.where(lsb >= _I(2000), _I(61), anchor - lsb + _I(1))
    return anchor, spread


# A sampled spread this close below a tier boundary is AMBIGUOUS: the
# true spread may sit just past the boundary, and routing on it would
# buy a guaranteed in-kernel miss + full-pass retry.  The dispatchers
# resolve ambiguity with one full_anchor pass (4 bytes/element — the hi
# words) — far cheaper than the wasted kernel pass, and the exact spread
# then routes optimally (observed: ill-cond at n=2^24 sampled 126 bits
# vs true 134 -> 128-bit tier miss -> every call re-ran at the exact
# anchor, landing the MXU path BELOW the VPU fallback).
_GUARD_BITS = 16


def resolve_anchor(hi, e_est, spread_est, boundaries):
    """Return (anchor, spread) for routing: the sampled pair, or the
    exact pair when ``spread_est`` lies in a guard band just below any
    of the (python int) tier ``boundaries``."""
    amb = False
    for b in boundaries:
        amb = jnp.logical_or(
            amb, jnp.logical_and(spread_est > _I(b - _GUARD_BITS),
                                 spread_est <= _I(b)))
    return jax.lax.cond(
        amb, lambda _: full_anchor(hi),
        lambda _: (e_est, spread_est), None)


def exact_anchor(hi):
    """Exact anchor: max exponent field over every element (one streaming
    XLA reduction; the rare path after a sampled-anchor miss).  Specials
    drive the anchor to 1024+, flagging every finite element and routing
    to the VPU fallback -- exactly the wanted semantics."""
    expf = (jax.lax.bitcast_convert_type(hi, _I) >> _I(20)) & _I(0x7FF)
    return jnp.max(expf) - _I(1023)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _sum_flat_kernel(hi_ref, lo_ref, e_ref, sel_ref,
                     macc_out, nacc_out, flag_out, *, nwa):
    """Grid-accumulating kernel: all three outputs map to the same blocks
    every step, so they live in VMEM for the whole grid and hold the
    final state after the last step (init at step 0)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        macc_out[...] = jnp.zeros_like(macc_out)
        nacc_out[...] = jnp.zeros_like(nacc_out)
        flag_out[...] = jnp.zeros_like(flag_out)

    # (1, 128) anchor row: broadcasts along sublanes only (Mosaic cannot
    # broadcast a (1, 1) vector in both sublanes and lanes at once)
    tc, negm, bad = _slice_byte_words(
        hi_ref[...], lo_ref[...], e_ref[0:1, :], nwa, check=True)

    # One int8 matmul per word: sel rows 0..3 pick byte plane p of the
    # sublane-interleaved bitcast (row 4r+b = byte b of row r), rows 4..7
    # are zero (tile-aligned output adds).  int32 accumulation is exact.
    for w in range(nwa):
        planes = jax.lax.dot_general(
            sel_ref[...], pltpu.bitcast(tc[w], jnp.int8),
            (((1,), (0,)), ((), ())), preferred_element_type=_I)
        macc_out[pl.ds(8 * w, 8), :] += planes

    b8 = BLOCK_ROWS // 8
    nacc_out[...] += jnp.sum(
        negm.astype(_I).reshape(b8, 8, LANES), axis=0, dtype=_I)
    flag_out[...] |= jnp.max(
        bad.astype(_I).reshape(b8, 8, LANES), axis=0)


def _sum_epilogue_terms(hi2, lo2, e_anchor, nwa: int):
    """Shared kernel + epilogue: the sum as a static-position term sum.

    Returns (vals int64 (T,), bits_pos tuple, bad): the exact sum is
    sum_t vals[t] * 2^(bits_pos[t]) in the relative frame whose bit p
    has exponent p + e_anchor + 1 - 32*nwa.  ``bad`` True when any
    element was not covered by the anchor window (or was NaN/Inf).
    """
    r_pad, lanes = hi2.shape
    assert lanes == LANES and r_pad % BLOCK_ROWS == 0
    assert r_pad * LANES <= MAX_N_MXU
    w_a = 32 * nwa

    # byte-plane selection matrix: sel[p, 4r+b] = (p == b), p < 4
    rr = _np.arange(8)[:, None]
    cc = _np.arange(4 * BLOCK_ROWS)[None, :]
    sel = jnp.asarray(((cc & 3) == rr) & (rr < 4), jnp.int8)
    e_sub = jnp.broadcast_to(e_anchor.reshape(1, 1), (8, LANES)).astype(_I)

    macc, nacc, flag = pl.pallas_call(
        functools.partial(_sum_flat_kernel, nwa=nwa),
        grid=(r_pad // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * BLOCK_ROWS), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8 * nwa, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * nwa, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        ),
    )(hi2, lo2, e_sub, sel)

    # ---- epilogue: O(4*nwa) exact int64 scalar work ----
    # plane p of word w holds sum_elems (byte - 128) at bit 32w + 8p;
    # the -128 bias applies to every (row, lane) slot incl. zero padding:
    # compensation = 128 * R_pad * 128 per real plane (trace-time const).
    tp = jnp.sum(macc.astype(_I64), axis=1)            # (8*nwa,)
    negtot = jnp.sum(nacc.astype(_I64))
    comp = _I64(128 * r_pad * LANES)

    # value * 2^(w_a - 1 - E) = sum_planes (tp + comp) 2^(32w+8p)
    #                           - 2^w_a * negtot
    # (macc has 8 rows per word from the tile-aligned matmul; only rows
    # 0..3 are real byte planes -- the sel matrix zeroes rows 4..7)
    planes = tp.reshape(nwa, 8)[:, :4].reshape(4 * nwa)
    vals = jnp.concatenate([planes + comp, -negtot[None]])
    bits_pos = tuple(32 * w + 8 * p for w in range(nwa)
                     for p in range(4)) + (w_a,)
    return vals, bits_pos, jnp.max(flag) > 0   # flag is per (phase, lane)


def _sum_rel_limbs(hi2, lo2, e_anchor, nwa: int):
    """Exact relative limbs of the sum (int64 (n_limbs,), bad): rel bit p
    has exponent p + e_anchor + 1 - 32*nwa.  Used by the Superacc
    (absolute wire format) path; the bits path rounds the terms directly
    in one Pallas launch (round_scaled_terms)."""
    vals, bits_pos, bad = _sum_epilogue_terms(hi2, lo2, e_anchor, nwa)
    w_a = 32 * nwa
    n_limbs = (w_a + 64) // LIMB_BITS + 2
    limbs = jnp.zeros((n_limbs,), _I64)
    for t, bit in enumerate(bits_pos):
        v = vals[t]                           # |v| < 2^40
        q, r = divmod(bit, LIMB_BITS)
        # v * 2^r split at bit 40: low chunk at limb q, high at q+2
        limbs = limbs.at[q].add((v << _I64(r)) & _I64((1 << 40) - 1))
        limbs = limbs.at[q + 2].add(v >> _I64(40 - r))
    return limbs, bad


@functools.partial(jax.jit, static_argnames=("nwa",))
def sum_bits_mxu(hi2, lo2, e_anchor, nwa: int = 3):
    """Correctly rounded exact sum of the (R_pad, 128) bit-pair layout.

    e_anchor: int32 scalar anchor (upper bound on covered elements' msb
    exponents).  Returns ``(bits, bad)``: uint64 result bits and a bool
    that is True when ANY element was not covered by the anchor window
    (or was NaN/Inf) -- the bits must then be discarded by the caller.
    Exactness: every covered element is represented exactly in the
    anchored fixed-point window, plane sums are exact int32, and the
    epilogue is exact int64 -> one correct rounding (round_scaled_terms:
    the limb build + canonicalize + round tail runs in ONE Pallas launch
    instead of ~100 tiny XLA ops).
    """
    from .round_in_kernel import round_scaled_terms

    vals, bits_pos, bad = _sum_epilogue_terms(hi2, lo2, e_anchor, nwa)
    n_limbs = (32 * nwa + 64) // LIMB_BITS + 2
    hi, lo = round_scaled_terms(vals, bits_pos,
                                e_anchor + _I(1) - _I(32 * nwa), n_limbs)
    bits = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return bits, bad


@functools.partial(jax.jit, static_argnames=("nwa",))
def sum_acc_limbs_mxu(hi2, lo2, e_anchor, nwa: int = 3):
    """Exact sum as ABSOLUTE SUM_FORMAT limbs (the distributed wire
    format): returns (limbs int64 (L_SUM,), bad).

    The relative digits are shifted into the absolute frame (rel bit 0 =
    absolute bit p0 = e_anchor + 1 - 32*nwa + offset); every covered
    element is a multiple of 2^-1074 = absolute bit 0, so the shift is
    exact (see core.rounding.rel_limbs_to_abs_limbs).
    """
    from ...core.rounding import rel_limbs_to_abs_limbs
    from ...core.types import SUM_FORMAT

    rel, bad = _sum_rel_limbs(hi2, lo2, e_anchor, nwa)
    p0 = e_anchor + _I(1) - _I(32 * nwa) + _I(SUM_FORMAT.offset_bits)
    return rel_limbs_to_abs_limbs(rel, p0, SUM_FORMAT), bad
