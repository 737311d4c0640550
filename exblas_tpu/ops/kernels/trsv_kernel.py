"""Pallas TPU kernel for ExTRSV: left-looking blocked substitution with an
in-kernel sequential diagonal solve.

The reference solves TRSV as a wavefront of workgroups synchronized through a
global spin counter (reference ExTRSV.lnn.Superacc.cl:192-218 sync protocol,
:261-347 main kernel).  On TPU the grid is sequential by construction, so the
wavefront becomes a *left-looking* sweep with no synchronization at all:

* grid (kb, kc), kc fastest; row-block kb's exact accumulators (one
  216-limb superaccumulator per row, phase-split across 8 sublanes like the
  ExGEMV kernel) are (re)built in VMEM scratch:
  - kc == 0: reset + exact deposit of b;
  - kc <  kb: exact deposit of the products -T[rows kb, cols kc] * x[kc]
    (a GEMV chunk, identical math to gemv_kernel);
  - kc == kb: the diagonal solve -- 128 sequential steps, each one VPU-wide:
    canonicalize/round *all* 128 row accumulators (lanes) at once, select row
    i, divide by t_ii (correctly-rounded u32 restoring division), record x_i,
    and deposit the exact 106-bit products -t_ji * x_i for j > i.
* solved x blocks persist in VMEM scratch across grid steps and feed later
  chunks; x is also written to the output.

Because every deposit is an exact integer and merging is integer addition,
the result is bit-identical to the XLA reference path (ops/extrsv.py) for any
block decomposition -- that path remains the spec oracle; this kernel is the
performance implementation (n=8192 in well under a second vs ~32 s for the
sequential XLA sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import deposit as dep
from ...core.f64ops import f64_div_pair
from .round_in_kernel import round_lanes_acc
from ...core.types import DOT_FORMAT, L_DOT, LIMB_BITS

B = 128  # block size == VPU lanes
L = L_DOT
_I = jnp.int32
_U = jnp.uint32
_Z = _np.int32(0)

RENORM_EVERY = 4  # chunk renorm cadence: 4 * (B/8) * 3 = 192 << 2^11 slack


def _i(x):
    return jax.lax.bitcast_convert_type(x, _I)


def _u(x):
    return jax.lax.bitcast_convert_type(x, _U)


def _msb20(d):
    """msb index of int32 d in [1, 2^20) via the exact f32-exponent trick."""
    f = jnp.maximum(d, _I(1)).astype(jnp.float32)
    return (
        (jax.lax.bitcast_convert_type(f, _U) >> _U(23)).astype(_I) - _I(127)
    )


def _lsb20(d):
    return _msb20(d & (-d))


def _clip(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, _I(lo)), _I(hi))


def _renorm8(acc_ref):
    """Carry pass on the (L*8, 128) phase layout: carries move 8 rows up.

    The TOP limb rows are kept whole (their carries stay in place, as in
    the reference's Normalize, superaccumulator.cpp:138-162, and the MXU
    GEMM's _renorm_rel3 fix): a lane with a negative running total
    carries a persistent -1 that climbs one limb per renorm pass; after
    >= L passes it reaches the top row, where stripping it would corrupt
    the value by +2^(20*L).  Keeping the top row whole is
    value-preserving for any carry state.
    """
    a = acc_ref[...]
    c = a >> LIMB_BITS
    low = a - (c << LIMB_BITS)
    row = jax.lax.broadcasted_iota(_I, a.shape, 0)
    low = jnp.where(row >= _I(a.shape[0] - 8), a, low)  # keep top limb whole
    c_up = pltpu.roll(c, shift=jnp.int32(8), axis=0)
    c_up = jnp.where(row < 8, _I(0), c_up)
    acc_ref[...] = low + c_up


def _lane_bcast(v, lane, i):
    """Broadcast lane ``i`` of a (1, 128) u32 row to all lanes."""
    sel = jnp.where(lane == i, _i(v), _I(0))
    s = jnp.sum(sel, axis=1, keepdims=True, dtype=_I)
    return _u(jnp.broadcast_to(s, (1, B)))


def _deposit_chunk(acc, spec, a_hi, a_lo, x_hi, x_lo):
    """Exact product deposits of a (B, B) block into the phase accumulator:
    ExDOT's digit-plane decode + windowed deposit (reduction index in
    sublanes, output rows in lanes, 8 k-phase sub-accumulators per limb)."""
    from .dot_kernel import _dot_block

    _dot_block(a_hi, a_lo, x_hi, x_lo, acc, spec, B)


def _trsv_kernel(t_hi_ref, t_lo_ref, b_hi_ref, b_lo_ref,
                 x_hi_out, x_lo_out,
                 acc, spec, dacc, xsub_hi, xsub_lo, tdg_hi, tdg_lo,
                 *, unit: bool):
    kb = pl.program_id(0)
    kc = pl.program_id(1)
    w = xsub_hi.shape[1]  # x staging width: nblocks padded to lane tiles
    lane = jax.lax.broadcasted_iota(_I, (1, B), 1)
    lane_w = jax.lax.broadcasted_iota(_I, (1, w), 1)
    lane_bw = jax.lax.broadcasted_iota(_I, (B, w), 1)

    @pl.when(kc == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)
        # Seed the row accumulators with b (exact sum-term deposit).
        t = dep.sum_terms(b_hi_ref[pl.ds(kb, 1), :],
                          b_lo_ref[pl.ds(kb, 1), :],
                          DOT_FORMAT.offset_bits)
        q = t["q"]
        big = _I(L + 8)
        qmin = jnp.min(jnp.where(t["valid"], q, big))
        qmax = jnp.max(jnp.where(t["valid"], q, _I(-1)))
        pieces = t["pieces"]

        def body(w, carry):
            d = w - q
            contrib = jnp.where(d == 0, pieces[0], _I(0))
            contrib = jnp.where(d == 1, pieces[1], contrib)
            contrib = jnp.where(d == 2, pieces[2], contrib)
            contrib = jnp.where(d == 3, pieces[3], contrib)
            acc[pl.ds(w * 8, 1), :] += contrib
            return carry

        jax.lax.fori_loop(qmin, qmax + 4, body, _I(0))
        spec[0:1, :] += t["nan"]
        spec[1:2, :] += t["pinf"]
        spec[2:3, :] += t["ninf"]

    @pl.when(kc < kb)
    def _():
        # GEMV chunk: deposit -T[rows kb, cols kc] * x[kc].  The block is
        # T[(kb), (kc)] read row-major and transposed in-register so the
        # reduction index (solved column) lands in sublanes and the output
        # row in lanes -- no 8-byte/element T^T copy in HBM (at n=32768
        # that copy alone is 8 GB and OOMs the chip).
        xs_h = _u(jnp.broadcast_to(jnp.sum(
            jnp.where(lane_bw == kc, _i(xsub_hi[...]), _I(0)),
            axis=1, keepdims=True, dtype=_I), (B, B)))
        xs_l = _u(jnp.broadcast_to(jnp.sum(
            jnp.where(lane_bw == kc, _i(xsub_lo[...]), _I(0)),
            axis=1, keepdims=True, dtype=_I), (B, B)))
        a_hi = jnp.transpose(t_hi_ref[...]) ^ _U(0x80000000)
        a_lo = jnp.transpose(t_lo_ref[...])
        _deposit_chunk(acc, spec, a_hi, a_lo, xs_h, xs_l)

        @pl.when(jnp.bitwise_and(kc + 1, _I(RENORM_EVERY - 1)) == 0)
        def _():
            _renorm8(acc)

    @pl.when(kc == kb)
    def _():
        _renorm8(acc)

        # Stage the transposed diagonal block once: the 128-step solve
        # below slices it by solved column (sublane i = column base+i).
        tdg_hi[...] = jnp.transpose(t_hi_ref[...])
        tdg_lo[...] = jnp.transpose(t_lo_ref[...])

        # Merge the 8 k-phases into the (L, 128) solve accumulator,
        # tracking the occupied limb range: the per-step rounding then
        # canonicalizes only the ~10 live limbs instead of all 216.
        def merge(j, st):
            jlo, jhi = st
            row = jnp.sum(
                acc[pl.ds(j * 8, 8), :], axis=0, keepdims=True, dtype=_I)
            dacc[pl.ds(j, 1), :] = row
            nz = jnp.max(jnp.where(row != 0, _I(1), _I(0)))
            jlo = jnp.where(jnp.logical_and(nz > 0, jlo > j), j, jlo)
            jhi = jnp.where(nz > 0, j, jhi)
            return jlo, jhi

        jlo0, jhi0 = jax.lax.fori_loop(
            _I(0), _I(L), merge, (_I(L + 99), _I(-1)))

        def step(i, st):
            xb_hi, xb_lo, jlo, jhi = st
            num_hi, num_lo = round_lanes_acc(dacc, spec, L,
                                             DOT_FORMAT.offset_bits,
                                             j_lo=jlo, j_hi=jhi)
            num_hi = _lane_bcast(num_hi, lane, i)
            num_lo = _lane_bcast(num_lo, lane, i)
            tcol_hi = tdg_hi[pl.ds(i, 1), :]  # T[base+j, base+i], j lanes
            tcol_lo = tdg_lo[pl.ds(i, 1), :]
            if unit:
                xq_hi, xq_lo = num_hi, num_lo
            else:
                den_hi = _lane_bcast(tcol_hi, lane, i)
                den_lo = _lane_bcast(tcol_lo, lane, i)
                xq_hi, xq_lo = f64_div_pair(num_hi, num_lo, den_hi, den_lo)
            xb_hi = jnp.where(lane == i, xq_hi, xb_hi)
            xb_lo = jnp.where(lane == i, xq_lo, xb_lo)
            # Publish x_i into the cross-block scratch (row i, lane kb).
            xq_hi_w = jnp.broadcast_to(xq_hi[:, 0:1], (1, w))
            xq_lo_w = jnp.broadcast_to(xq_lo[:, 0:1], (1, w))
            xsub_hi[pl.ds(i, 1), :] = jnp.where(
                lane_w == kb, xq_hi_w, xsub_hi[pl.ds(i, 1), :])
            xsub_lo[pl.ds(i, 1), :] = jnp.where(
                lane_w == kb, xq_lo_w, xsub_lo[pl.ds(i, 1), :])

            # Deposit -t_ji * x_i for j > i (exact 106-bit products).
            m = lane > i
            a_hi = jnp.where(m, tcol_hi ^ _U(0x80000000), _U(0))
            a_lo = jnp.where(m, tcol_lo, _U(0))
            t = dep.product_terms(a_hi, a_lo, xq_hi, xq_lo,
                                  DOT_FORMAT.offset_bits)
            q, r, s = t["q"], t["r"], t["s"]
            big = _I(L + 8)
            for k, cls in enumerate(t["classes"]):
                pbit = r + _I(14 * k)
                dq = pbit // _I(LIMB_BITS)
                rr = pbit - dq * _I(LIMB_BITS)
                p0, p1, p2 = dep.split_value30(cls.astype(_U), rr)
                pieces = tuple(p.astype(_I) * s for p in (p0, p1, p2))
                qk = q + dq
                qmin = jnp.min(jnp.where(t["valid"], qk, big))
                qmax = jnp.max(jnp.where(t["valid"], qk, _I(-1)))
                jlo = jnp.minimum(jlo, qmin)
                jhi = jnp.maximum(
                    jhi, jnp.where(qmax >= 0, qmax + _I(2), _I(-1)))

                def body(w, carry, qk=qk, pieces=pieces):
                    d = w - qk
                    contrib = jnp.where(d == 0, pieces[0], _I(0))
                    contrib = jnp.where(d == 1, pieces[1], contrib)
                    contrib = jnp.where(d == 2, pieces[2], contrib)
                    dacc[pl.ds(w, 1), :] += contrib
                    return carry

                jax.lax.fori_loop(qmin, qmax + 3, body, _I(0))
            spec[0:1, :] += t["nan"]
            spec[1:2, :] += t["pinf"]
            spec[2:3, :] += t["ninf"]
            return xb_hi, xb_lo, jlo, jhi

        xb_hi, xb_lo, _, _ = jax.lax.fori_loop(
            _I(0), _I(B), step,
            (jnp.zeros((1, B), _U), jnp.zeros((1, B), _U), jlo0, jhi0))
        x_hi_out[pl.ds(kb, 1), :] = xb_hi
        x_lo_out[pl.ds(kb, 1), :] = xb_lo


@functools.partial(jax.jit, static_argnames=("unit",))
def trsv_lower_x_pallas(t_hi, t_lo, b_hi, b_lo, unit: bool = False):
    """Solve lower-triangular T x = b on TPU; returns x bits.

    t: (n, n) bit pair of T (row-major) with n a multiple of 128 and the
    padded diagonal set to 1.0; b: (nblocks, 128) bit pair.  Blocks are
    transposed in-kernel (sublane/lane swap), so no transposed copy of T
    is ever materialized in HBM.
    Returns (x_hi, x_lo) uint32 of shape (nblocks, 128).

    Solved x blocks are staged in a (128, W) VMEM scratch, one lane per
    block (W = nblocks padded to lane tiles), so n is VMEM-bound only.
    """
    n = t_hi.shape[0]
    assert n % B == 0
    nblocks = n // B
    w = -(-nblocks // B) * B

    grid = (nblocks, nblocks)
    return pl.pallas_call(
        functools.partial(_trsv_kernel, unit=unit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, B), lambda kb, kc: (kb, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda kb, kc: (kb, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, B), lambda kb, kc: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, B), lambda kb, kc: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nblocks, B), lambda kb, kc: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblocks, B), lambda kb, kc: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, B), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, B), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L * 8, B), jnp.int32),   # phase accumulator
            pltpu.VMEM((8, B), jnp.int32),       # special counters
            pltpu.VMEM((L, B), jnp.int32),       # solve accumulator
            pltpu.VMEM((B, w), jnp.uint32),      # solved x, hi words
            pltpu.VMEM((B, w), jnp.uint32),      # solved x, lo words
            pltpu.VMEM((B, B), jnp.uint32),      # transposed diag, hi
            pltpu.VMEM((B, B), jnp.uint32),      # transposed diag, lo
        ],
    )(t_hi, t_lo, b_hi, b_lo)
