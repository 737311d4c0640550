"""Pallas TPU kernel for ExGEMM: exact per-element dot products, rounded
on-device.

Re-design of the reference's tiled GEMM with a private superaccumulator per
work-item (ExGEMM.Superacc.cl:200-284).  Grid (m/8, n/128): each step owns an
8x128 output tile; an inner fori walks the 8 output rows, streaming the full
k extent through VMEM in 128-wide chunks.  For each chunk the A-row segment
is transposed to the sublane axis and broadcast, so products decompose
exactly like ExGEMV's (k in sublanes, outputs in lanes), depositing into a
(L_DOT*8, 128) phase-layout accumulator.  beta*C is deposited exactly
(106-bit products) and each output element is correctly rounded *inside*
the kernel (round_in_kernel), so only final bit pairs leave the chip.

This is the correctness-grade exact kernel (VPU-bound); the planned fast
path is an Ozaki-style bf16 slice decomposition on the MXU with exact
integer class sums (see DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import deposit as dep
from ...core.types import DOT_FORMAT, L_DOT, LIMB_BITS
from .gemv_kernel import _renorm8
from .round_in_kernel import round_phase_acc
from .sum_kernel import _tree8

LANES = 128
_I = jnp.int32
_Z = _np.int32(0)


def _deposit_products_phase(acc, t, group):
    """Deposit product_terms ``t`` (shape (group*8, 128)) into the
    phase-layout accumulator; element (kk, lane) goes to phase kk % 8."""
    q, r, s = t["q"], t["r"], t["s"]
    big = _I(L_DOT + 8)
    # NB: per-class tight windows (see gemv kernel note).
    for k, cls in enumerate(t["classes"]):
        pbit = r + _I(14 * k)
        dq = pbit // _I(LIMB_BITS)
        rr = pbit - dq * _I(LIMB_BITS)
        p0, p1, p2 = dep.split_value30(cls.astype(jnp.uint32), rr)
        pieces = tuple(p.astype(_I) * s for p in (p0, p1, p2))
        qk = q + dq
        qmin = jnp.min(jnp.where(t["valid"], qk, big))
        qmax = jnp.max(jnp.where(t["valid"], qk, _I(-1)))

        def body(j, carry, qk=qk, pieces=pieces):
            d = j - qk
            contrib = jnp.where(d == 0, pieces[0], _I(0))
            contrib = jnp.where(d == 1, pieces[1], contrib)
            contrib = jnp.where(d == 2, pieces[2], contrib)
            if group > 1:
                acc[pl.ds(j * 8, 8), :] += _tree8(contrib)
            else:
                acc[pl.ds(j * 8, contrib.shape[0]), :] += contrib
            return carry

        jax.lax.fori_loop(qmin, qmax + 3, body, _I(0))


def _spec_counts(t):
    return jnp.stack(
        [jnp.sum(t["nan"], axis=0, dtype=_I),
         jnp.sum(t["pinf"], axis=0, dtype=_I),
         jnp.sum(t["ninf"], axis=0, dtype=_I)]
    )  # (3, 128)


def _gemm_kernel(a_hi_ref, a_lo_ref, b_hi_ref, b_lo_ref,
                 c_hi_ref, c_lo_ref, bb_hi_ref, bb_lo_ref,
                 yhi_out, ylo_out, acc, spec, dig, *, k_pad, beta_mode):
    nchunks = k_pad // LANES

    def row_body(rr_, carry):
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

        def sel_row(block):
            # mask-select row rr_ (dynamic unaligned sublane loads are
            # unsupported by Mosaic)
            sel = jax.lax.broadcasted_iota(_I, block.shape, 0) == rr_
            picked = jnp.where(sel, block.astype(_I), _I(0))
            return jnp.sum(picked, axis=0, keepdims=True,
                           dtype=_I).astype(jnp.uint32)

        def chunk(g, c2):
            a_hi = sel_row(a_hi_ref[:, pl.ds(g * LANES, LANES)])  # (1,128)
            a_lo = sel_row(a_lo_ref[:, pl.ds(g * LANES, LANES)])
            za_hi = jnp.broadcast_to(a_hi.T, (LANES, LANES))
            za_lo = jnp.broadcast_to(a_lo.T, (LANES, LANES))
            b_hi = b_hi_ref[pl.ds(g * LANES, LANES), :]  # (128, 128)
            b_lo = b_lo_ref[pl.ds(g * LANES, LANES), :]
            t = dep.product_terms(za_hi, za_lo, b_hi, b_lo,
                                  DOT_FORMAT.offset_bits)
            _deposit_products_phase(acc, t, LANES // 8)
            spec[0:3, :] += _spec_counts(t)
            _renorm8(acc)
            return c2

        jax.lax.fori_loop(_I(0), _I(nchunks), chunk, _I(0))

        def c_row(ref):
            # dynamic unaligned sublane loads are unsupported: mask-select
            # row rr_ out of the full (8, 128) block
            rows = ref[...]
            sel = jax.lax.broadcasted_iota(_I, rows.shape, 0) == rr_
            return jnp.sum(jnp.where(sel, rows.astype(_I), _I(0)), axis=0,
                           keepdims=True, dtype=_I).astype(jnp.uint32)

        if beta_mode == "one":
            tc = dep.sum_terms(c_row(c_hi_ref), c_row(c_lo_ref),
                               DOT_FORMAT.offset_bits)
            q = tc["q"]
            big = _I(L_DOT + 8)
            qmin = jnp.min(jnp.where(tc["valid"], q, big))
            qmax = jnp.max(jnp.where(tc["valid"], q, _I(-1)))
            pieces = tc["pieces"]

            def cbody(j, c3):
                d = j - q
                contrib = jnp.where(d == 0, pieces[0], _I(0))
                for u in range(1, 4):
                    contrib = jnp.where(d == u, pieces[u], contrib)
                acc[pl.ds(j * 8, 1), :] += contrib
                return c3

            jax.lax.fori_loop(qmin, qmax + 4, cbody, _I(0))
            spec[0:3, :] += _spec_counts(tc)
        elif beta_mode == "general":
            tc = dep.product_terms(bb_hi_ref[...], bb_lo_ref[...],
                                   c_row(c_hi_ref), c_row(c_lo_ref),
                                   DOT_FORMAT.offset_bits)
            _deposit_products_phase(acc, tc, 0)
            spec[0:3, :] += _spec_counts(tc)

        _renorm8(acc)
        hi32, lo32 = round_phase_acc(
            acc, spec[0:3, :], L_DOT, DOT_FORMAT.offset_bits, dig
        )
        yhi_out[pl.ds(rr_, 1), :] = hi32
        ylo_out[pl.ds(rr_, 1), :] = lo32
        return carry

    jax.lax.fori_loop(_I(0), _I(8), row_body, _I(0))


@functools.partial(jax.jit, static_argnames=("beta_mode",))
def gemm_bits_pallas(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo,
                     beta_hi, beta_lo, beta_mode: str = "zero"):
    """C = A@B (+ exact beta*C), correctly rounded on-device.

    a: (m, k); b: (k, n); c: (m, n) bit pairs; beta as uint32 scalars.
    Returns (hi, lo) uint32 arrays of shape (m, n).
    """
    m, k = a_hi.shape
    _, n = b_hi.shape
    m_pad = -(-m // 8) * 8
    k_pad = -(-k // LANES) * LANES
    n_pad = -(-n // LANES) * LANES
    a_hi = jnp.pad(a_hi, ((0, m_pad - m), (0, k_pad - k)))
    a_lo = jnp.pad(a_lo, ((0, m_pad - m), (0, k_pad - k)))
    b_hi = jnp.pad(b_hi, ((0, k_pad - k), (0, n_pad - n)))
    b_lo = jnp.pad(b_lo, ((0, k_pad - k), (0, n_pad - n)))
    c_hi = jnp.pad(c_hi, ((0, m_pad - m), (0, n_pad - n)))
    c_lo = jnp.pad(c_lo, ((0, m_pad - m), (0, n_pad - n)))
    bb_hi = jnp.broadcast_to(beta_hi, (1, LANES))
    bb_lo = jnp.broadcast_to(beta_lo, (1, LANES))

    n_blocks = n_pad // LANES
    hi, lo = pl.pallas_call(
        functools.partial(_gemm_kernel, k_pad=k_pad, beta_mode=beta_mode),
        grid=(m_pad // 8, n_blocks),
        in_specs=[
            pl.BlockSpec((8, k_pad), lambda i, j: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_pad), lambda i, j: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANES), lambda i, j: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANES), lambda i, j: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((m_pad, n_pad), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L_DOT * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((L_DOT, LANES), jnp.int32),
        ],
    )(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo, bb_hi, bb_lo)
    return hi[:m, :n], lo[:m, :n]
