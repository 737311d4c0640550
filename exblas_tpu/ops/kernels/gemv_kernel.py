"""Pallas TPU kernel for ExGEMV: per-row exact dot accumulators.

Layout (TPU-first redesign of the reference's one-thread-per-row scheme,
ExGEMV.Superacc.cl:192-293, which kept one global-memory superaccumulator per
row):

* the matrix is consumed in *reduction-major* layout ``(K, M)`` (A^T for
  'N'): a block is (k_rows, 128) -- 128 output rows in lanes, k in sublanes;
* the multiplier vector z = fl(alpha*x) is pre-broadcast to (K, 128) so the
  element product decomposition is a pure (k_rows, 128) elementwise pass;
* the VMEM accumulator is (L_DOT*8, 128) int32: limb ``l`` of output row
  ``r`` lives in rows ``8l..8l+8`` (eight k-phase sub-accumulators, merged
  once at the end) and lane ``r`` -- deposits never collide, no atomics;
* carry renormalization is a roll-by-8 pass every RENORM_EVERY grid steps;
* at the last k step the 8 phases are summed (exact) and the (L_DOT, 128)
  per-row limb columns are written out; rounding happens batched at the XLA
  level (jointly with the exact beta*y deposits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import L_DOT, LIMB_BITS

LANES = 128
_I = jnp.int32
_Z = _np.int32(0)

RENORM_EVERY = 2  # dot-style deposits: 7 planes/limb per block


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


def _gemv_kernel(at_hi_ref, at_lo_ref, z_hi_ref, z_lo_ref,
                 limb_out, spec_out, acc, spec, *, k_rows):
    from .dot_kernel import _dot_block

    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    # The per-(row, k) products decompose exactly like ExDOT's: reuse its
    # digit-plane decode + distinct-base-limb windowed deposit.
    _dot_block(at_hi_ref[...], at_lo_ref[...], z_hi_ref[...], z_lo_ref[...],
               acc, spec, k_rows)

    @pl.when(jnp.bitwise_and(ik + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        _renorm8(acc)

    @pl.when(ik == pl.num_programs(1) - 1)
    def _():
        _renorm8(acc)
        merged = jnp.sum(
            acc[...].reshape(L_DOT, 8, LANES), axis=1, dtype=_I
        )  # exact phase merge: 8 values < 2^20 + slack each
        limb_out[...] = merged
        spec_out[...] = spec[...]


@functools.partial(jax.jit, static_argnames=("k_rows",))
def gemv_rows_acc_pallas(a_hi, a_lo, z_hi, z_lo, k_rows: int = 256):
    """Exact per-row dot accumulators via the Pallas kernel.

    a: (m, n) bit pair; z: (n,) bit pair.
    Returns (limbs int64 (m, L_DOT), special int32 (m, 3)).
    """
    # overflow safety: limb growth between renorms is bounded by
    # RENORM_EVERY * (k_rows/8) * 21 * 2^20 (7 digit planes of < 3*2^20),
    # which must stay < 2^31 - 2^21.
    assert k_rows % 8 == 0 and RENORM_EVERY * (k_rows // 8) * 21 < 2046
    m, n = a_hi.shape
    m_pad = -(-m // LANES) * LANES
    n_pad = -(-n // k_rows) * k_rows
    # Reduction-major layout + padding (zero bits deposit nothing).
    at_hi = jnp.pad(a_hi.T, ((0, n_pad - n), (0, m_pad - m)))
    at_lo = jnp.pad(a_lo.T, ((0, n_pad - n), (0, m_pad - m)))
    zb_hi = jnp.pad(jnp.broadcast_to(z_hi[:, None], (n, LANES)),
                    ((0, n_pad - n), (0, 0)))
    zb_lo = jnp.pad(jnp.broadcast_to(z_lo[:, None], (n, LANES)),
                    ((0, n_pad - n), (0, 0)))

    m_blocks = m_pad // LANES
    k_blocks = n_pad // k_rows

    limb_lanes, spec_lanes = pl.pallas_call(
        functools.partial(_gemv_kernel, k_rows=k_rows),
        grid=(m_blocks, k_blocks),
        in_specs=[
            pl.BlockSpec((k_rows, LANES), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, LANES), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, LANES), lambda i, k: (k, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, LANES), lambda i, k: (k, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L_DOT, LANES), lambda i, k: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i, k: (i, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_blocks * L_DOT, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m_blocks * 8, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L_DOT * 8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )(at_hi, at_lo, zb_hi, zb_lo)

    # (m_blocks*L, 128) -> (m_pad, L): lane r of block i is output row
    # i*128 + r.
    limbs = (
        limb_lanes.reshape(m_blocks, L_DOT, LANES)
        .transpose(0, 2, 1)
        .reshape(m_pad, L_DOT)[:m]
        .astype(jnp.int64)
    )
    special = (
        spec_lanes.reshape(m_blocks, 8, LANES)[:, 0:3, :]
        .transpose(0, 2, 1)
        .reshape(m_pad, 3)[:m]
    )
    return limbs, special
