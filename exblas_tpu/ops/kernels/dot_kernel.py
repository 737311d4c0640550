"""Pallas TPU kernel for ExDOT: exact dot-product limb accumulation.

Replaces the reference's TwoProductFMA + FPE tail-insertion scheme
(reference ExDOT.FPE.cl:226-270) with an exact integer path: each product
``a[i]*b[i]`` is formed as seven 30-bit "shift classes" from 14-bit mantissa
pieces (an exact 106-bit schoolbook product -- the TPU has no fp64 FMA at
all), and each class is deposited into the dot-format accumulator via the
same windowed branch-free loop as ExSUM.

The accumulator covers the full product range down to 2^-2148, so products
that underflow double precision are kept exactly -- stronger than the
reference (whose TwoProdFMA residual silently underflows).
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
from ...core.types import L_DOT, DOT_FORMAT, LIMB_BITS, Superacc
from .sum_kernel import LANES, deposit_block, renorm_ref

_I = jnp.int32
_Z = _np.int32(0)

# Up to ~3 overlapping class pieces land on one limb per element, so the
# per-element per-limb deposit magnitude is < 3 * 2^20 < 2^22; with rows=R
# and renorm every RENORM_EVERY steps the growth R*RENORM_EVERY*2^22 must
# stay < 2^31 - 2^21.
RENORM_EVERY = 2
MAX_ROWS_X_RENORM = 1 << (31 - LIMB_BITS - 3)


def _dot_kernel(hi_a_ref, lo_a_ref, hi_b_ref, lo_b_ref,
                limb_out, spec_out, acc, spec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    t = dep.product_terms(
        hi_a_ref[...], lo_a_ref[...], hi_b_ref[...], lo_b_ref[...],
        DOT_FORMAT.offset_bits,
    )
    q, r, s = t["q"], t["r"], t["s"]
    # shared window bounds: class k's base limb q+dq_k is within
    # [q + 14k//20, q + 14k//20 + 1], so two cross-lane reductions serve
    # all seven classes (instead of two per class)
    big = _I(L_DOT + 8)
    qmin0 = jnp.min(jnp.where(t["valid"], q, big))
    qmax0 = jnp.max(jnp.where(t["valid"], q, _I(-1)))
    for k, cls in enumerate(t["classes"]):
        pbit = r + _I(14 * k)
        dq = pbit // _I(LIMB_BITS)
        rr = pbit - dq * _I(LIMB_BITS)
        p0, p1, p2 = dep.split_value30(cls.astype(jnp.uint32), rr)
        pieces = tuple(p.astype(_I) * s for p in (p0, p1, p2))
        a_k = 14 * k // 20
        deposit_block(acc, q + dq, pieces, t["valid"], L_DOT,
                      bounds=(qmin0 + _I(a_k), qmax0 + _I(a_k + 1)))

    counts = jnp.stack(
        [jnp.sum(t["nan"], axis=0, dtype=_I),
         jnp.sum(t["pinf"], axis=0, dtype=_I),
         jnp.sum(t["ninf"], axis=0, dtype=_I)]
        + [jnp.zeros((LANES,), _I)] * 5
    )
    spec[...] += counts

    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        renorm_ref(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        renorm_ref(acc)
        limb_out[...] = acc[...]
        spec_out[...] = spec[...]


@functools.partial(jax.jit, static_argnames=("rows",))
def exdot_pallas(hi_a, lo_a, hi_b, lo_b, rows: int = 64) -> Superacc:
    """Exact dot product of doubles given as uint32 bit pairs -> Superacc."""
    assert rows % 8 == 0 and rows * RENORM_EVERY <= MAX_ROWS_X_RENORM
    arrs = [x.reshape(-1) for x in (hi_a, lo_a, hi_b, lo_b)]
    n = arrs[0].shape[0]
    per_block = rows * LANES
    nblocks = max(1, -(-n // per_block))
    nblocks = 1 << (nblocks - 1).bit_length()  # shape bucketing
    pad = nblocks * per_block - n
    if pad:
        arrs = [jnp.pad(x, (0, pad)) for x in arrs]  # 0*0 deposits nothing
    arrs = [x.reshape(-1, LANES) for x in arrs]

    limbs_lanes, spec_lanes = pl.pallas_call(
        _dot_kernel,
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
            pltpu.VMEM((L_DOT, LANES), jnp.int32),
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
