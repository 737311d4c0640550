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

from ...core import deposit as dep
from ...core.accumulator import to_int32_limbs
from ...core.types import L_SUM, LIMB_BITS, SUM_FORMAT, Superacc

LANES = 128
_I = jnp.int32
_Z = _np.int32(0)

# Deposits per lane between carry passes is bounded by rows * RENORM_EVERY;
# limb growth is rows * RENORM_EVERY * 2^20 + 2^21 which must stay < 2^31.
# rows=256, RENORM_EVERY=4 -> 2^30 + 2^21: safe.
RENORM_EVERY = 4
MAX_ROWS_X_RENORM = 1 << (31 - LIMB_BITS - 1)


def deposit_block(acc_ref, q, pieces, valid, n_limbs, bounds=None):
    """Deposit a (G, 128) block of decomposed terms into the limb scratch.

    One fori_loop over the limb window [min q, max q + len(pieces)) of the
    whole block; each iteration selects the matching piece per element and
    reduces over the G sublanes.  Exact regardless of window (invalid terms
    have q=0, pieces=0).  ``bounds=(qmin, qmax)`` supplies precomputed
    (possibly conservative) bounds on q, saving cross-lane reductions.
    """
    npieces = len(pieces)
    if bounds is not None:
        qmin, qmax = bounds
    else:
        big = _I(n_limbs + 8)
        qmin = jnp.min(jnp.where(valid, q, big))
        qmax = jnp.max(jnp.where(valid, q, _I(-1)))

    def body(j, carry):
        d = j - q
        contrib = jnp.where(d == 0, pieces[0], _I(0))
        for t in range(1, npieces):
            contrib = jnp.where(d == t, pieces[t], contrib)
        acc_ref[pl.ds(j, 1), :] += jnp.sum(
            contrib, axis=0, keepdims=True, dtype=_I
        )
        return carry

    jax.lax.fori_loop(qmin, qmax + npieces, body, _I(0))


def renorm_ref(acc_ref):
    """One exact carry pass over the limb scratch (value-preserving)."""
    a = acc_ref[...]
    c = a >> LIMB_BITS
    low = a - (c << LIMB_BITS)
    c_up = pltpu.roll(c, shift=jnp.int32(1), axis=0)
    row = jax.lax.broadcasted_iota(_I, c_up.shape, 0)
    c_up = jnp.where(row == 0, _I(0), c_up)
    acc_ref[...] = low + c_up


def _sum_kernel(hi_ref, lo_ref, limb_out, spec_out, acc, spec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        spec[...] = jnp.zeros_like(spec)

    t = dep.sum_terms(hi_ref[...], lo_ref[...], SUM_FORMAT.offset_bits)
    deposit_block(acc, t["q"], t["pieces"], t["valid"], L_SUM)
    counts = jnp.stack(
        [jnp.sum(t["nan"], axis=0, dtype=_I),
         jnp.sum(t["pinf"], axis=0, dtype=_I),
         jnp.sum(t["ninf"], axis=0, dtype=_I)]
        + [jnp.zeros((LANES,), _I)] * 5
    )  # (8, 128); rows 0..2 = NaN/+Inf/-Inf counts
    spec[...] += counts

    # RENORM_EVERY is a power of two; use a mask (scalar % lowering is fragile)
    @pl.when(jnp.bitwise_and(i + 1, _I(RENORM_EVERY - 1)) == 0)
    def _():
        renorm_ref(acc)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        renorm_ref(acc)
        limb_out[...] = acc[...]
        spec_out[...] = spec[...]


@functools.partial(jax.jit, static_argnames=("rows",))
def exsum_pallas(hi, lo, rows: int = 128) -> Superacc:
    """Exact sum of doubles given as uint32 bit pairs -> Superacc.

    hi/lo: uint32 arrays of identical shape (flattened internally).
    rows: grid block height (a tiling knob; results are invariant to it).
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
        _sum_kernel,
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
            pltpu.VMEM((L_SUM, LANES), jnp.int32),
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
