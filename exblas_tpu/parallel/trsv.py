"""Mesh-sharded reproducible triangular solve.

The reference solves TRSV on one device only (its MPI layer distributes
ExSUM alone; the GPU kernel parallelizes across workgroups with a spin
sync, ExTRSV.lnn.Superacc.cl:192-218).  Here the same wavefront runs
across a device mesh as plain SPMD with collectives:

* T and b are ROW-SHARDED: device d owns one contiguous block of rows and
  their exact per-row limb accumulators;
* the solve walks the nd diagonal blocks in order.  For block kb, a
  masked integer ``psum`` broadcasts the owner's accumulator state and
  diagonal block to every device (the TPU-native analog of the
  reference's inter-workgroup sync/publish protocol -- one collective
  instead of a spin lock), then EVERY device runs the identical
  sequential block solve (``ops.extrsv.solve_diag_block``, replicated
  compute, deterministic) and deposits the solved x block into its own
  trailing rows with the exact GEMV-style limb deposit;
* x is assembled replicated and returned as f64 bits.

Bit identity with the single-chip solve holds by construction: limb
deposits are exact and order-free, and every Round/divide happens at the
same dependency point with the same exact state -- the mesh shape cannot
change a bit (tested in test_distributed_blas2.py and fuzz_mesh.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.ieee import F64Bits, flip2_bits, split_f64, transpose_bits
from ..ops.extrsv import _deposit_b, solve_diag_block
from ..ops.exgemv import dot_rows_acc_xla
from .distributed import AXIS, make_mesh

_U64 = jnp.uint64
_I32 = jnp.int32
_I64 = jnp.int64


def _neg(hi):
    return hi ^ jnp.uint32(0x80000000)


def extrsv_sharded(uplo: str, trans: str, diag: str, a, b,
                   mesh: Mesh | None = None, axis: str = AXIS):
    """Reproducible op(T) x = b over a device mesh -> x f64 bits (n,).

    Same semantics and bits as the single-chip ``extrsv`` (exact residual
    accumulators, Round-then-correctly-rounded-divide per element); T and
    the accumulators are row-sharded, solved blocks are broadcast with
    masked integer psums.  n must divide the mesh size.
    """
    uplo, trans, diag = uplo.upper(), trans.upper(), diag.upper()
    if uplo not in "LU" or trans not in "NT" or diag not in "NU":
        raise ValueError("extrsv_sharded: uplo L/U, trans N/T, diag N/U")
    mesh = mesh or make_mesh()
    nd = mesh.devices.size
    ab = split_f64(np.asarray(a, np.float64))
    bb = split_f64(np.asarray(b, np.float64))
    n = bb.hi.shape[0]
    if ab.hi.shape != (n, n):
        raise ValueError(f"extrsv_sharded: a must be ({n}, {n})")
    if n % nd:
        raise ValueError(f"n={n} must divide the mesh size {nd}")

    if trans == "T":
        ab = transpose_bits(ab)
        uplo = "U" if uplo == "L" else "L"
    if uplo == "U":
        ab = flip2_bits(ab)
        bb = F64Bits(hi=bb.hi[::-1], lo=bb.lo[::-1])

    nb = n // nd
    unit = diag == "U"

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis)),
             out_specs=P(), check_vma=False)
    def run(t_hi, t_lo, b_hi, b_lo):
        # local rows: global ids idx*nb + [0, nb)
        idx = jax.lax.axis_index(axis).astype(_I32)
        grow = idx * nb + jax.lax.broadcasted_iota(_I32, (nb,), 0)
        acc, spec = _deposit_b(b_hi, b_lo)
        x_hi = jnp.zeros((n,), jnp.uint32)
        x_lo = jnp.zeros((n,), jnp.uint32)

        for kb in range(nd):
            mine = idx == kb
            # masked psum = broadcast of the owner's state (int32/int64
            # limb wire format -- the same mechanism as the reductions)
            acc_c = jax.lax.psum(
                jnp.where(mine, acc, _I64(0)), axis)
            spec_c = jax.lax.psum(
                jnp.where(mine, spec, _I64(0)), axis)
            td_hi = jax.lax.psum(
                jnp.where(mine, t_hi[:, kb * nb:(kb + 1) * nb],
                          jnp.uint32(0)).astype(_I64), axis) \
                .astype(jnp.uint32)
            td_lo = jax.lax.psum(
                jnp.where(mine, t_lo[:, kb * nb:(kb + 1) * nb],
                          jnp.uint32(0)).astype(_I64), axis) \
                .astype(jnp.uint32)
            # identical replicated block solve on every device
            xb_hi, xb_lo = solve_diag_block(td_hi, td_lo, acc_c, spec_c,
                                            unit)
            x_hi = jax.lax.dynamic_update_slice(x_hi, xb_hi, (kb * nb,))
            x_lo = jax.lax.dynamic_update_slice(x_lo, xb_lo, (kb * nb,))
            # exact trailing deposit into MY rows strictly below the block
            m = (grow >= (kb + 1) * nb)[:, None]
            tc_hi = jnp.where(m, _neg(t_hi[:, kb * nb:(kb + 1) * nb]),
                              jnp.uint32(0))
            tc_lo = jnp.where(m, t_lo[:, kb * nb:(kb + 1) * nb],
                              jnp.uint32(0))
            d_limbs, d_spec = dot_rows_acc_xla(tc_hi, tc_lo, xb_hi, xb_lo)
            acc = acc + d_limbs
            spec = spec + d_spec.astype(_I64)

        return (x_hi.astype(_U64) << _U64(32)) | x_lo.astype(_U64)

    bits = jax.jit(run)(ab.hi, ab.lo, bb.hi, bb.lo)
    if uplo == "U":
        bits = bits[::-1]
    return bits
