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
  sub-blocked panel solve (``ops.extrsv.solve_panel`` -- the shared
  blocked-sweep engine of the single-chip path, replicated compute,
  deterministic) and deposits the solved x block into its own trailing
  rows with the exact GEMV-style limb deposit (the Pallas GEMV kernel
  on TPU);
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
from ..ops.extrsv import _choose_block, _deposit_b, solve_panel
from ..ops.exgemv import dot_rows_acc_xla
from .distributed import AXIS, make_mesh

_U64 = jnp.uint64
_I32 = jnp.int32
_I64 = jnp.int64


def _neg(hi):
    return hi ^ jnp.uint32(0x80000000)


def extrsv_sharded(uplo: str, trans: str, diag: str, a, b,
                   mesh: Mesh | None = None, axis: str = AXIS,
                   impl: str | None = None):
    """Reproducible op(T) x = b over a device mesh -> x f64 bits (n,).

    Same semantics and bits as the single-chip ``extrsv`` (exact residual
    accumulators, Round-then-correctly-rounded-divide per element); T and
    the accumulators are row-sharded, solved blocks are broadcast with
    masked integer psums.  Uneven n is padded: the system extends to
    [[T, 0], [0, I]] x = [b, 0] whose padded solution rows are exactly
    0.0 and deposit nothing into real rows, so the bits match the
    single-chip solve (the remainder handling of the reference's MPI
    scatter, src/cpu/blas/blas1/ExSUM.cpp:33-63).
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

    if trans == "T":
        ab = transpose_bits(ab)
        uplo = "U" if uplo == "L" else "L"
    if uplo == "U":
        ab = flip2_bits(ab)
        bb = F64Bits(hi=bb.hi[::-1], lo=bb.lo[::-1])

    n_pad = -(-n // nd) * nd
    if n_pad != n:
        # identity extension (1.0 = hi 0x3FF00000): padded x rows solve to
        # (0 - 0)/1 = +0.0 exactly; zero off-diagonals deposit nothing
        pad = n_pad - n
        one_hi = jnp.full((pad,), 0x3FF00000, jnp.uint32)
        t_hi = jnp.pad(ab.hi, ((0, pad), (0, pad)))
        t_hi = t_hi.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(
            one_hi)
        ab = F64Bits(hi=t_hi, lo=jnp.pad(ab.lo, ((0, pad), (0, pad))))
        bb = F64Bits(hi=jnp.pad(bb.hi, (0, pad)),
                     lo=jnp.pad(bb.lo, (0, pad)))

    nb = n_pad // nd
    unit = diag == "U"
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # sub-block the replicated nb-row diagonal-panel sweep (a 1024-step
    # sequential solve at n=8192/8 devices was the round-2 bottleneck);
    # trailing updates inside the panel and across devices ride the
    # Pallas GEMV kernel on TPU
    sub = _choose_block(nb)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis)),
             out_specs=P(), check_vma=False)
    def run(t_hi, t_lo, b_hi, b_lo):
        # local rows: global ids idx*nb + [0, nb)
        idx = jax.lax.axis_index(axis).astype(_I32)
        grow = idx * nb + jax.lax.broadcasted_iota(_I32, (nb,), 0)
        acc, spec = _deposit_b(b_hi, b_lo)
        x_hi = jnp.zeros((n_pad,), jnp.uint32)
        x_lo = jnp.zeros((n_pad,), jnp.uint32)

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
            # identical replicated panel solve on every device (the shared
            # blocked-sweep engine of the single-chip path: sub-blocked
            # diagonal solves + batched trailing GEMV deposits)
            xb_hi, xb_lo = solve_panel(td_hi, td_lo, acc_c, spec_c,
                                       unit, sub, impl)
            x_hi = jax.lax.dynamic_update_slice(x_hi, xb_hi, (kb * nb,))
            x_lo = jax.lax.dynamic_update_slice(x_lo, xb_lo, (kb * nb,))
            # exact trailing deposit into MY rows strictly below the block
            m = (grow >= (kb + 1) * nb)[:, None]
            tc_hi = jnp.where(m, _neg(t_hi[:, kb * nb:(kb + 1) * nb]),
                              jnp.uint32(0))
            tc_lo = jnp.where(m, t_lo[:, kb * nb:(kb + 1) * nb],
                              jnp.uint32(0))
            if impl == "pallas":
                from ..ops.kernels.gemv_kernel import gemv_rows_acc_pallas

                d_limbs, d_spec = gemv_rows_acc_pallas(
                    tc_hi, tc_lo, xb_hi, xb_lo,
                    k_rows=max(8, min(nb, 256)))
            else:
                d_limbs, d_spec = dot_rows_acc_xla(tc_hi, tc_lo,
                                                   xb_hi, xb_lo)
            acc = acc + d_limbs
            spec = spec + d_spec.astype(_I64)

        return (x_hi.astype(_U64) << _U64(32)) | x_lo.astype(_U64)

    bits = jax.jit(run)(ab.hi, ab.lo, bb.hi, bb.lo)[:n]
    if uplo == "U":
        bits = bits[::-1]
    return bits
