"""Mesh-sharded reproducible GEMV / GEMM.

Two sharding strategies, both bit-identical to the single-device result:

* row sharding (the "tensor-parallel" layout): each device owns a block of
  output rows and computes them locally -- no collectives, trivially exact;
* k sharding (reduction-parallel): each device accumulates a slice of the
  reduction dimension into per-row limb accumulators, which are merged with
  an integer ``psum`` (exact and associative, so the mesh size cannot change
  the bits) before one replicated rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.f64ops import f64_mul
from ..core.ieee import F64Bits, split_f64, transpose_bits
from ..ops.exgemv import dot_rows_acc_xla, round_rows
from .distributed import AXIS, make_mesh

_U64 = jnp.uint64


def _local_rows_acc(a_hi, a_lo, z_hi, z_lo, impl: str):
    if impl == "pallas":
        from ..ops.kernels.gemv_kernel import gemv_rows_acc_pallas

        return gemv_rows_acc_pallas(a_hi, a_lo, z_hi, z_lo)
    return dot_rows_acc_xla(a_hi, a_lo, z_hi, z_lo)


def _pad_axis(x, size: int, axis: int = 0):
    """Zero-pad one axis up to ``size``.  Zero bit-pairs are +0.0 doubles:
    they deposit nothing into limb accumulators and produce no specials
    (0*finite), so padding to shard divisibility then slicing the result
    is bit-exact -- the same remainder handling as the sum/dot shards
    (distributed.py) and the reference's uneven MPI scatter
    (src/cpu/blas/blas1/ExSUM.cpp:33-63)."""
    if x.shape[axis] == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pad)


def exgemv_sharded(a, x, alpha: float = 1.0, mesh: Mesh | None = None,
                   axis: str = AXIS, shard: str = "rows",
                   impl: str | None = None, beta: float = 0.0, y=None,
                   trans: str = "N"):
    """Reproducible y = alpha*op(A)@x + beta*y over a device mesh -> bits.

    shard="rows": A row-sharded, y sharded (gathered on return).
    shard="k":    A column-sharded, exact limb psum across devices.
    trans="T" solves with A transposed (on-device bit transpose, matching
    the single-chip signature).  Uneven m/k need not divide the mesh:
    shards are zero-padded (exact) and the result sliced.
    beta handling mirrors the single-chip routine (exact deposit of y for
    beta == 1, exact 106-bit beta*y product otherwise) and happens exactly
    once per output row -- on the row's owner (rows) or replicated after
    the merge (k) -- so the mesh cannot change a bit.
    """
    from ..ops.exgemv import _apply_beta_rows, _scalar_bits

    mesh = mesh or make_mesh()
    nd = mesh.devices.size
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ab = split_f64(np.asarray(a, np.float64))
    if trans.upper() == "T":
        ab = transpose_bits(ab)
    elif trans.upper() != "N":
        raise ValueError(f"exgemv_sharded: trans must be N/T, got {trans!r}")
    m, n = ab.hi.shape
    # z = fl(alpha * x), computed once and replicated
    xb = split_f64(np.asarray(x, np.float64))
    au = np.float64(alpha).view(np.uint64)
    zbits = f64_mul(
        jnp.broadcast_to(jnp.uint32(int(au) >> 32), xb.hi.shape),
        jnp.broadcast_to(jnp.uint32(int(au) & 0xFFFFFFFF), xb.lo.shape),
        xb.hi, xb.lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    beta_mode = "zero" if (beta == 0.0 or y is None) else (
        "one" if beta == 1.0 else "general")
    bh, bl = _scalar_bits(beta)
    if beta_mode != "zero":
        yb = split_f64(np.asarray(y, np.float64))
        if yb.hi.shape != (m,):
            raise ValueError(f"exgemv_sharded: y must have shape ({m},)")
    else:
        yb = split_f64(np.zeros((m,)))

    if shard == "rows":
        m_pad = -(-m // nd) * nd
        ab = F64Bits(hi=_pad_axis(ab.hi, m_pad), lo=_pad_axis(ab.lo, m_pad))
        yb = F64Bits(hi=_pad_axis(yb.hi, m_pad), lo=_pad_axis(yb.lo, m_pad))

        from ..ops.kernels.gemv_mxu import MAX_K_MXU

        if impl in ("pallas", "auto") and -(-n // 256) * 256 <= MAX_K_MXU:
            # each device owns complete rows, so the full single-device
            # auto dispatch (MXU byte-plane ladder + VPU fallback) applies
            # per shard -- multi-chip GEMV runs at MXU speed
            from ..ops.exgemv import _gemv_bits_auto

            one_h, one_l = _scalar_bits(1.0)   # alpha already folded into z

            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(), P(),
                               P(axis), P(axis)),
                     out_specs=P(axis), check_vma=False)
            def run(a_hi, a_lo, z_hi, z_lo, y_hi, y_lo):
                return _gemv_bits_auto(a_hi, a_lo, z_hi, z_lo,
                                       one_h, one_l, bh, bl,
                                       y_hi, y_lo, beta_mode, 128)

            return jax.jit(run)(ab.hi, ab.lo, z_hi, z_lo,
                                yb.hi, yb.lo)[:m]

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(), P(), P(axis), P(axis)),
                 out_specs=P(axis), check_vma=False)
        def run(a_hi, a_lo, z_hi, z_lo, y_hi, y_lo):
            limbs, special = _local_rows_acc(a_hi, a_lo, z_hi, z_lo, impl)
            limbs, special = _apply_beta_rows(limbs, special, bh, bl,
                                              y_hi, y_lo, beta_mode)
            return round_rows(limbs, special)

        return jax.jit(run)(ab.hi, ab.lo, z_hi, z_lo, yb.hi, yb.lo)[:m]

    elif shard == "k":
        n_pad = -(-n // nd) * nd
        ab = F64Bits(hi=_pad_axis(ab.hi, n_pad, 1),
                     lo=_pad_axis(ab.lo, n_pad, 1))
        z_hi = _pad_axis(z_hi, n_pad)
        z_lo = _pad_axis(z_lo, n_pad)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(None, axis), P(None, axis), P(axis), P(axis),
                           P(), P()),
                 out_specs=P(), check_vma=False)
        def run(a_hi, a_lo, z_hi, z_lo, y_hi, y_lo):
            limbs, special = _local_rows_acc(a_hi, a_lo, z_hi, z_lo, impl)
            # exact cross-device merge of per-row accumulators
            limbs = jax.lax.psum(limbs, axis)
            special = jax.lax.psum(special, axis)
            # beta deposit AFTER the merge, replicated: every device does
            # the identical exact deposit, so the output stays replicated
            limbs, special = _apply_beta_rows(limbs, special, bh, bl,
                                              y_hi, y_lo, beta_mode)
            return round_rows(limbs, special)

        return jax.jit(run)(ab.hi, ab.lo, z_hi, z_lo, yb.hi, yb.lo)
    raise ValueError(f"unknown shard strategy {shard!r}")


def make_mesh_2d(shape, axes=("rows", "k")) -> Mesh:
    """2-D device mesh, e.g. (2, 4) for row-parallel x reduction-parallel."""
    devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axes)


def exgemv_sharded_2d(a, x, alpha: float = 1.0, mesh: Mesh | None = None,
                      beta: float = 0.0, y=None, trans: str = "N"):
    """Reproducible y = alpha*op(A)@x + beta*y over a 2-D (rows, k) mesh.

    A is sharded over both axes; per-device partial accumulators are merged
    with an exact limb psum over the reduction axis, rows stay sharded; the
    exact beta*y deposit happens after the merge on the row's owners.
    Bit-identical for every mesh shape (the 2-D analog of the reference's
    partition-invariance claim).
    """
    from ..ops.exgemv import _apply_beta_rows, _scalar_bits

    mesh = mesh or make_mesh_2d((1, len(jax.devices())))
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    row_ax, k_ax = mesh.axis_names
    ab = split_f64(np.asarray(a, np.float64))
    if trans.upper() == "T":
        ab = transpose_bits(ab)
    elif trans.upper() != "N":
        raise ValueError(
            f"exgemv_sharded_2d: trans must be N/T, got {trans!r}")
    m, n = ab.hi.shape
    m_pad = -(-m // mesh.shape[row_ax]) * mesh.shape[row_ax]
    n_pad = -(-n // mesh.shape[k_ax]) * mesh.shape[k_ax]
    ab = F64Bits(hi=_pad_axis(_pad_axis(ab.hi, m_pad), n_pad, 1),
                 lo=_pad_axis(_pad_axis(ab.lo, m_pad), n_pad, 1))
    xb_ = split_f64(np.asarray(x, np.float64))
    au = np.float64(alpha).view(np.uint64)
    zbits = f64_mul(
        jnp.broadcast_to(jnp.uint32(int(au) >> 32), xb_.hi.shape),
        jnp.broadcast_to(jnp.uint32(int(au) & 0xFFFFFFFF), xb_.lo.shape),
        xb_.hi, xb_.lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    z_hi = _pad_axis(z_hi, n_pad)
    z_lo = _pad_axis(z_lo, n_pad)

    beta_mode = "zero" if (beta == 0.0 or y is None) else (
        "one" if beta == 1.0 else "general")
    bh, bl = _scalar_bits(beta)
    if beta_mode != "zero":
        yb = split_f64(np.asarray(y, np.float64))
        if yb.hi.shape != (m,):
            raise ValueError(f"exgemv_sharded_2d: y must be ({m},)")
    else:
        yb = split_f64(np.zeros((m,)))
    yb = F64Bits(hi=_pad_axis(yb.hi, m_pad), lo=_pad_axis(yb.lo, m_pad))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(row_ax, k_ax), P(row_ax, k_ax), P(k_ax), P(k_ax),
                       P(row_ax), P(row_ax)),
             out_specs=P(row_ax), check_vma=False)
    def run(a_hi, a_lo, z_hi, z_lo, y_hi, y_lo):
        limbs, special = _local_rows_acc(a_hi, a_lo, z_hi, z_lo, impl)
        limbs = jax.lax.psum(limbs, k_ax)
        special = jax.lax.psum(special, k_ax)
        # replicated over k_ax: identical exact deposit on every k peer
        limbs, special = _apply_beta_rows(limbs, special, bh, bl,
                                          y_hi, y_lo, beta_mode)
        return round_rows(limbs, special)

    return jax.jit(run)(ab.hi, ab.lo, z_hi, z_lo, yb.hi, yb.lo)[:m]


def _local_gemm_bits(a_hi, a_lo, b_hi, b_lo, impl: str, c_hi=None,
                     c_lo=None, beta_hi=None, beta_lo=None,
                     beta_mode: str = "zero"):
    """Exact C = beta*C + A@B bits for one device-local block (alpha is
    folded into A by the callers, matching the single-chip routine)."""
    if c_hi is None:
        c_hi = c_lo = jnp.zeros((a_hi.shape[0], b_hi.shape[1]), jnp.uint32)
    if beta_hi is None:
        beta_hi = beta_lo = jnp.uint32(0)
    if impl == "pallas":
        from ..ops.kernels.gemm_kernel import gemm_bits_pallas

        hi, lo = gemm_bits_pallas(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo,
                                  beta_hi, beta_lo, beta_mode)
        return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)
    from ..ops.exgemm import apply_beta_gemm, gemm_acc_xla

    limbs, special = gemm_acc_xla(a_hi, a_lo, b_hi, b_lo)
    limbs, special = apply_beta_gemm(limbs, special, beta_hi, beta_lo,
                                     c_hi, c_lo, beta_mode)
    return round_rows(limbs, special).reshape(
        a_hi.shape[0], b_hi.shape[1])


def _gemm_operands(a, b, alpha, beta, c, transa="N", transb="N"):
    """Shared host-side prep for the sharded GEMM wrappers: bit planes
    (transposed on device per transa/transb), fl(alpha*A) scalar bits,
    beta mode, and a (possibly zero) C plane."""
    from ..ops.exgemv import _scalar_bits

    for name, t in (("transa", transa), ("transb", transb)):
        if t.upper() not in ("N", "T"):
            raise ValueError(f"exgemm_sharded: {name} must be N/T, got "
                             f"{t!r}")
    ab = split_f64(np.asarray(a, np.float64))
    bb = split_f64(np.asarray(b, np.float64))
    if transa.upper() == "T":
        ab = transpose_bits(ab)
    if transb.upper() == "T":
        bb = transpose_bits(bb)
    m = ab.hi.shape[0]
    n = bb.hi.shape[1]
    beta_mode = "zero" if (beta == 0.0 or c is None) else (
        "one" if beta == 1.0 else "general")
    bh, bl = _scalar_bits(beta)
    ah, al = _scalar_bits(alpha)
    if beta_mode != "zero":
        cb = split_f64(np.asarray(c, np.float64))
        if cb.hi.shape != (m, n):
            raise ValueError(f"c must have shape ({m}, {n})")
    else:
        cb = split_f64(np.zeros((m, n)))
    return ab, bb, cb, (ah, al), (bh, bl), beta_mode


def _alpha_fold(a_hi, a_lo, ah, al):
    """z = fl(alpha * A) elementwise on the local shard (one correctly
    rounded multiply per element -- the single-chip semantics)."""
    zbits = f64_mul(jnp.broadcast_to(ah, a_hi.shape),
                    jnp.broadcast_to(al, a_lo.shape), a_hi, a_lo)
    return ((zbits >> _U64(32)).astype(jnp.uint32),
            (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32))


def exgemm_sharded(a, b, mesh: Mesh | None = None, axis: str = AXIS,
                   impl: str | None = None, alpha: float = 1.0,
                   beta: float = 0.0, c=None, transa: str = "N",
                   transb: str = "N"):
    """Reproducible C = beta*C + alpha*op(A)@op(B) with op(A) (and C)
    row-sharded over the mesh -> bits (m, n).  Uneven m is zero-padded
    (exact)."""
    mesh = mesh or make_mesh()
    nd = mesh.devices.size
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ab, bb, cb, (ah, al), (bh, bl), beta_mode = _gemm_operands(
        a, b, alpha, beta, c, transa, transb)
    m = ab.hi.shape[0]
    m_pad = -(-m // nd) * nd
    ab = F64Bits(hi=_pad_axis(ab.hi, m_pad), lo=_pad_axis(ab.lo, m_pad))
    cb = F64Bits(hi=_pad_axis(cb.hi, m_pad), lo=_pad_axis(cb.lo, m_pad))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(), P(), P(axis), P(axis)),
             out_specs=P(axis), check_vma=False)
    def run(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo):
        z_hi, z_lo = _alpha_fold(a_hi, a_lo, ah, al)
        return _local_gemm_bits(z_hi, z_lo, b_hi, b_lo, impl,
                                c_hi, c_lo, bh, bl, beta_mode)

    return jax.jit(run)(ab.hi, ab.lo, bb.hi, bb.lo, cb.hi, cb.lo)[:m]


def exgemm_sharded_2d(a, b, mesh: Mesh | None = None,
                      impl: str | None = None, alpha: float = 1.0,
                      beta: float = 0.0, c=None, transa: str = "N",
                      transb: str = "N"):
    """Reproducible C = beta*C + alpha*op(A)@op(B) over a 2-D (rows, cols)
    mesh.

    The classic tensor-parallel BLAS-3 layout: A row-sharded, B
    column-sharded, C block-sharded on return; k stays on-device so each
    block is produced by the fast local kernel with no cross-device
    reduction.  Bit-identical to the single-device result for every mesh
    shape (each C element is the same exact accumulation).
    """
    mesh = mesh or make_mesh_2d((1, len(jax.devices())),
                                axes=("rows", "cols"))
    row_ax, col_ax = mesh.axis_names
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ab, bb, cb, (ah, al), (bh, bl), beta_mode = _gemm_operands(
        a, b, alpha, beta, c, transa, transb)
    m = ab.hi.shape[0]
    n = bb.hi.shape[1]
    m_pad = -(-m // mesh.shape[row_ax]) * mesh.shape[row_ax]
    n_pad = -(-n // mesh.shape[col_ax]) * mesh.shape[col_ax]
    ab = F64Bits(hi=_pad_axis(ab.hi, m_pad), lo=_pad_axis(ab.lo, m_pad))
    bb = F64Bits(hi=_pad_axis(bb.hi, n_pad, 1),
                 lo=_pad_axis(bb.lo, n_pad, 1))
    cb = F64Bits(hi=_pad_axis(_pad_axis(cb.hi, m_pad), n_pad, 1),
                 lo=_pad_axis(_pad_axis(cb.lo, m_pad), n_pad, 1))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(row_ax), P(row_ax), P(None, col_ax),
                       P(None, col_ax), P(row_ax, col_ax),
                       P(row_ax, col_ax)),
             out_specs=P(row_ax, col_ax), check_vma=False)
    def run(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo):
        z_hi, z_lo = _alpha_fold(a_hi, a_lo, ah, al)
        return _local_gemm_bits(z_hi, z_lo, b_hi, b_lo, impl,
                                c_hi, c_lo, bh, bl, beta_mode)

    return jax.jit(run)(ab.hi, ab.lo, bb.hi, bb.lo,
                        cb.hi, cb.lo)[:m, :n]


def exgemm_sharded_k(a, b, mesh: Mesh | None = None, axis: str = AXIS,
                     alpha: float = 1.0, beta: float = 0.0, c=None,
                     transa: str = "N", transb: str = "N"):
    """Reproducible C = beta*C + alpha*op(A)@op(B) with the k (reduction)
    axis sharded.

    Each device deposits its k-slice of products into exact per-element
    limb accumulators; an integer ``psum`` merges them (the BLAS-3 analog
    of the reference's limb-wise MPI_Reduce), the exact beta*C deposit
    runs replicated after the merge, and one rounding finishes.  Mesh
    size cannot change a bit by construction.  Uses the XLA accumulator
    path (the Pallas GEMM kernels round in-kernel and so have no
    pre-round limb output); intended as the decomposition-invariance
    anchor, not a throughput path -- shard rows/cols for speed.
    """
    mesh = mesh or make_mesh()
    nd = mesh.devices.size
    ab, bb, cb, (ah, al), (bh, bl), beta_mode = _gemm_operands(
        a, b, alpha, beta, c, transa, transb)
    m, k = ab.hi.shape
    n = bb.hi.shape[1]
    k_pad = -(-k // nd) * nd
    ab = F64Bits(hi=_pad_axis(ab.hi, k_pad, 1),
                 lo=_pad_axis(ab.lo, k_pad, 1))
    bb = F64Bits(hi=_pad_axis(bb.hi, k_pad), lo=_pad_axis(bb.lo, k_pad))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis), P(None, axis), P(axis), P(axis),
                       P(), P()),
             out_specs=P(), check_vma=False)
    def run(a_hi, a_lo, b_hi, b_lo, c_hi, c_lo):
        from ..ops.exgemm import apply_beta_gemm, gemm_acc_xla

        z_hi, z_lo = _alpha_fold(a_hi, a_lo, ah, al)
        limbs, special = gemm_acc_xla(z_hi, z_lo, b_hi, b_lo)
        limbs = jax.lax.psum(limbs, axis)
        special = jax.lax.psum(special, axis)
        # replicated exact beta*C deposit: identical on every device
        limbs, special = apply_beta_gemm(limbs, special, bh, bl,
                                         c_hi, c_lo, beta_mode)
        return round_rows(limbs, special).reshape(m, n)

    return jax.jit(run)(ab.hi, ab.lo, bb.hi, bb.lo, cb.hi, cb.lo)
