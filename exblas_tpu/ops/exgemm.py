"""ExGEMM: C := C + A*B with exactly-accumulated, reproducible dot products.

API mirrors reference include/blas3.hpp:56 ``exgemm(transa, transb, m, n, k,
alpha, a, lda, b, ldb, beta, c, ldc, fpe, early_exit)``.  The reference
kernel's effective semantics are ``C += A*B`` -- alpha/beta appear in its
signature but are unused (reference ExGEMM.Superacc.cl:338; SURVEY §2.3).
We implement the full semantics in the ExGEMV style and default to the
reference's behavior:

* ``z_ik = fl(alpha * a_ik)`` (one correctly-rounded multiply; exact when
  alpha == 1);
* ``acc_ij = sum_k exact(z_ik * b_kj) (+ exact c_ij when beta == 1, or the
  exact 106-bit product beta*c_ij otherwise)``;
* ``C_ij = Round(acc_ij)`` -- one correctly-rounded conversion per element.

Bitwise identical under any k-tiling, loop order, or mesh sharding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import deposit as dep
from ..core.f64ops import f64_mul
from ..core.ieee import F64Bits, split_f64
from ..core.types import DOT_FORMAT
from .exgemv import round_rows, _scalar_bits

_I64 = jnp.int64
_U64 = jnp.uint64

__all__ = ["exgemm", "exgemm_bits"]


def gemm_acc_xla(a_hi, a_lo, b_hi, b_lo):
    """Exact (m*n, L) limb accumulators for A@B at the XLA level.

    Correctness anchor: O(m*k*n) segment-sum deposits; use the Pallas kernel
    for real sizes.
    """
    m, k = a_hi.shape
    k2, n = b_hi.shape
    L = DOT_FORMAT.n_limbs
    t = dep.product_terms(
        a_hi[:, :, None], a_lo[:, :, None],
        b_hi[None, :, :], b_lo[None, :, :], DOT_FORMAT.offset_bits,
    )  # all (m, k, n)
    out_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (m, k, n), 0) * n
        + jax.lax.broadcasted_iota(jnp.int32, (m, k, n), 2)
    )
    limbs = dep.segment_deposit_products(
        jnp.zeros((m * n * L,), _I64), t, out_ids * L, L)
    special = jnp.stack(
        [jnp.sum(t["nan"], axis=1).reshape(-1),
         jnp.sum(t["pinf"], axis=1).reshape(-1),
         jnp.sum(t["ninf"], axis=1).reshape(-1)], axis=-1,
    )
    return limbs.reshape(m * n, L), special


@partial(jax.jit, static_argnames=("impl", "beta_mode"))
def _gemm_bits_jit(a_hi, a_lo, b_hi, b_lo, alpha_hi, alpha_lo,
                   beta_hi, beta_lo, c_hi, c_lo, impl: str, beta_mode: str):
    # z = fl(alpha * A)
    zbits = f64_mul(jnp.broadcast_to(alpha_hi, a_hi.shape),
                    jnp.broadcast_to(alpha_lo, a_lo.shape), a_hi, a_lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    if impl == "pallas":
        # The kernel deposits beta*C exactly and rounds on-device.
        from .kernels.gemm_kernel import gemm_bits_pallas

        hi, lo = gemm_bits_pallas(z_hi, z_lo, b_hi, b_lo, c_hi, c_lo,
                                  beta_hi, beta_lo, beta_mode)
        return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)

    limbs, special = gemm_acc_xla(z_hi, z_lo, b_hi, b_lo)

    m, n = a_hi.shape[0], b_hi.shape[1]
    if beta_mode == "one":
        from .exgemv import deposit_terms_rows

        limbs, special = deposit_terms_rows(
            limbs, special, c_hi.reshape(-1), c_lo.reshape(-1))
    elif beta_mode == "general":
        from .exgemv import deposit_terms_rows

        # exact 106-bit product beta*c via a product deposit per element
        L = DOT_FORMAT.n_limbs
        t = dep.product_terms(
            jnp.broadcast_to(beta_hi, c_hi.shape).reshape(-1),
            jnp.broadcast_to(beta_lo, c_lo.shape).reshape(-1),
            c_hi.reshape(-1), c_lo.reshape(-1), DOT_FORMAT.offset_bits)
        row_ids = jnp.arange(m * n, dtype=jnp.int32)
        limbs = dep.segment_deposit_products(
            limbs.reshape(-1), t, row_ids * L, L).reshape(m * n, L)
        special = special + jnp.stack([t["nan"], t["pinf"], t["ninf"]],
                                      axis=-1)

    bits = round_rows(limbs, special)
    return bits.reshape(m, n)


def _validate_fpe(fpe: int):
    if not (0 <= int(fpe) <= 8):
        raise ValueError(f"exgemm: fpe must be in [0, 8], got {fpe}")


def exgemm_bits(transa: str, transb: str, alpha: float, a, b,
                beta: float = 1.0, c=None, fpe: int = 3,
                early_exit: bool = False, impl: str | None = None):
    _validate_fpe(fpe)
    ab = split_f64(a)
    bb = split_f64(b)
    if transa.upper() == "T":
        ab = F64Bits(hi=ab.hi.T, lo=ab.lo.T)
    if transb.upper() == "T":
        bb = F64Bits(hi=bb.hi.T, lo=bb.lo.T)
    m, k = ab.hi.shape
    k2, n = bb.hi.shape
    if k != k2:
        raise ValueError(f"exgemm: inner dims mismatch {k} vs {k2}")

    beta_mode = "zero" if (beta == 0.0 or c is None) else (
        "one" if beta == 1.0 else "general")
    if c is not None:
        cb = split_f64(c)
        if cb.hi.shape != (m, n):
            raise ValueError(f"exgemm: c must have shape ({m}, {n})")
    else:
        cb = F64Bits(hi=jnp.zeros((m, n), jnp.uint32),
                     lo=jnp.zeros((m, n), jnp.uint32))

    ah, al = _scalar_bits(alpha)
    bh, bl = _scalar_bits(beta)

    if impl is None and jax.default_backend() == "tpu":
        impl = "mxu" if beta_mode == "zero" else "pallas"
    elif impl is None:
        impl = "xla"

    if impl == "mxu":
        bits = _try_gemm_mxu(ab, bb, ah, al, beta_mode)
        if bits is not None:
            return bits
        impl = "pallas"  # not coverable: exact VPU fallback, same bits

    return _gemm_bits_jit(ab.hi, ab.lo, bb.hi, bb.lo, ah, al, bh, bl,
                          cb.hi, cb.lo, impl, beta_mode)


@partial(jax.jit, static_argnames=())
def _mxu_precheck(a_hi, a_lo, b_hi, b_lo, alpha_hi, alpha_lo):
    from .kernels.gemm_mxu import analyze_gemm_operands

    zbits = f64_mul(jnp.broadcast_to(alpha_hi, a_hi.shape),
                    jnp.broadcast_to(alpha_lo, a_lo.shape), a_hi, a_lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)
    _, _, spread, has_special = analyze_gemm_operands(z_hi, z_lo, b_hi, b_lo)
    return z_hi, z_lo, spread, has_special


def _try_gemm_mxu(ab, bb, ah, al, beta_mode):
    """Dispatch the exact MXU slice path when the data is coverable.

    Returns bits (m, n) uint64, or None to fall back (wide dynamic range
    within a row/column, special values, or beta != 0)."""
    if beta_mode != "zero":
        return None
    from .kernels.gemm_mxu import gemm_bits_mxu

    z_hi, z_lo, spread, has_special = _mxu_precheck(
        ab.hi, ab.lo, bb.hi, bb.lo, ah, al)
    spread = int(spread)  # = max(anchor - lsb + 1); covered iff <= 8*slices
    if bool(has_special):
        return None
    n_slices = max(8, -(-spread // 8))
    if n_slices > 16:
        return None
    hi, lo = gemm_bits_mxu(z_hi, z_lo, bb.hi, bb.lo,
                           sa=n_slices, sb=n_slices)
    return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)


def exgemm(transa: str, transb: str, alpha: float, a, b, beta: float = 1.0,
           c=None, fpe: int = 3, early_exit: bool = False,
           impl: str | None = None) -> np.ndarray:
    """Reproducible C := beta*C + alpha*op(A)@op(B) (reference default:
    C += A@B).  Returns a new numpy array."""
    if int(fpe) == 1:
        from .. import baselines

        ax = np.asarray(a).T if transa.upper() == "T" else np.asarray(a)
        bx = np.asarray(b).T if transb.upper() == "T" else np.asarray(b)
        return baselines.gemm_baseline(alpha * ax, bx,
                                       None if c is None else beta
                                       * np.asarray(c))
    bits = exgemm_bits(transa, transb, alpha, a, b, beta=beta, c=c,
                       fpe=fpe, early_exit=early_exit, impl=impl)
    return np.asarray(bits).view(np.uint64).view(np.float64)
