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
from ..core.ieee import F64Bits, split_f64, transpose_bits
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
    limbs, special = apply_beta_gemm(limbs, special, beta_hi, beta_lo,
                                     c_hi, c_lo, beta_mode)
    bits = round_rows(limbs, special)
    return bits.reshape(a_hi.shape[0], b_hi.shape[1])


def apply_beta_gemm(limbs, special, beta_hi, beta_lo, c_hi, c_lo,
                    beta_mode: str):
    """Deposit the exact beta*C term into per-element (m*n, L) limb
    accumulators: C exactly for beta == 1, the exact 106-bit product
    otherwise (the XLA-level analog of the Pallas kernel's in-kernel
    beta deposit; reference EFT beta cases, ExGEMV.Superacc.cl:259-293)."""
    if beta_mode == "one":
        from .exgemv import deposit_terms_rows

        return deposit_terms_rows(
            limbs, special, c_hi.reshape(-1), c_lo.reshape(-1))
    if beta_mode == "general":
        # exact 106-bit product beta*c via a product deposit per element
        mn = limbs.shape[0]
        L = DOT_FORMAT.n_limbs
        t = dep.product_terms(
            jnp.broadcast_to(beta_hi, c_hi.shape).reshape(-1),
            jnp.broadcast_to(beta_lo, c_lo.shape).reshape(-1),
            c_hi.reshape(-1), c_lo.reshape(-1), DOT_FORMAT.offset_bits)
        row_ids = jnp.arange(mn, dtype=jnp.int32)
        limbs = dep.segment_deposit_products(
            limbs.reshape(-1), t, row_ids * L, L).reshape(mn, L)
        special = special + jnp.stack([t["nan"], t["pinf"], t["ninf"]],
                                      axis=-1)
    return limbs, special


def _validate_fpe(fpe: int):
    if not (0 <= int(fpe) <= 8):
        raise ValueError(f"exgemm: fpe must be in [0, 8], got {fpe}")


# ---------------------------------------------------------------------------
# Jittable auto dispatch: MXU slice ladder with device-resident coverage
# ---------------------------------------------------------------------------

# (sa, sb) slice-count rungs, ordered by matmul cost (sa+1)*(sb+1); the
# cheapest pair with spread_a <= 8*sa and spread_b <= 8*sb (and beta*c
# coverage) wins.  Asymmetric pairs serve mixed-spread operands: narrow
# A x wide B runs (8, 12) = 117 products instead of the symmetric 169.
# The wide rungs (20..64 slices = 160..512 anchored bits per side) are
# the round-3/4 dynamic-range extension: cost grows as the product of
# the slice counts -- the information-theoretic floor for a dense
# byte-slice decomposition (each side needs spread/8 byte planes and
# every plane pair is a distinct exact int8 matmul) -- so e.g.
# ill-conditioned data at c=1e50 (spread ~137-166 bits) runs the
# (20, 20) or (24, 24) rung at ~1/5 the covered-data rate instead of
# falling ~500x to the VPU kernel.  The top rungs (40/48 slices =
# 320/384 bits) keep even extreme spreads well above the VPU fallback
# (~0.1 TFLOP-equiv/s at (48, 48) vs ~0.006 exact-VPU); only data whose
# per-row/column spread exceeds 384 bits still leaves the MXU.  (48, 48)
# is the VMEM ceiling: the class scratch grows as (sa+sb+1) rows and a
# (64, 64) rung no longer fits the ~14 MB budget at bn = 128 -- the
# minimum lane width Pallas TPU can lower.
_MXU_LADDER = ((8, 8), (8, 12), (12, 8), (8, 16), (16, 8),
               (12, 12), (12, 16), (16, 12), (16, 16),
               (16, 20), (20, 16), (20, 20), (24, 24), (28, 28), (32, 32),
               (40, 40), (48, 48))


def _decode_indicators(hi, lo):
    from ..core.ieee import decode_fields

    sign, expf, mhi, mlo = decode_fields(hi, lo)
    zero, inf, nan = dep.classify(expf, mhi, mlo)
    fin = jnp.logical_not(jnp.logical_or(zero,
                                         jnp.logical_or(inf, nan)))
    pos = sign == 0
    return dict(
        zero=zero, nan=nan,
        pinf=jnp.logical_and(inf, pos),
        ninf=jnp.logical_and(inf, jnp.logical_not(pos)),
        finp=jnp.logical_and(fin, pos),
        finn=jnp.logical_and(fin, jnp.logical_not(pos)),
    )


def _special_masks_matmul(z_hi, z_lo, b_hi, b_lo):
    """Per-output-element special verdicts via f32 indicator matmuls.

    Returns bool (m, n) arrays (nan_pairs, pinf_pairs, ninf_pairs) matching
    the special-counting semantics of dep.product_terms / round_rows (only
    count > 0 matters, so overlap overcounting is harmless).  Counts stay
    exact in f32 for k < 2^24.
    """
    A = _decode_indicators(z_hi, z_lo)
    B = _decode_indicators(b_hi, b_lo)
    f = lambda x: x.astype(jnp.float32)  # noqa: E731
    mm = lambda x, y: jnp.dot(f(x), f(y),  # noqa: E731
                              preferred_element_type=jnp.float32)
    inf_a = jnp.logical_or(A["pinf"], A["ninf"])
    inf_b = jnp.logical_or(B["pinf"], B["ninf"])
    nan_c = (jnp.sum(f(A["nan"]), axis=1, keepdims=True)
             + jnp.sum(f(B["nan"]), axis=0, keepdims=True)
             + mm(inf_a, B["zero"]) + mm(A["zero"], inf_b))
    posb = jnp.logical_or(B["finp"], B["pinf"])
    negb = jnp.logical_or(B["finn"], B["ninf"])
    pinf_c = (mm(A["pinf"], posb) + mm(A["ninf"], negb)
              + mm(A["finp"], B["pinf"]) + mm(A["finn"], B["ninf"]))
    ninf_c = (mm(A["pinf"], negb) + mm(A["ninf"], posb)
              + mm(A["finp"], B["ninf"]) + mm(A["finn"], B["pinf"]))
    return nan_c > 0, pinf_c > 0, ninf_c > 0


def _mxu_c_cover(c_hi, c_lo, beta_hi, beta_lo, ea0, fb0, sa: int, sb: int):
    """Device bool: every finite nonzero beta*c product fits the relative
    accumulator window [anchor - 8(sa+sb), anchor + MXU_BETA_HEAD]."""
    from ..core.ieee import decode_fields
    from .kernels.gemm_mxu import MXU_BETA_HEAD

    _, expf_c, mhi_c, mlo_c = decode_fields(c_hi, c_lo)
    zero_c, inf_c, nan_c = dep.classify(expf_c, mhi_c, mlo_c)
    _, expf_b, mhi_b, mlo_b = decode_fields(beta_hi, beta_lo)
    zero_b, inf_b, nan_b = dep.classify(expf_b, mhi_b, mlo_b)

    e_lsb_c = jnp.maximum(expf_c, 1) - jnp.int32(1075)
    e_lsb_b = jnp.maximum(expf_b, 1) - jnp.int32(1075)
    # msb(beta*c) <= msb(beta) + msb(c) + 1 <= (e_lsb + 52 each) + 1
    e_msb = e_lsb_b + e_lsb_c + jnp.int32(106)
    e_lsb = e_lsb_b + e_lsb_c

    e_base = ea0[:, None] + fb0[None, :] + jnp.int32(2)
    rel0 = jnp.int32(8 * (sa + sb))
    valid = jnp.logical_not(jnp.logical_or(
        jnp.logical_or(zero_c, expf_c == 0x7FF),
        jnp.logical_or(zero_b, expf_b == 0x7FF)))
    lo_ok = e_lsb + rel0 - e_base >= 0
    hi_ok = e_msb - e_base <= jnp.int32(MXU_BETA_HEAD)
    ok = jnp.logical_or(jnp.logical_not(valid),
                        jnp.logical_and(lo_ok, hi_ok))
    return jnp.all(ok)


def _beta_c_special_flags(c_hi, c_lo, beta_hi, beta_lo):
    """Elementwise (nan, pinf, ninf) bools of the beta*c term."""
    t = dep.product_terms(
        jnp.broadcast_to(beta_hi, c_hi.shape),
        jnp.broadcast_to(beta_lo, c_lo.shape), c_hi, c_lo, 0)
    return t["nan"] > 0, t["pinf"] > 0, t["ninf"] > 0


@partial(jax.jit, static_argnames=("beta_mode",))
def _gemm_bits_auto(a_hi, a_lo, b_hi, b_lo, alpha_hi, alpha_lo,
                    beta_hi, beta_lo, c_hi, c_lo, beta_mode: str):
    """One jit: coverage analysis on-device, lax.switch over the MXU slice
    ladder with exact VPU fallback, per-element special override.  No host
    round trips; bit-identical across all branches by construction."""
    from .kernels.gemm_mxu import analyze_gemm_operands, gemm_bits_mxu
    from .kernels.gemm_kernel import gemm_bits_pallas
    from ..core.rounding import QNAN_BITS, NINF_BITS, PINF_BITS

    zbits = f64_mul(jnp.broadcast_to(alpha_hi, a_hi.shape),
                    jnp.broadcast_to(alpha_lo, a_lo.shape), a_hi, a_lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    ea, fb, spread_a, spread_b, has_special_zb = analyze_gemm_operands(
        z_hi, z_lo, b_hi, b_lo)
    ea0 = jnp.where(ea < -9000, jnp.int32(0), ea)
    fb0 = jnp.where(fb < -9000, jnp.int32(0), fb)

    if beta_mode != "zero":
        covers = [
            _mxu_c_cover(c_hi, c_lo, beta_hi, beta_lo, ea0, fb0, sa, sb)
            for sa, sb in _MXU_LADDER
        ]
        c_nan, c_pinf, c_ninf = _beta_c_special_flags(
            c_hi, c_lo, beta_hi, beta_lo)
        has_special_c = jnp.logical_or(
            jnp.any(c_nan), jnp.logical_or(jnp.any(c_pinf),
                                           jnp.any(c_ninf)))
    else:
        covers = [jnp.bool_(True)] * len(_MXU_LADDER)
        c_nan = c_pinf = c_ninf = jnp.zeros(
            (a_hi.shape[0], b_hi.shape[1]), jnp.bool_)
        has_special_c = jnp.bool_(False)

    def mxu_branch(sa, sb):
        def f():
            hi, lo = gemm_bits_mxu(z_hi, z_lo, b_hi, b_lo, c_hi, c_lo,
                                   beta_hi, beta_lo, beta_mode,
                                   sa=sa, sb=sb)
            return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)
        return f

    def vpu_branch():
        hi, lo = gemm_bits_pallas(z_hi, z_lo, b_hi, b_lo, c_hi, c_lo,
                                  beta_hi, beta_lo, beta_mode)
        return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)

    idx = jnp.int32(len(_MXU_LADDER))  # default: VPU
    for rung, ((sa, sb), cov) in reversed(list(enumerate(zip(_MXU_LADDER,
                                                             covers)))):
        ok = jnp.logical_and(
            jnp.logical_and(spread_a <= 8 * sa, spread_b <= 8 * sb), cov)
        idx = jnp.where(ok, jnp.int32(rung), idx)

    bits = jax.lax.switch(
        idx, [mxu_branch(sa, sb) for sa, sb in _MXU_LADDER] + [vpu_branch])

    # Per-element special override for the MXU branches (the VPU kernel
    # handles specials natively).  Matmul-based pair counts run only when
    # specials are actually present.
    any_special = jnp.logical_or(has_special_zb, has_special_c)

    def apply_override(bits):
        nan_p, pinf_p, ninf_p = _special_masks_matmul(z_hi, z_lo,
                                                      b_hi, b_lo)
        nan_m = jnp.logical_or(nan_p, c_nan)
        pos_m = jnp.logical_or(pinf_p, c_pinf)
        neg_m = jnp.logical_or(ninf_p, c_ninf)
        is_nan = jnp.logical_or(nan_m, jnp.logical_and(pos_m, neg_m))
        out = jnp.where(neg_m, NINF_BITS, bits)
        out = jnp.where(pos_m, PINF_BITS, out)
        out = jnp.where(is_nan, QNAN_BITS, out)
        return out

    bits = jax.lax.cond(
        jnp.logical_and(any_special, idx < len(_MXU_LADDER)),
        apply_override, lambda b: b, bits)
    return bits


def exgemm_bits(transa: str, transb: str, alpha: float, a, b,
                beta: float = 1.0, c=None, fpe: int = 3,
                early_exit: bool = False, impl: str | None = None,
                m: int | None = None, n: int | None = None,
                k: int | None = None, lda: int | None = None,
                ldb: int | None = None, ldc: int | None = None):
    _validate_fpe(fpe)
    if lda is not None or ldb is not None or ldc is not None:
        from .exgemv import _apply_ld

        if m is None or n is None or k is None:
            raise ValueError("exgemm: ld* require explicit m, n, k")
        # stored (pre-op) shapes follow BLAS: A is (m, k) unless transa
        if lda is not None:
            ra, ca = (m, k) if transa.upper() == "N" else (k, m)
            a = _apply_ld(a, ra, ca, lda)
        if ldb is not None:
            rb, cb = (k, n) if transb.upper() == "N" else (n, k)
            b = _apply_ld(b, rb, cb, ldb)
        if ldc is not None and c is not None:
            c = _apply_ld(c, m, n, ldc)
    ab = split_f64(a)
    bb = split_f64(b)
    if transa.upper() == "T":
        ab = transpose_bits(ab)
    if transb.upper() == "T":
        bb = transpose_bits(bb)
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

    if impl is None:
        impl = "mxu" if jax.default_backend() == "tpu" else "xla"

    if impl == "mxu":
        # Fully jittable auto path: on-device coverage analysis selects a
        # slice-count rung or the exact VPU fallback via lax.switch; no
        # host round trips (all branches produce identical bits).
        # k above the MXU cap (top-limb growth bound, gemm_mxu._renorm_rel)
        # runs the exact VPU kernel instead.
        if ab.hi.shape[1] <= (1 << 22) - 2048:
            return _gemm_bits_auto(ab.hi, ab.lo, bb.hi, bb.lo, ah, al,
                                   bh, bl, cb.hi, cb.lo, beta_mode)
        impl = "pallas"

    return _gemm_bits_jit(ab.hi, ab.lo, bb.hi, bb.lo, ah, al, bh, bl,
                          cb.hi, cb.lo, impl, beta_mode)


def exgemm(transa: str, transb: str, alpha: float, a, b, beta: float = 1.0,
           c=None, fpe: int = 3, early_exit: bool = False,
           impl: str | None = None, m: int | None = None,
           n: int | None = None, k: int | None = None,
           lda: int | None = None, ldb: int | None = None,
           ldc: int | None = None) -> np.ndarray:
    """Reproducible C := beta*C + alpha*op(A)@op(B) (reference default:
    C += A@B).  Returns a new numpy array.

    Mirrors the full reference signature (include/blas3.hpp:56): flat
    column-major buffers are accepted with ``m``/``n``/``k`` and
    ``lda``/``ldb``/``ldc``."""
    if int(fpe) == 1:
        from .. import baselines

        ax = np.asarray(a).T if transa.upper() == "T" else np.asarray(a)
        bx = np.asarray(b).T if transb.upper() == "T" else np.asarray(b)
        return baselines.gemm_baseline(alpha * ax, bx,
                                       None if c is None else beta
                                       * np.asarray(c))
    bits = exgemm_bits(transa, transb, alpha, a, b, beta=beta, c=c,
                       fpe=fpe, early_exit=early_exit, impl=impl,
                       m=m, n=n, k=k, lda=lda, ldb=ldb, ldc=ldc)
    return np.asarray(bits).view(np.uint64).view(np.float64)
