"""ExGEMV: y := alpha*A*x + beta*y with reproducible, exactly-accumulated
row dot products.

API mirrors reference include/blas2.hpp:95 ``exgemv(transa, m, n, alpha, a,
lda, x, incx, beta, y, incy, fpe, early_exit)``.

Semantics (bit-compatible with the reference kernel ExGEMV.Superacc.cl:192-293):
* ``z_j = fl(alpha * x_j)`` -- alpha is applied as one correctly-rounded fp64
  multiply *before* the exact accumulation (the reference uses a plain fp64
  multiply, which is the same correctly-rounded operation);
* each product ``a_ij * z_j`` is accumulated *exactly* (106-bit integer
  product into the dot-format superaccumulator);
* ``beta == 0``: no y term; ``beta == 1``: y_i deposited exactly; otherwise
  the exact 106-bit product ``beta * y_i`` is deposited (the reference's EFT
  handling of the three beta cases);
* ``y_i = Round(acc_i)`` correctly rounded.

``fpe``/``early_exit`` select tiling variants only; results are identical
(fpe == 1 selects the non-reproducible fp64 control, mirroring the
reference's DGEMV.cl baseline dispatch at ExGEMV.cpp:92-94).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import deposit as dep
from ..core.f64ops import f64_mul
from ..core.ieee import F64Bits, split_f64, transpose_bits
from ..core.rounding import round_digits_to_f64_bits, canonicalize_digits
from ..core.rounding import QNAN_BITS, NINF_BITS, PINF_BITS
from ..core.types import DOT_FORMAT

_I64 = jnp.int64
_U64 = jnp.uint64

__all__ = ["exgemv", "exgemv_bits"]


def _scalar_bits(v: float):
    u = np.float64(v).view(np.uint64)
    return (jnp.uint32(int(u) >> 32), jnp.uint32(int(u) & 0xFFFFFFFF))


def dot_rows_acc_xla(a_hi, a_lo, z_hi, z_lo):
    """Exact per-row dot deposits at the XLA level (correctness anchor).

    a: (m, n) bit pair; z: (n,) bit pair.  Returns (limbs int64 (m, L),
    special int32 (m, 3)).
    """
    m, n = a_hi.shape
    L = DOT_FORMAT.n_limbs
    t = dep.product_terms(
        a_hi, a_lo, z_hi[None, :] if z_hi.ndim == 1 else z_hi,
        z_lo[None, :] if z_lo.ndim == 1 else z_lo, DOT_FORMAT.offset_bits
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    limbs = dep.segment_deposit_products(
        jnp.zeros((m * L,), _I64), t, row_ids * L, L)
    special = jnp.stack(
        [jnp.sum(t["nan"], axis=1), jnp.sum(t["pinf"], axis=1),
         jnp.sum(t["ninf"], axis=1)], axis=-1,
    )
    return limbs.reshape(m, L), special


def deposit_terms_rows(limbs, special, hi, lo):
    """Exactly deposit one double per row into (m, L) limb rows (sum terms)."""
    m, L = limbs.shape
    t = dep.sum_terms(hi, lo, DOT_FORMAT.offset_bits)
    row_ids = jnp.arange(m, dtype=jnp.int32)
    flat = limbs.reshape(-1)
    for off, piece in enumerate(t["pieces"]):
        seg = row_ids * L + t["q"] + off
        flat = flat + jax.ops.segment_sum(
            piece.astype(_I64), seg, num_segments=m * L
        )
    extra = jnp.stack([t["nan"], t["pinf"], t["ninf"]], axis=-1)
    return flat.reshape(m, L), special + extra


def round_rows(limbs, special):
    """Batched correctly-rounded conversion of per-row accumulators."""
    digits, negative = canonicalize_digits(limbs)
    bits = round_digits_to_f64_bits(digits, negative, DOT_FORMAT)
    nan_c, pos_c, neg_c = special[..., 0], special[..., 1], special[..., 2]
    is_nan = jnp.logical_or(nan_c > 0,
                            jnp.logical_and(pos_c > 0, neg_c > 0))
    bits = jnp.where(neg_c > 0, NINF_BITS, bits)
    bits = jnp.where(pos_c > 0, PINF_BITS, bits)
    bits = jnp.where(is_nan, QNAN_BITS, bits)
    return bits


@partial(jax.jit, static_argnames=("impl", "beta_mode", "rows"))
def _gemv_bits_jit(a_hi, a_lo, x_hi, x_lo, alpha_hi, alpha_lo,
                   beta_hi, beta_lo, y_hi, y_lo,
                   impl: str, beta_mode: str, rows: int):
    # z = fl(alpha * x)
    z_bits = f64_mul(
        jnp.broadcast_to(alpha_hi, x_hi.shape),
        jnp.broadcast_to(alpha_lo, x_lo.shape), x_hi, x_lo)
    z_hi = (z_bits >> _U64(32)).astype(jnp.uint32)
    z_lo = (z_bits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    if impl == "pallas":
        from .kernels.gemv_kernel import gemv_rows_acc_pallas

        limbs, special = gemv_rows_acc_pallas(a_hi, a_lo, z_hi, z_lo,
                                              k_rows=rows)
    else:
        limbs, special = dot_rows_acc_xla(a_hi, a_lo, z_hi, z_lo)

    limbs, special = _apply_beta_rows(limbs, special, beta_hi, beta_lo,
                                      y_hi, y_lo, beta_mode)
    return round_rows(limbs, special)


def _apply_beta_rows(limbs, special, beta_hi, beta_lo, y_hi, y_lo,
                     beta_mode: str):
    """Deposit the beta term into per-row accumulators: y_i exactly for
    beta == 1, the exact 106-bit product beta*y_i for general beta
    (mirroring the reference's EFT beta cases, ExGEMV.Superacc.cl:259-293)."""
    if beta_mode == "one":
        return deposit_terms_rows(limbs, special, y_hi, y_lo)
    if beta_mode == "general":
        m = y_hi.shape[0]
        L = DOT_FORMAT.n_limbs
        t = dep.product_terms(
            jnp.broadcast_to(beta_hi, y_hi.shape),
            jnp.broadcast_to(beta_lo, y_lo.shape),
            y_hi, y_lo, DOT_FORMAT.offset_bits)
        row_ids = jnp.arange(m, dtype=jnp.int32)
        limbs = dep.segment_deposit_products(
            limbs.reshape(-1), t, row_ids * L, L).reshape(m, L)
        special = special + jnp.stack(
            [t["nan"], t["pinf"], t["ninf"]], axis=-1)
    return limbs, special


def _validate_fpe(fpe: int):
    if not (0 <= int(fpe) <= 8):
        raise ValueError(f"exgemv: fpe must be in [0, 8], got {fpe}")


# ---------------------------------------------------------------------------
# Jittable auto dispatch: MXU byte-plane ladder with device-resident coverage
# ---------------------------------------------------------------------------

# (nwa, nwz) word counts: 32*nwa / 32*nwz anchored bits per side.  The
# ladder picks the narrowest rung covering BOTH the per-row A spreads and
# the z spread; data past 512/224 bits falls back to the exact VPU
# kernel.  Unlike GEMM (whose matmul count grows as the product of the
# slice counts), GEMV stays VPU-decode/HBM-bound: the wide rungs cost
# only extra word-slicing ops per element (~8/word + a log word-shifter)
# plus one int8 matmul per word, so even 512-bit rows run at a large
# fraction of the covered rate instead of dropping to the VPU kernel
# (round-3 extension to 256; round-4 to 512.  The z side is capped at
# 224 bits = 29 digits by the 32-sublane z-digit block, make_z_digits).
_GEMV_RUNGS = ((2, 2), (3, 3), (4, 4), (5, 4), (6, 5), (8, 6),
               (12, 7), (16, 7))


def _gemv_special_rows(a_hi, a_lo, z_hi, z_lo):
    """Per-row (nan, pinf, ninf) bools of sum_k a_ik*z_k, matching the
    special semantics of dep.product_terms + round_rows.  Runs only under
    lax.cond when specials are present (it re-reads A)."""
    from .exgemm import _decode_indicators

    A = _decode_indicators(a_hi, a_lo)
    Z = _decode_indicators(z_hi, z_lo)
    zrow = {k: v[None, :] for k, v in Z.items()}
    inf_a = jnp.logical_or(A["pinf"], A["ninf"])
    inf_z = jnp.logical_or(zrow["pinf"], zrow["ninf"])
    nan_p = jnp.logical_or(
        jnp.logical_or(A["nan"], zrow["nan"]),
        jnp.logical_or(jnp.logical_and(inf_a, zrow["zero"]),
                       jnp.logical_and(A["zero"], inf_z)))
    posz = jnp.logical_or(zrow["finp"], zrow["pinf"])
    negz = jnp.logical_or(zrow["finn"], zrow["ninf"])
    pinf_p = jnp.logical_or(
        jnp.logical_or(jnp.logical_and(A["pinf"], posz),
                       jnp.logical_and(A["ninf"], negz)),
        jnp.logical_or(jnp.logical_and(A["finp"], zrow["pinf"]),
                       jnp.logical_and(A["finn"], zrow["ninf"])))
    ninf_p = jnp.logical_or(
        jnp.logical_or(jnp.logical_and(A["pinf"], negz),
                       jnp.logical_and(A["ninf"], posz)),
        jnp.logical_or(jnp.logical_and(A["finp"], zrow["ninf"]),
                       jnp.logical_and(A["finn"], zrow["pinf"])))
    return (jnp.any(nan_p, axis=1), jnp.any(pinf_p, axis=1),
            jnp.any(ninf_p, axis=1))


@partial(jax.jit, static_argnames=("beta_mode", "rows"))
def _gemv_bits_auto(a_hi, a_lo, x_hi, x_lo, alpha_hi, alpha_lo,
                    beta_hi, beta_lo, y_hi, y_lo, beta_mode: str,
                    rows: int):
    """One jit: on-device coverage analysis, lax.switch over the MXU
    byte-plane rung ladder with exact VPU fallback, per-row special
    override.  All branches produce identical bits by construction."""
    from .kernels.gemv_mxu import (analyze_gemv_rows, analyze_z,
                                   gemv_bits_mxu)

    zbits = f64_mul(
        jnp.broadcast_to(alpha_hi, x_hi.shape),
        jnp.broadcast_to(alpha_lo, x_lo.shape), x_hi, x_lo)
    z_hi = (zbits >> _U64(32)).astype(jnp.uint32)
    z_lo = (zbits & _U64(0xFFFFFFFF)).astype(jnp.uint32)

    ea, spread_a, has_spec_a = analyze_gemv_rows(a_hi, a_lo)
    f, spread_z, has_spec_z = analyze_z(z_hi, z_lo)
    ea0 = jnp.where(ea < -9000, jnp.int32(0), ea)
    f0 = jnp.where(f < -9000, jnp.int32(0), f)

    if beta_mode != "zero":
        t = dep.product_terms(
            jnp.broadcast_to(beta_hi, y_hi.shape),
            jnp.broadcast_to(beta_lo, y_lo.shape), y_hi, y_lo, 0)
        by_nan = t["nan"] > 0
        by_pinf = t["pinf"] > 0
        by_ninf = t["ninf"] > 0
        has_spec_by = jnp.any(jnp.logical_or(
            by_nan, jnp.logical_or(by_pinf, by_ninf)))
    else:
        by_nan = by_pinf = by_ninf = jnp.zeros(a_hi.shape[:1], jnp.bool_)
        has_spec_by = jnp.bool_(False)

    def mxu_branch(nwa, nwz):
        def fbr():
            hi, lo = gemv_bits_mxu(a_hi, a_lo, z_hi, z_lo, ea0, f0,
                                   y_hi, y_lo, beta_hi, beta_lo,
                                   beta_mode, nwa=nwa, nwz=nwz)
            return (hi.astype(_U64) << _U64(32)) | lo.astype(_U64)
        return fbr

    def vpu_branch():
        from .kernels.gemv_kernel import gemv_rows_acc_pallas

        limbs, special = gemv_rows_acc_pallas(a_hi, a_lo, z_hi, z_lo,
                                              k_rows=rows)
        limbs, special = _apply_beta_rows(limbs, special, beta_hi,
                                          beta_lo, y_hi, y_lo, beta_mode)
        return round_rows(limbs, special)

    idx = jnp.int32(len(_GEMV_RUNGS))  # default: VPU fallback
    for rung, (nwa, nwz) in reversed(list(enumerate(_GEMV_RUNGS))):
        ok = jnp.logical_and(spread_a <= 32 * nwa,
                             spread_z <= 32 * nwz)
        idx = jnp.where(ok, jnp.int32(rung), idx)

    bits = jax.lax.switch(
        idx, [mxu_branch(nwa, nwz) for nwa, nwz in _GEMV_RUNGS]
        + [vpu_branch])

    # Per-row special override for the MXU branches (the VPU kernel counts
    # specials natively); runs only when specials are actually present.
    any_special = jnp.logical_or(
        jnp.logical_or(has_spec_a, has_spec_z), has_spec_by)

    def apply_override(bits):
        nan_r, pinf_r, ninf_r = _gemv_special_rows(a_hi, a_lo, z_hi, z_lo)
        nan_m = jnp.logical_or(nan_r, by_nan)
        pos_m = jnp.logical_or(pinf_r, by_pinf)
        neg_m = jnp.logical_or(ninf_r, by_ninf)
        is_nan = jnp.logical_or(nan_m, jnp.logical_and(pos_m, neg_m))
        out = jnp.where(neg_m, NINF_BITS, bits)
        out = jnp.where(pos_m, PINF_BITS, out)
        out = jnp.where(is_nan, QNAN_BITS, out)
        return out

    bits = jax.lax.cond(
        jnp.logical_and(any_special, idx < len(_GEMV_RUNGS)),
        apply_override, lambda b: b, bits)
    return bits


def _variant_rows(fpe: int, early_exit: bool) -> int:
    # k_rows * RENORM_EVERY bounded by limb carry slack (see gemv_kernel):
    # 2 * (k_rows/8) * 21 * 2^20 < 2^31 - 2^21  =>  k_rows <= 384.
    base = {0: 128, 1: 128, 2: 64, 3: 256, 4: 96, 5: 160, 6: 192,
            7: 320, 8: 384}
    r = base[int(fpe)]
    return min(384, r * 2) if early_exit else r


def _apply_ld(a, m, n, lda):
    """Reinterpret a flat column-major buffer with leading dimension lda as
    the logical (m, n) matrix -- the BLAS convention of the reference
    signatures (include/blas2.hpp:57,95, blas3.hpp:56)."""
    buf = np.asarray(a, np.float64).reshape(-1)
    if lda < m or buf.size < lda * n:
        raise ValueError(f"lda={lda} too small for {m}x{n}")
    return buf[: lda * n].reshape(n, lda)[:, :m].T


def _apply_inc(v, n, inc, name):
    """BLAS vector stride: element i lives at v[i * inc]."""
    if inc == 1:
        return v
    buf = np.asarray(v, np.float64).reshape(-1)
    if inc <= 0:
        raise ValueError(f"{name}: inc must be positive, got {inc}")
    out = buf[::inc]
    if out.size < n:
        raise ValueError(f"{name}: buffer too small for n={n}, inc={inc}")
    return out[:n]


def exgemv_bits(trans: str, alpha: float, a, x, beta: float = 0.0, y=None,
                fpe: int = 3, early_exit: bool = False,
                impl: str | None = None, m: int | None = None,
                n: int | None = None, lda: int | None = None,
                incx: int = 1, incy: int = 1):
    _validate_fpe(fpe)
    if lda is not None:
        if m is None or n is None:
            raise ValueError("exgemv: lda requires explicit m and n")
        a = _apply_ld(a, m, n, lda)
    ab = split_f64(a)
    if ab.hi.ndim != 2:
        raise ValueError("exgemv: a must be 2-D")
    xb = split_f64(x)
    trans = trans.upper()
    if trans not in ("N", "T"):
        raise ValueError(f"exgemv: trans must be 'N' or 'T', got {trans!r}")
    m, n = ab.hi.shape
    if trans == "T":
        ab = transpose_bits(ab)
        m, n = n, m
    if incx != 1:
        xb = split_f64(_apply_inc(x, n, incx, "exgemv x"))
    if xb.hi.shape != (n,):
        raise ValueError(f"exgemv: x must have shape ({n},)")

    beta_mode = "zero" if beta == 0.0 else ("one" if beta == 1.0
                                            else "general")
    if beta_mode != "zero":
        if y is None:
            raise ValueError("exgemv: beta != 0 requires y")
        yb = split_f64(_apply_inc(y, m, incy, "exgemv y")
                       if incy != 1 else y)
        if yb.hi.shape != (m,):
            raise ValueError(f"exgemv: y must have shape ({m},)")
    else:
        yb = F64Bits(hi=jnp.zeros((m,), jnp.uint32),
                     lo=jnp.zeros((m,), jnp.uint32))

    if impl is None:
        impl = "auto" if jax.default_backend() == "tpu" else "xla"
    ah, al = _scalar_bits(alpha)
    bh, bl = _scalar_bits(beta)
    if impl in ("auto", "mxu"):
        from .kernels.gemv_mxu import MAX_K_MXU

        if -(-n // 256) * 256 <= MAX_K_MXU:
            return _gemv_bits_auto(ab.hi, ab.lo, xb.hi, xb.lo, ah, al,
                                   bh, bl, yb.hi, yb.lo, beta_mode,
                                   _variant_rows(fpe, early_exit))
        impl = "pallas"  # k too large for the int32 slice sums
    return _gemv_bits_jit(ab.hi, ab.lo, xb.hi, xb.lo, ah, al, bh, bl,
                          yb.hi, yb.lo, impl, beta_mode,
                          _variant_rows(fpe, early_exit))


def exgemv(trans: str, alpha: float, a, x, beta: float = 0.0, y=None,
           fpe: int = 3, early_exit: bool = False,
           impl: str | None = None, m: int | None = None,
           n: int | None = None, lda: int | None = None,
           incx: int = 1, incy: int = 1) -> np.ndarray:
    """Reproducible y := alpha*op(A)*x + beta*y.  Returns a new numpy array.

    Mirrors the full reference signature (include/blas2.hpp:95): pass a
    flat column-major buffer with ``m``/``n``/``lda`` and strided vectors
    with ``incx``/``incy`` (the returned y is dense).  ``fpe == 1``
    dispatches the non-reproducible fp64 control (the reference's DGEMV.cl
    baseline path, ExGEMV.cpp:92-94).
    """
    if int(fpe) == 1:
        from .. import baselines

        if lda is not None:
            a = _apply_ld(a, m, n, lda)
        if incx != 1:
            x = _apply_inc(x, a.shape[1] if trans.upper() == "N"
                           else a.shape[0], incx, "exgemv x")
        return baselines.gemv_baseline(trans, alpha, a, x, beta=beta, y=y)
    bits = exgemv_bits(trans, alpha, a, x, beta=beta, y=y, fpe=fpe,
                       early_exit=early_exit, impl=impl, m=m, n=n, lda=lda,
                       incx=incx, incy=incy)
    return np.asarray(bits).view(np.float64)
