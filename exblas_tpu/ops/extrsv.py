"""ExTRSV: solve op(T) x = b, reproducible blocked substitution.

API mirrors reference include/blas2.hpp:57 ``extrsv(uplo, transa, diag, n,
a, lda, x, incx, fpe, early_exit)`` (the reference solves in place over x=b;
we return a new x).

Semantics (deterministic spec; reference ExTRSV.lnn.Superacc.cl:261-347):
* each row i carries an exact superaccumulator seeded with b_i;
* in dependency order, ``x_i = fl_div(Round(acc_i), t_ii)`` (unit diagonal:
  ``x_i = Round(acc_i)``) -- Round is correctly rounded, and our divide is
  correctly rounded (stronger than the reference's faithful divide, hence
  the same 1e-13 solve tolerance vs a true inverse but bit-stable);
* every update ``acc_j -= t_ji * x_i`` is an exact 106-bit product deposit.

Because deposits are exact and commutative, the result is bit-identical for
any block size / update order -- the reference's wavefront spin-sync
(trsv_init / nextRow / wait_until_ge) is replaced by a sequential-in-
dependency, parallel-in-row blocked sweep with no synchronization at all.

Two implementations, bit-identical by construction:

* ``impl="xla"`` -- the spec oracle: a sequential XLA fori sweep
  (`_trsv_lower_jit`), runnable anywhere;
* ``impl="pallas"`` -- the TPU hot path: one left-looking Pallas kernel
  (kernels/trsv_kernel.py) solving 128-row diagonal blocks in-kernel with
  VPU-wide rounding; ~62 ms device time at n=8192 (vs ~32 s for the XLA
  sweep).

fpe == 1 dispatches the non-reproducible control (reference DTRSV.*.cl).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import deposit as dep
from ..core.f64ops import f64_div
from ..core.ieee import F64Bits, flip2_bits, split_f64, transpose_bits
from ..core.types import DOT_FORMAT, LIMB_BITS
from .exgemv import round_rows

_I64 = jnp.int64
_U64 = jnp.uint64
_I32 = jnp.int32

__all__ = ["extrsv", "extrsv_bits"]

L = DOT_FORMAT.n_limbs


def _deposit_products_rows(limbs, special, a_hi, a_lo, xs_hi, xs_lo):
    """limbs (R, L) += exact products a[r] * xs[r] per row (iota-compare)."""
    t = dep.product_terms(a_hi, a_lo, xs_hi, xs_lo, DOT_FORMAT.offset_bits)
    limb_iota = jax.lax.broadcasted_iota(_I32, (a_hi.shape[0], L), 1)
    q, r, s = t["q"], t["r"], t["s"].astype(_I64)
    for k, cls in enumerate(t["classes"]):
        pbit = r + 14 * k
        dq = pbit // LIMB_BITS
        rr = pbit - dq * LIMB_BITS
        p0, p1, p2 = dep.split_value30(cls.astype(jnp.uint32), rr)
        for off, piece in enumerate((p0, p1, p2)):
            tgt = (q + dq + off)[:, None]
            limbs = limbs + jnp.where(
                limb_iota == tgt, (piece.astype(_I64) * s)[:, None], _I64(0)
            )
    special = special + jnp.stack(
        [t["nan"], t["pinf"], t["ninf"]], axis=-1).astype(_I64)
    return limbs, special


def _deposit_b(b_hi, b_lo):
    n = b_hi.shape[0]
    t = dep.sum_terms(b_hi, b_lo, DOT_FORMAT.offset_bits)
    limb_iota = jax.lax.broadcasted_iota(_I32, (n, L), 1)
    limbs = jnp.zeros((n, L), _I64)
    for off, piece in enumerate(t["pieces"]):
        limbs = limbs + jnp.where(
            limb_iota == (t["q"] + off)[:, None],
            piece.astype(_I64)[:, None], _I64(0),
        )
    special = jnp.stack([t["nan"], t["pinf"], t["ninf"]], axis=-1)
    return limbs, special.astype(_I64)


def _neg(hi):
    return hi ^ jnp.uint32(0x80000000)


def solve_diag_block(td_hi, td_lo, acc_blk, spec_blk, unit: bool):
    """Solve one (block, block) lower-triangular diagonal block given the
    rows' exact accumulator state (which already holds b minus every
    deposit from columns left of the block).

    Returns (xb_hi, xb_lo): x_i = Round(acc_i)/t_ii after the exact
    within-block deposits -- the sequential heart of the spec solve,
    shared by the single-chip XLA path and the sharded solver
    (parallel/trsv.py), so their bits agree by construction.
    """
    block = td_hi.shape[0]
    row_iota_b = jax.lax.broadcasted_iota(_I32, (block,), 0)
    xb_hi = jnp.zeros((block,), jnp.uint32)
    xb_lo = jnp.zeros((block,), jnp.uint32)

    def inner(i, st):
        acc_blk, spec_blk, xb_hi, xb_lo = st
        row_l = jax.lax.dynamic_slice(acc_blk, (i, 0), (1, L))
        row_s = jax.lax.dynamic_slice(spec_blk, (i, 0), (1, 3))
        num = round_rows(row_l, row_s)[0]
        nh = (num >> _U64(32)).astype(jnp.uint32)
        nl = (num & _U64(0xFFFFFFFF)).astype(jnp.uint32)
        if unit:
            xi_hi, xi_lo = nh, nl
        else:
            dh = jax.lax.dynamic_slice(td_hi, (i, i), (1, 1))[0, 0]
            dl = jax.lax.dynamic_slice(td_lo, (i, i), (1, 1))[0, 0]
            qb = f64_div(nh, nl, dh, dl)
            xi_hi = (qb >> _U64(32)).astype(jnp.uint32)
            xi_lo = (qb & _U64(0xFFFFFFFF)).astype(jnp.uint32)
        xb_hi = jax.lax.dynamic_update_index_in_dim(xb_hi, xi_hi, i, 0)
        xb_lo = jax.lax.dynamic_update_index_in_dim(xb_lo, xi_lo, i, 0)
        # acc_blk[j] -= td[j, i] * x_i for j > i
        col_hi = jax.lax.dynamic_slice(td_hi, (0, i), (block, 1))[:, 0]
        col_lo = jax.lax.dynamic_slice(td_lo, (0, i), (block, 1))[:, 0]
        m = row_iota_b > i
        col_hi = jnp.where(m, _neg(col_hi), jnp.uint32(0))
        col_lo = jnp.where(m, col_lo, jnp.uint32(0))
        acc_blk, spec_blk = _deposit_products_rows(
            acc_blk, spec_blk, col_hi, col_lo,
            jnp.broadcast_to(xi_hi, (block,)),
            jnp.broadcast_to(xi_lo, (block,)))
        return acc_blk, spec_blk, xb_hi, xb_lo

    _, _, xb_hi, xb_lo = jax.lax.fori_loop(
        0, block, inner, (acc_blk, spec_blk, xb_hi, xb_lo))
    return xb_hi, xb_lo


def solve_panel(t_hi, t_lo, acc, special, unit: bool, block: int,
                impl: str = "xla"):
    """Blocked sweep over an (p, p) lower-triangular panel given the rows'
    exact accumulator state (b already deposited, minus every deposit from
    columns left of the panel).  Returns (x_hi, x_lo) bit pairs.

    The shared engine of the single-chip solve and the sharded solver's
    replicated diagonal-panel step (parallel/trsv.py) -- so their bits
    agree by construction.  ``impl="pallas"`` routes the O(p*block)
    trailing updates through the Pallas GEMV kernel (TPU hot path)."""
    p = t_hi.shape[0]
    nblocks = p // block
    x_hi = jnp.zeros((p,), jnp.uint32)
    x_lo = jnp.zeros((p,), jnp.uint32)

    row_iota_n = jax.lax.broadcasted_iota(_I32, (p,), 0)

    def outer(kb, state):
        acc, special, x_hi, x_lo = state
        base = kb * block
        acc_blk = jax.lax.dynamic_slice(acc, (base, 0), (block, L))
        spec_blk = jax.lax.dynamic_slice(special, (base, 0), (block, 3))
        td_hi = jax.lax.dynamic_slice(t_hi, (base, base), (block, block))
        td_lo = jax.lax.dynamic_slice(t_lo, (base, base), (block, block))
        xb_hi, xb_lo = solve_diag_block(td_hi, td_lo, acc_blk, spec_blk,
                                        unit)

        x_hi = jax.lax.dynamic_update_slice(x_hi, xb_hi, (base,))
        x_lo = jax.lax.dynamic_update_slice(x_lo, xb_lo, (base,))
        # (the solved block's own acc rows are never read again: trailing
        # deposits only target rows >= base + block)

        # Trailing update: rows beyond this block get all B column deposits.
        tc_hi = jax.lax.dynamic_slice(t_hi, (0, base), (p, block))
        tc_lo = jax.lax.dynamic_slice(t_lo, (0, base), (p, block))
        m = (row_iota_n >= base + block)[:, None]
        tc_hi = jnp.where(m, _neg(tc_hi), jnp.uint32(0))
        tc_lo = jnp.where(m, tc_lo, jnp.uint32(0))
        if impl == "pallas":
            # the O(p*B) trailing update is a GEMV: use the Pallas kernel
            from .kernels.gemv_kernel import gemv_rows_acc_pallas

            d_limbs, d_special = gemv_rows_acc_pallas(
                tc_hi, tc_lo, xb_hi, xb_lo,
                k_rows=max(8, min(block, 256)))
        else:
            from .exgemv import dot_rows_acc_xla

            d_limbs, d_special = dot_rows_acc_xla(tc_hi, tc_lo, xb_hi, xb_lo)
        return (acc + d_limbs, special + d_special.astype(_I64),
                x_hi, x_lo)

    acc, special, x_hi, x_lo = jax.lax.fori_loop(
        0, nblocks, outer, (acc, special, x_hi, x_lo))
    return x_hi, x_lo


@partial(jax.jit, static_argnames=("unit", "block", "impl"))
def _trsv_lower_jit(t_hi, t_lo, b_hi, b_lo, unit: bool, block: int,
                    impl: str = "xla"):
    """Solve lower-triangular T x = b (row-ascending dependency order)."""
    acc, special = _deposit_b(b_hi, b_lo)
    x_hi, x_lo = solve_panel(t_hi, t_lo, acc, special, unit, block, impl)
    return (x_hi.astype(_U64) << _U64(32)) | x_lo.astype(_U64)


@partial(jax.jit, static_argnames=("unit",))
def _trsv_lower_pallas_jit(t_hi, t_lo, b_hi, b_lo, unit: bool):
    """Full lower solve via the left-looking Pallas kernel (TPU hot path).

    Pads n up to a multiple of 128 with an identity diagonal (padded rows
    solve to x = 0 and deposit nothing) and packs the kernel's
    (nblocks, 128) lane layout back to (n,) u64 bits.  The kernel reads T
    row-major and transposes blocks in-register, so no transposed copy of
    T is materialized (that copy OOM'd n=32768: 8 GB matrix + 8 GB copy).
    Bit-identical to :func:`_trsv_lower_jit`.
    """
    from .kernels.trsv_kernel import B, trsv_lower_x_pallas

    n = b_hi.shape[0]
    npad = -(-n // B) * B
    nb = npad // B
    if npad > n:
        t_hi = jnp.pad(t_hi, ((0, npad - n), (0, npad - n)))
        t_lo = jnp.pad(t_lo, ((0, npad - n), (0, npad - n)))
        # identity on the padded diagonal (1.0 = hi 0x3FF00000)
        ri = jax.lax.broadcasted_iota(_I32, (npad, npad), 0)
        ci = jax.lax.broadcasted_iota(_I32, (npad, npad), 1)
        on_pad_diag = jnp.logical_and(ri == ci, ri >= n)
        t_hi = jnp.where(on_pad_diag, jnp.uint32(0x3FF00000), t_hi)
    b_hi = jnp.pad(b_hi, (0, npad - n)).reshape(nb, B)
    b_lo = jnp.pad(b_lo, (0, npad - n)).reshape(nb, B)

    x_hi, x_lo = trsv_lower_x_pallas(t_hi, t_lo, b_hi, b_lo, unit=unit)
    x_hi = x_hi.reshape(-1)[:n]
    x_lo = x_lo.reshape(-1)[:n]
    return (x_hi.astype(_U64) << _U64(32)) | x_lo.astype(_U64)


def _choose_block(n: int) -> int:
    # 32 measures ~2x faster than 128 on v5e (smaller per-step deposits in
    # the sequential diagonal sweep); results are block-size invariant.
    for b in (32, 16, 8, 4, 2, 1):
        if n % b == 0:
            return b
    return 1


def extrsv_bits(uplo: str, trans: str, diag: str, a, b, fpe: int = 3,
                early_exit: bool = False, impl: str | None = None,
                n: int | None = None, lda: int | None = None,
                incx: int = 1):
    if not (0 <= int(fpe) <= 8):
        raise ValueError(f"extrsv: fpe must be in [0, 8], got {fpe}")
    uplo, trans, diag = uplo.upper(), trans.upper(), diag.upper()
    if uplo not in "LU" or trans not in "NT" or diag not in "NU":
        raise ValueError("extrsv: uplo in L/U, trans in N/T, diag in N/U")
    if lda is not None:
        from .exgemv import _apply_ld

        if n is None:
            raise ValueError("extrsv: lda requires explicit n")
        a = _apply_ld(a, n, n, lda)
    if incx != 1:
        from .exgemv import _apply_inc

        b = _apply_inc(b, n if n is not None else np.asarray(a).shape[0],
                       incx, "extrsv x")
    ab = split_f64(a)
    bb = split_f64(b)
    n = bb.hi.shape[0]
    if ab.hi.shape != (n, n):
        raise ValueError(f"extrsv: a must be ({n}, {n})")

    if trans == "T":
        ab = transpose_bits(ab)
        uplo = "U" if uplo == "L" else "L"
    if uplo == "U":
        # Solve upper by reversing: (P T P) is lower with P the flip.
        ab = flip2_bits(ab)
        bb = F64Bits(hi=bb.hi[::-1], lo=bb.lo[::-1])

    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        bits = _trsv_lower_pallas_jit(ab.hi, ab.lo, bb.hi, bb.lo, diag == "U")
    else:
        # spec-oracle path
        xla_impl = "xla"
        bits = _trsv_lower_jit(ab.hi, ab.lo, bb.hi, bb.lo, diag == "U",
                               _choose_block(n), xla_impl)
    if uplo == "U":
        bits = bits[::-1]
    return bits


def extrsv(uplo: str, trans: str, diag: str, a, b, fpe: int = 3,
           early_exit: bool = False, impl: str | None = None,
           n: int | None = None, lda: int | None = None,
           incx: int = 1) -> np.ndarray:
    """Reproducible triangular solve; returns x as a new numpy array.

    Mirrors the full reference signature (include/blas2.hpp:57): pass a
    flat column-major buffer with ``n``/``lda`` and a strided right-hand
    side with ``incx`` (the returned solution is dense)."""
    if int(fpe) == 1:
        from .. import baselines

        if lda is not None:
            from .exgemv import _apply_ld

            a = _apply_ld(a, n, n, lda)
        if incx != 1:
            from .exgemv import _apply_inc

            b = _apply_inc(b, n if n is not None else np.asarray(a).shape[0],
                           incx, "extrsv x")
        return baselines.trsv_baseline(uplo, trans, diag, a, b)
    bits = extrsv_bits(uplo, trans, diag, a, b, fpe=fpe,
                       early_exit=early_exit, impl=impl, n=n, lda=lda,
                       incx=incx)
    return np.asarray(bits).view(np.float64)
