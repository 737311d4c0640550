"""ExDOT: exact (bit-reproducible, correctly rounded) dot product.

API mirrors reference include/blas1.hpp:74
``exdot(Ng, ag, inca, offseta, bg, incb, offsetb, fpe, early_exit)``.

Exactness note: the accumulator covers the full product range down to
``2^-2148``, so products that underflow double precision are still absorbed
exactly -- strictly stronger than the reference, whose TwoProductFMA residual
underflows silently (reference ExDOT.FPE.cl:25-28 and the acknowledged TODO at
ExSUM.FPE.hpp:408).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import accumulator as acc_mod
from ..core.ieee import F64Bits, split_f64
from ..core.rounding import round_superacc_to_f64_bits
from ..core.types import DOT_FORMAT, Superacc

__all__ = ["exdot", "exdot_acc", "exdot_bits"]


def _validate_fpe(fpe: int):
    # Reference dispatch: fpe in [2..8] FPE, <3 superacc (ExDOT.cpp:69-92).
    if not (0 <= int(fpe) <= 8):
        raise ValueError(f"exdot: fpe must be in [0, 8], got {fpe}")


def _default_impl() -> str:
    return "auto" if jax.default_backend() == "tpu" else "xla"


# Below this size the VPU kernel's one-pass design wins (the MXU ladder
# pays two sample passes plus its routing switch).
_DOT_MXU_MIN = 1 << 20


def _dot_mxu_ladder(hi_a, lo_a, hi_b, lo_b, fast, vpu):
    """Branch-free hot-path routing for the MXU dot paths (bits and
    Superacc).

    The pre-round-4 ladder picked a static (nwa, nwb) tier via lax.switch
    around per-tier kernels -- but the (n,) -> (R8, WIDE) relayout only
    fuses into the (arbitrary-layout) Pallas operand when the call is
    UNconditional; a conditional forces canonical layouts on the buffers
    crossing it, materializing the relayout (~0.77 ms of pure "routing"
    at n=2^24 while the kernel ran 0.52 ms).  In-kernel tier gating was
    measured next and discarded too: any dynamic conditional around the
    kernel's matmul serializes the Mosaic pipeline (~+0.9 ms).  What
    survives: ONE static full-window kernel runs UNCONDITIONALLY, and
    the only lax.cond left guards the COLD path (in-kernel coverage
    miss -> exact-anchor retry -> VPU), which captures nothing but the
    flat jit parameters (zero-copy while untaken).

    * ROUTE: ~1/8 samples of BOTH hi streams give per-vector anchor
      estimates (sample_anchor's +8-bit slack absorbs most sampling
      misses) and sampled spreads -- used only to prove over-window data
      early (the kernel itself has no tiers to route).
    * The sampled anchors sit ``_ANCHOR_SLACK`` bits above the sampled
      max, so the 160-bit window only covers ~152 bits of TRUE spread at
      them.  ``resolve_anchor`` (the sum path's guard-band scheme)
      replaces an ambiguous sampled spread -- one within 16 bits below
      the 160 + slack boundary -- with the exact (anchor, spread) pair
      from one 4-byte/element streaming pass, and a per-side scalar
      select undoes the slack whenever the resolved spread shows the
      slacked window cannot fit (> 160: only reachable post-resolution,
      so the deslacked anchor is exact).  True spread in (152, 160]
      then runs ONE covered pass, and true spread in (160, 168] routes
      straight to the VPU with NO wasted MXU pass -- the round-4 ladder
      paid a guaranteed flagged pass + per-call retry on the former and
      two flagged passes on the latter.  Scalars only cross the conds:
      the four data streams keep their fused relayout.
    * An element outside its 160-bit anchor window (or NaN/Inf, or a
      true max more than 8 binades above the sampled one) flags
      in-kernel; the cold path retries at exact anchors -- unless the
      hot pass already ran at exact (deslacked) anchors, in which case
      a retry would flag identically and it goes straight to the exact
      VPU kernel.
    """
    from .kernels.dot_mxu import dot_pad_rows, WIDE
    from .kernels.sum_mxu import (_ANCHOR_SLACK, exact_anchor,
                                  resolve_anchor, sample_anchor)

    n = hi_a.shape[0]
    r8 = dot_pad_rows(n)
    pad = r8 * WIDE - n
    ea_r, spread_a = resolve_anchor(hi_a, *sample_anchor(hi_a),
                                    (160 + _ANCHOR_SLACK,))
    eb_r, spread_b = resolve_anchor(hi_b, *sample_anchor(hi_b),
                                    (160 + _ANCHOR_SLACK,))
    # spreads are measured against the slack-bumped anchor and only
    # UNDERestimate when sampled, so > 160 + slack soundly proves true
    # spread > 160: no window fits.  Resolved pairs make this exact.
    over = jnp.logical_or(spread_a > 160 + _ANCHOR_SLACK,
                          spread_b > 160 + _ANCHOR_SLACK)
    # spread > 160 can only survive the guard-band resolution (a sampled
    # value that high resolves exactly), so the deslacked anchor below is
    # the exact max and the full 160-bit window becomes usable.
    tight = jnp.logical_or(spread_a > 160, spread_b > 160)
    ea_use = jnp.where(spread_a > 160, ea_r - _ANCHOR_SLACK, ea_r)
    eb_use = jnp.where(spread_b > 160, eb_r - _ANCHOR_SLACK, eb_r)

    a2 = tuple(jnp.pad(x, (0, pad)).reshape(r8, WIDE)
               for x in (hi_a, lo_a, hi_b, lo_b))
    out, bad = fast(*a2, ea_use, eb_use)

    def cold(_):
        # captures only the FLAT jit parameters (zero-copy while
        # untaken); redoes its own pad+reshape.
        def retry(_):
            b2 = tuple(jnp.pad(x, (0, pad)).reshape(r8, WIDE)
                       for x in (hi_a, lo_a, hi_b, lo_b))
            out2, bad2 = fast(*b2, exact_anchor(hi_a),
                              exact_anchor(hi_b))
            return jax.lax.cond(bad2, vpu, lambda _: out2, operand=None)

        # over: no window fits.  tight: the hot pass already ran at the
        # exact deslacked anchors, so a retry at them would flag again
        # (the flag then means a below-lsb-bound subnormal) -- skip it.
        return jax.lax.cond(jnp.logical_or(over, tight), vpu, retry,
                            operand=None)

    return jax.lax.cond(jnp.logical_or(bad, over), cold,
                        lambda _: out, operand=None)


@jax.jit
def _exdot_bits_mxu_auto(hi_a, lo_a, hi_b, lo_b):
    from .kernels.dot_kernel import exdot_bits_pallas
    from .kernels.dot_mxu import dot_bits_mxu

    def vpu(_):
        return exdot_bits_pallas(hi_a, lo_a, hi_b, lo_b)

    return _dot_mxu_ladder(hi_a, lo_a, hi_b, lo_b, dot_bits_mxu, vpu)


@jax.jit
def _exdot_acc_mxu_auto(hi_a, lo_a, hi_b, lo_b) -> Superacc:
    """Superacc-producing twin (absolute DOT_FORMAT limbs: the
    distributed int32-limb psum wire format)."""
    from .kernels.dot_kernel import exdot_pallas
    from .kernels.dot_mxu import dot_acc_limbs_mxu
    from ..core.accumulator import to_int32_limbs

    def as_acc(limbs64):
        return Superacc(limbs=to_int32_limbs(limbs64),
                        special=jnp.zeros((3,), jnp.int32),
                        fmt=DOT_FORMAT)

    def fast(ha, la, hb, lb, ea, eb):
        limbs, bad = dot_acc_limbs_mxu(ha, la, hb, lb, ea, eb)
        return as_acc(limbs), bad

    def vpu(_):
        return exdot_pallas(hi_a, lo_a, hi_b, lo_b)

    return _dot_mxu_ladder(hi_a, lo_a, hi_b, lo_b, fast, vpu)


def _variant_rows(fpe: int, early_exit: bool) -> int:
    # rows * RENORM_EVERY (=2) is capped at 640 by the kernel's limb
    # carry-slack bound (see dot_kernel.MAX_ROWS_X_RENORM)
    base = {0: 64, 1: 64, 2: 32, 3: 256, 4: 96, 5: 128, 6: 160, 7: 192,
            8: 320}
    r = base[int(fpe)]
    return min(320, r * 2) if early_exit else r


def _use_mxu(n: int, impl: str) -> bool:
    from .kernels.dot_mxu import MAX_N_DOT_MXU

    return n <= MAX_N_DOT_MXU and (
        impl == "mxu" or (impl == "auto" and n >= _DOT_MXU_MIN))


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exdot_acc_jit(hi_a, lo_a, hi_b, lo_b, impl: str, rows: int) -> Superacc:
    if _use_mxu(hi_a.shape[0], impl):
        return _exdot_acc_mxu_auto(hi_a, lo_a, hi_b, lo_b)
    if impl in ("auto", "pallas", "mxu"):
        from .kernels.dot_kernel import exdot_pallas

        return exdot_pallas(hi_a, lo_a, hi_b, lo_b, rows=rows)
    elif impl == "xla":
        return acc_mod.accumulate_dot_terms(hi_a, lo_a, hi_b, lo_b, DOT_FORMAT)
    else:
        raise ValueError(f"unknown impl {impl!r}")


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exdot_bits_jit(hi_a, lo_a, hi_b, lo_b, impl: str, rows: int):
    # Fused accumulate + round (eager epilogues pay per-op host round trips).
    if _use_mxu(hi_a.shape[0], impl):
        return _exdot_bits_mxu_auto(hi_a, lo_a, hi_b, lo_b)
    if impl in ("auto", "pallas", "mxu"):
        # rounding runs in-kernel too: the XLA epilogue's tiny-tensor ops
        # otherwise dominate the streaming kernel
        from .kernels.dot_kernel import exdot_bits_pallas

        return exdot_bits_pallas(hi_a, lo_a, hi_b, lo_b, rows=rows)
    return round_superacc_to_f64_bits(
        _exdot_acc_jit(hi_a, lo_a, hi_b, lo_b, impl, rows)
    )


def _slice(bits: F64Bits, inc: int, offset: int) -> F64Bits:
    if offset or inc != 1:
        return F64Bits(hi=bits.hi[offset::inc], lo=bits.lo[offset::inc])
    return bits


def exdot_acc(a, b, inca: int = 1, offseta: int = 0, incb: int = 1,
              offsetb: int = 0, fpe: int = 3, early_exit: bool = False,
              impl: str | None = None) -> Superacc:
    _validate_fpe(fpe)
    ab = _slice(split_f64(a), inca, offseta)
    bb = _slice(split_f64(b), incb, offsetb)
    if ab.shape != bb.shape:
        raise ValueError(f"exdot: shape mismatch {ab.shape} vs {bb.shape}")
    impl = impl or _default_impl()
    return _exdot_acc_jit(ab.hi, ab.lo, bb.hi, bb.lo, impl,
                          _variant_rows(fpe, early_exit))


def exdot_bits(a, b, inca: int = 1, offseta: int = 0, incb: int = 1,
               offsetb: int = 0, fpe: int = 3, early_exit: bool = False,
               impl: str | None = None):
    _validate_fpe(fpe)
    ab = _slice(split_f64(a), inca, offseta)
    bb = _slice(split_f64(b), incb, offsetb)
    if ab.shape != bb.shape:
        raise ValueError(f"exdot: shape mismatch {ab.shape} vs {bb.shape}")
    impl = impl or _default_impl()
    return _exdot_bits_jit(ab.hi, ab.lo, bb.hi, bb.lo, impl,
                           _variant_rows(fpe, early_exit))


def exdot(a, b, inca: int = 1, offseta: int = 0, incb: int = 1,
          offsetb: int = 0, fpe: int = 3, early_exit: bool = False,
          impl: str | None = None) -> float:
    bits = exdot_bits(a, b, inca=inca, offseta=offseta, incb=incb,
                      offsetb=offsetb, fpe=fpe, early_exit=early_exit,
                      impl=impl)
    return float(np.asarray(bits).reshape(1).view(np.float64)[0])
