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
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _variant_rows(fpe: int, early_exit: bool) -> int:
    # rows * RENORM_EVERY (=2) is capped at 640 by the kernel's limb
    # carry-slack bound (see dot_kernel.MAX_ROWS_X_RENORM)
    base = {0: 64, 1: 64, 2: 32, 3: 256, 4: 96, 5: 128, 6: 160, 7: 192,
            8: 320}
    r = base[int(fpe)]
    return min(320, r * 2) if early_exit else r


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exdot_acc_jit(hi_a, lo_a, hi_b, lo_b, impl: str, rows: int) -> Superacc:
    if impl == "xla":
        return acc_mod.accumulate_dot_terms(hi_a, lo_a, hi_b, lo_b, DOT_FORMAT)
    elif impl == "pallas":
        from .kernels.dot_kernel import exdot_pallas

        return exdot_pallas(hi_a, lo_a, hi_b, lo_b, rows=rows)
    else:
        raise ValueError(f"unknown impl {impl!r}")


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exdot_bits_jit(hi_a, lo_a, hi_b, lo_b, impl: str, rows: int):
    # Fused accumulate + round (eager epilogues pay per-op host round trips).
    if impl == "pallas":
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
