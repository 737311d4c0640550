"""ExSUM: exact (bit-reproducible, correctly rounded) summation.

Public API mirrors reference include/blas1.hpp:48
``exsum(Ng, a, inca, offset, fpe, early_exit, parallel)``: the ``fpe`` and
``early_exit`` knobs are kept for fidelity.  On TPU they select internal
tiling/strategy variants only -- every variant returns the *identical* bits
(the reference asserts the same property across its variants,
tests/test.exsum.cpu.cpp:107-146; here it holds by construction).

Backends ("impl"):
  * ``"xla"``    -- segment-sum deposit at the XLA level (correctness anchor,
                    runs anywhere).
  * ``"pallas"`` -- the TPU Pallas kernel (hot path).
  * ``None``     -- pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..core import accumulator as acc_mod
from ..core.ieee import F64Bits, split_f64
from ..core.rounding import round_superacc_to_f64_bits
from ..core.types import SUM_FORMAT, Superacc

__all__ = ["exsum", "exsum_acc", "exsum_bits"]


def _validate_fpe(fpe: int):
    # Reference dispatch accepts 0..8 (src/cpu/blas/blas1/ExSUM.cpp:24-117).
    if not (0 <= int(fpe) <= 8):
        raise ValueError(
            f"exsum: fpe must be in [0, 8], got {fpe} "
            "(0/1: superacc-only; 2-8: FPE size in the reference)"
        )


def _default_impl() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# fpe/early_exit -> kernel tiling variant (rows per grid step).  Different
# variants exercise different decompositions; results are bit-identical.
def _variant_rows(fpe: int, early_exit: bool) -> int:
    # multiples of the kernel's 32-row subgroup; capped so limb growth
    # between carry passes stays inside int32 slack (sum_kernel bound)
    base = {0: 96, 1: 96, 2: 32, 3: 512, 4: 64, 5: 160, 6: 224, 7: 288,
            8: 480}
    r = base[int(fpe)]
    return r * 2 if early_exit else r


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exsum_acc_jit(hi, lo, impl: str, rows: int) -> Superacc:
    if impl == "xla":
        return acc_mod.accumulate_sum_terms(hi, lo, SUM_FORMAT)
    elif impl == "pallas":
        from .kernels.sum_kernel import exsum_pallas

        return exsum_pallas(hi, lo, rows=rows)
    else:
        raise ValueError(f"unknown impl {impl!r}")


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exsum_bits_jit(hi, lo, impl: str, rows: int):
    # One fused jit for accumulate + round: eager epilogues are catastrophic
    # on remote TPUs (each tiny op pays a full host round trip).
    if impl == "pallas":
        # fully fused kernel: the correctly-rounded conversion runs
        # in-kernel too (the XLA rounding epilogue's tiny-tensor ops
        # otherwise dominate the streaming kernel's runtime)
        from .kernels.sum_kernel import exsum_bits_pallas

        return exsum_bits_pallas(hi, lo, rows=rows)
    return round_superacc_to_f64_bits(_exsum_acc_jit(hi, lo, impl, rows))


def exsum_acc(x, inca: int = 1, offset: int = 0, fpe: int = 2,
              early_exit: bool = False, impl: str | None = None) -> Superacc:
    """Exact sum into a Superacc (device-resident, mergeable, serializable)."""
    _validate_fpe(fpe)
    bits = split_f64(x)
    if offset or inca != 1:
        bits = F64Bits(hi=bits.hi[offset::inca], lo=bits.lo[offset::inca])
    impl = impl or _default_impl()
    return _exsum_acc_jit(bits.hi, bits.lo, impl,
                          _variant_rows(fpe, early_exit))


def exsum_bits(x, inca: int = 1, offset: int = 0, fpe: int = 2,
               early_exit: bool = False, impl: str | None = None):
    """Exact sum, returned as binary64 bit pattern (uint64, device)."""
    _validate_fpe(fpe)
    bits = split_f64(x)
    if offset or inca != 1:
        bits = F64Bits(hi=bits.hi[offset::inca], lo=bits.lo[offset::inca])
    impl = impl or _default_impl()
    return _exsum_bits_jit(bits.hi, bits.lo, impl,
                           _variant_rows(fpe, early_exit))


def exsum(x, inca: int = 1, offset: int = 0, fpe: int = 2,
          early_exit: bool = False, impl: str | None = None,
          parallel: bool = True) -> float:
    """Correctly rounded, reproducible sum(x[offset::inca]) -> Python float.

    ``parallel`` mirrors the reference's TBB knob (blas1.hpp:48); with
    ``parallel=False`` the sum runs single-threaded on the host via the
    native C++ backend.  Results are bit-identical either way.
    """
    if not parallel:
        from ..cpu_backend import exsum_cpu

        x = np.asarray(x, np.float64)[offset::inca]
        return exsum_cpu(x, num_threads=1)
    bits = exsum_bits(x, inca=inca, offset=offset, fpe=fpe,
                      early_exit=early_exit, impl=impl)
    return float(np.asarray(bits).reshape(1).view(np.float64)[0])
