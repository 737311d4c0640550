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
import jax.numpy as jnp
import numpy as np

from ..core import accumulator as acc_mod
from ..core.ieee import F64Bits, split_f64
from ..core.rounding import round_superacc_to_f64_bits
from ..core.types import SUM_FORMAT, Superacc

__all__ = ["exsum", "exsum_acc", "exsum_bits", "exsum_segmented"]


def _validate_fpe(fpe: int):
    # Reference dispatch accepts 0..8 (src/cpu/blas/blas1/ExSUM.cpp:24-117).
    if not (0 <= int(fpe) <= 8):
        raise ValueError(
            f"exsum: fpe must be in [0, 8], got {fpe} "
            "(0/1: superacc-only; 2-8: FPE size in the reference)"
        )


def _default_impl() -> str:
    return "auto" if jax.default_backend() == "tpu" else "xla"


# Below this size the VPU kernel's one-pass design wins: the MXU ladder
# carries ~50 us of fixed overhead (sample pass + routing switch), the
# measured crossover is ~2^20 elements.
_SUM_MXU_MIN = 1 << 20


@jax.jit
def _exsum_bits_mxu_auto(hi, lo):
    """One jit, two tiers, identical bits by construction:

    * ROUTE: one ~1/8 sample of the hi words (~0.5 byte/element) gives an
      anchor estimate and a sampled spread.  A sampled spread can only
      UNDERestimate the true one, so a sampled spread past the widest MXU
      window soundly proves no window covers the data: go straight to the
      VPU kernel with no wasted MXU pass.  Otherwise pick the narrowest
      window (96 / 128 / 160 anchored bits) the sampled spread fits.
    * FAST: MXU byte-plane kernel at the sampled anchor with per-element
      coverage checking in-kernel -- no analysis pass on the hot path.
    * SLOW (kernel flagged an uncovered element or a NaN/Inf): one exact
      max-exponent pass, retry the widest (160-bit) kernel at the exact
      anchor, and only if elements still don't fit (or specials are
      present) run the exact VPU kernel.
    """
    from .kernels.sum_kernel import exsum_bits_pallas
    from .kernels.sum_mxu import (_ANCHOR_SLACK as _SUM_SLACK,
                                  exact_anchor, resolve_anchor,
                                  sample_anchor, sum_bits_mxu,
                                  sum_pad_rows)

    n = hi.shape[0]
    r_pad = sum_pad_rows(n)
    pad = r_pad * 128 - n
    e_est, spread_est = resolve_anchor(
        hi, *sample_anchor(hi), (96, 128, 160 + _SUM_SLACK))

    def vpu(_):
        return exsum_bits_pallas(hi, lo)

    def fast_tier(nwa, deslack=0):
        def f(_):
            # pad+reshape INSIDE the branch: tile-native (free) when fused
            # into the kernel input here; captured by the cond from outside
            # it materializes a 2x64 MB copy (~0.2 ms measured at n=2^24)
            hi2 = jnp.pad(hi, (0, pad)).reshape(r_pad, 128)
            lo2 = jnp.pad(lo, (0, pad)).reshape(r_pad, 128)
            bits_fast, bad = sum_bits_mxu(hi2, lo2, e_est - deslack,
                                          nwa=nwa)

            def slow(_):
                bits2, bad2 = sum_bits_mxu(hi2, lo2, exact_anchor(hi),
                                           nwa=5)
                return jax.lax.cond(bad2, vpu, lambda _: bits2,
                                    operand=None)

            return jax.lax.cond(bad, slow, lambda _: bits_fast,
                                operand=None)
        return f

    # spread_est is measured against the slack-bumped sampled anchor, so
    # it compares against the full window widths directly.  The widest
    # tier runs with the slack undone (full 160-bit window; the bump
    # would make near-full-window ill-conditioned data fail every sampled
    # pass) and its threshold carries the bump; the in-kernel check still
    # backstops a sampling miss of the true maximum.
    idx = jnp.where(spread_est <= 96, jnp.int32(0),
                    jnp.where(spread_est <= 128, jnp.int32(1),
                              jnp.where(spread_est <= 160 + _SUM_SLACK,
                                        jnp.int32(2), jnp.int32(3))))
    return jax.lax.switch(
        idx, [fast_tier(3), fast_tier(4), fast_tier(5, deslack=_SUM_SLACK),
              vpu], None)


# fpe/early_exit -> kernel tiling variant (rows per grid step).  Different
# variants exercise different decompositions; results are bit-identical.
def _variant_rows(fpe: int, early_exit: bool) -> int:
    # multiples of the kernel's 32-row subgroup; capped so limb growth
    # between carry passes stays inside int32 slack (sum_kernel bound)
    base = {0: 96, 1: 96, 2: 32, 3: 512, 4: 64, 5: 160, 6: 224, 7: 288,
            8: 480}
    r = base[int(fpe)]
    return min(992, r * 2) if early_exit else r


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exsum_acc_jit(hi, lo, impl: str, rows: int) -> Superacc:
    from .kernels.sum_mxu import MAX_N_MXU

    if hi.shape[0] <= MAX_N_MXU and (
            impl == "mxu"
            or (impl == "auto" and hi.shape[0] >= _SUM_MXU_MIN)):
        return _exsum_acc_mxu_auto(hi, lo)
    if impl in ("auto", "pallas", "mxu"):
        from .kernels.sum_kernel import exsum_pallas

        return exsum_pallas(hi, lo, rows=rows)
    elif impl == "xla":
        return acc_mod.accumulate_sum_terms(hi, lo, SUM_FORMAT)
    else:
        raise ValueError(f"unknown impl {impl!r}")


@jax.jit
def _exsum_acc_mxu_auto(hi, lo) -> Superacc:
    """Superacc-producing twin of ``_exsum_bits_mxu_auto`` (same tiers,
    same routing): the MXU plane sums are shifted into ABSOLUTE
    SUM_FORMAT limbs, so the result feeds the distributed int32-limb
    psum wire format.  Bit-exact state: merging/rounding downstream is
    identical to the VPU/XLA accumulators'."""
    from .kernels.sum_kernel import exsum_pallas
    from .kernels.sum_mxu import (_ANCHOR_SLACK as _SUM_SLACK,
                                  exact_anchor, resolve_anchor,
                                  sample_anchor, sum_acc_limbs_mxu,
                                  sum_pad_rows)
    from ..core.accumulator import to_int32_limbs

    n = hi.shape[0]
    r_pad = sum_pad_rows(n)
    pad = r_pad * 128 - n
    e_est, spread_est = resolve_anchor(
        hi, *sample_anchor(hi), (96, 128, 160 + _SUM_SLACK))

    def vpu(_):
        return exsum_pallas(hi, lo)

    def as_acc(limbs64):
        return Superacc(limbs=to_int32_limbs(limbs64),
                        special=jnp.zeros((3,), jnp.int32),
                        fmt=SUM_FORMAT)

    def fast_tier(nwa, deslack=0):
        def f(_):
            hi2 = jnp.pad(hi, (0, pad)).reshape(r_pad, 128)
            lo2 = jnp.pad(lo, (0, pad)).reshape(r_pad, 128)
            limbs, bad = sum_acc_limbs_mxu(hi2, lo2, e_est - deslack,
                                           nwa=nwa)

            def slow(_):
                l2, bad2 = sum_acc_limbs_mxu(hi2, lo2, exact_anchor(hi),
                                             nwa=5)
                return jax.lax.cond(bad2, vpu, lambda _: as_acc(l2),
                                    operand=None)

            return jax.lax.cond(bad, slow, lambda _: as_acc(limbs),
                                operand=None)
        return f

    idx = jnp.where(spread_est <= 96, jnp.int32(0),
                    jnp.where(spread_est <= 128, jnp.int32(1),
                              jnp.where(spread_est <= 160 + _SUM_SLACK,
                                        jnp.int32(2), jnp.int32(3))))
    return jax.lax.switch(
        idx, [fast_tier(3), fast_tier(4), fast_tier(5, deslack=_SUM_SLACK),
              vpu], None)


@partial(jax.jit, static_argnames=("impl", "rows"))
def _exsum_bits_jit(hi, lo, impl: str, rows: int):
    # One fused jit for accumulate + round: eager epilogues are catastrophic
    # on remote TPUs (each tiny op pays a full host round trip).
    from .kernels.sum_mxu import MAX_N_MXU

    if hi.shape[0] <= MAX_N_MXU and (
            impl == "mxu"
            or (impl == "auto" and hi.shape[0] >= _SUM_MXU_MIN)):
        return _exsum_bits_mxu_auto(hi, lo)
    if impl in ("auto", "mxu"):
        impl = "pallas"
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


def exsum_segmented_bits(hi, lo, segment_ids, num_segments: int):
    """Traceable per-segment exact sums -> f64 bit patterns (uint64).

    The batched building block behind :func:`exsum_segmented`; exposed
    un-jitted so applications (e.g. the device-side k-means step,
    apps/kmeans.py) can fuse it into larger jitted programs.
    """
    from ..core import deposit as dep
    from ..core.rounding import (
        canonicalize_digits,
        round_digits_to_f64_bits,
        QNAN_BITS, NINF_BITS, PINF_BITS,
    )

    L = SUM_FORMAT.n_limbs
    t = dep.sum_terms(hi.reshape(-1), lo.reshape(-1),
                      SUM_FORMAT.offset_bits)
    seg = segment_ids.reshape(-1).astype(jnp.int32)
    flat = jnp.zeros((num_segments * L,), jnp.int64)
    for off, piece in enumerate(t["pieces"]):
        flat = flat + jax.ops.segment_sum(
            piece.astype(jnp.int64), seg * L + t["q"] + off,
            num_segments=num_segments * L)
    limbs = flat.reshape(num_segments, L)
    counts = [
        jax.ops.segment_sum(t[k].astype(jnp.int32), seg,
                            num_segments=num_segments)
        for k in ("nan", "pinf", "ninf")
    ]
    digits, negative = canonicalize_digits(limbs)
    bits = round_digits_to_f64_bits(digits, negative, SUM_FORMAT)
    nan_c, pos_c, neg_c = counts
    is_nan = jnp.logical_or(nan_c > 0, jnp.logical_and(pos_c > 0,
                                                       neg_c > 0))
    bits = jnp.where(neg_c > 0, NINF_BITS, bits)
    bits = jnp.where(pos_c > 0, PINF_BITS, bits)
    bits = jnp.where(is_nan, QNAN_BITS, bits)
    return bits


_exsum_segmented_jit = partial(jax.jit, static_argnames=("num_segments",))(
    exsum_segmented_bits)


def exsum_segmented(x, segment_ids, num_segments: int) -> np.ndarray:
    """Reproducible, correctly rounded per-segment sums in one batched pass.

    ``out[s] = exsum(x[segment_ids == s])`` for every segment at once --
    the batched building block the application studies use (the reference
    instead loops scalar exsum calls per cluster/cell, e.g.
    kmeans_clustering.cpp:203-223).  Exact segment deposits make the result
    independent of element order and of the segment layout.
    """
    b = split_f64(x)
    ids = np.ascontiguousarray(np.asarray(segment_ids, np.int32))
    bits = _exsum_segmented_jit(b.hi, b.lo, jnp.asarray(ids),
                                int(num_segments))
    return np.asarray(bits).view(np.float64)
