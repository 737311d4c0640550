"""Multi-chip reproducible reductions: shard_map + exact limb psum.

The reference distributes ExSUM over MPI ranks by scattering raw doubles and
limb-wise integer MPI_Reduce of normalized superaccumulators (reference
src/cpu/blas/blas1/ExSUM.cpp:33-63, 266-273): integer limb addition is
associative, so the reduction tree shape -- and hence the rank count -- can
never change the bits.

The TPU-native equivalent: ``shard_map`` over a 1-D ``jax.sharding.Mesh``;
each device accumulates its shard into a Superacc with the local kernel, then
``jax.lax.psum`` merges int32 limb vectors over ICI.  Per-device limbs are
renormalized (< 2^20 + slack), so up to ~2^10 devices merge without overflow
-- far beyond the 256-chip target.  The final rounding runs replicated, so
every device holds the identical result bits.

Mesh-shape invariance (1, 2, 4, 8 devices -> same bits) is the reference's
partition-invariance claim (README.md:8-10) and is tested on a host-simulated
device mesh, the analog of the reference's `mpirun -np 2` on one box.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import accumulator as acc_mod
from ..core.ieee import split_f64
from ..core.rounding import round_superacc_to_f64_bits
from ..core.types import DOT_FORMAT, SUM_FORMAT, Superacc

AXIS = "devices"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def psum_superacc(acc: Superacc, axis: str = AXIS) -> Superacc:
    """Exact cross-device merge: integer psum of limbs and special counters."""
    return Superacc(
        limbs=jax.lax.psum(acc.limbs, axis),
        special=jax.lax.psum(acc.special, axis),
        fmt=acc.fmt,
    )


def _local_sum_acc(hi, lo, impl: str, rows: int) -> Superacc:
    if impl in ("pallas", "auto", "mxu"):
        # per-shard accumulation through the same auto ladder as the
        # single-chip exsum (MXU byte-plane tiers with VPU fallback);
        # absolute SUM_FORMAT limbs, so the psum wire format is unchanged
        from ..ops.exsum import _exsum_acc_jit

        return _exsum_acc_jit(hi, lo, "auto" if impl == "pallas" else impl,
                              rows)
    return acc_mod.accumulate_sum_terms(hi, lo, SUM_FORMAT)


def _local_dot_acc(hi_a, lo_a, hi_b, lo_b, impl: str, rows: int) -> Superacc:
    if impl in ("pallas", "auto", "mxu"):
        # per-shard accumulation through the same auto ladder as the
        # single-chip exdot (cross-plane MXU tiers with VPU fallback);
        # absolute DOT_FORMAT limbs, so the psum wire format is unchanged
        from ..ops.exdot import _exdot_acc_jit

        return _exdot_acc_jit(hi_a, lo_a, hi_b, lo_b,
                              "auto" if impl == "pallas" else impl, rows)
    return acc_mod.accumulate_dot_terms(hi_a, lo_a, hi_b, lo_b, DOT_FORMAT)


def _default_impl() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _pad_to_multiple(arrs, multiple: int):
    n = arrs[0].shape[0]
    rem = n % multiple
    if rem:
        pad = multiple - rem
        arrs = [jnp.pad(a, (0, pad)) for a in arrs]  # zero bits: no deposits
    return arrs


def exsum_sharded(x, mesh: Mesh | None = None, axis: str = AXIS,
                  impl: str | None = None, rows: int = 128):
    """Reproducible sum over a device mesh -> binary64 bits (replicated).

    Bitwise identical for every mesh size and shard layout.
    """
    mesh = mesh or make_mesh()
    impl = impl or _default_impl()
    bits = split_f64(x)
    hi, lo = _pad_to_multiple([bits.hi.reshape(-1), bits.lo.reshape(-1)],
                              mesh.devices.size)

    @partial(jax.jit, static_argnums=())
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    def run(hi, lo):
        acc = _local_sum_acc(hi, lo, impl, rows)
        total = psum_superacc(acc, axis)
        return round_superacc_to_f64_bits(total)

    return run(hi, lo)


def exdot_sharded(a, b, mesh: Mesh | None = None, axis: str = AXIS,
                  impl: str | None = None, rows: int = 64):
    """Reproducible dot product over a device mesh -> binary64 bits."""
    mesh = mesh or make_mesh()
    impl = impl or _default_impl()
    ab = split_f64(a)
    bb = split_f64(b)
    hi_a, lo_a, hi_b, lo_b = _pad_to_multiple(
        [ab.hi.reshape(-1), ab.lo.reshape(-1),
         bb.hi.reshape(-1), bb.lo.reshape(-1)],
        mesh.devices.size,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis),) * 4,
        out_specs=P(),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    def run(hi_a, lo_a, hi_b, lo_b):
        acc = _local_dot_acc(hi_a, lo_a, hi_b, lo_b, impl, rows)
        total = psum_superacc(acc, axis)
        return round_superacc_to_f64_bits(total)

    return jax.jit(run)(hi_a, lo_a, hi_b, lo_b)
