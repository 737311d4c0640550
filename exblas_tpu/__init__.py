"""exblas-tpu: a TPU-native, bit-reproducible, correctly-rounded BLAS.

Re-creation of ExBLAS (reference: nikolovjovan/exblas) for TPU hardware:
ExSUM, ExDOT, ExGEMV, ExTRSV, ExGEMM with results that are bitwise identical
and correctly rounded regardless of data partitioning, tiling, reduction-tree
shape, or mesh size.

Design (see DESIGN.md):
* fp64 floats never touch the device -- doubles cross the host boundary as
  raw bit patterns (uint32 pairs, :class:`exblas_tpu.core.F64Bits`);
* all device arithmetic is exact int32 limb arithmetic on the VPU
  (base-2^20 Kulisch superaccumulators, Pallas kernels);
* every merge -- lanes, grid steps, cross-chip ``psum`` -- is an exact integer
  add, so reproducibility holds by construction (no atomics, no races);
* the final double is assembled bitwise with round-to-nearest-even.

int64 is required at the XLA level (epilogues), hence x64 mode is enabled at
import.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Remote-TPU compiles are expensive (minutes); persist them across processes.
# JAX_EXBLAS_CACHE=0 opts out: the CPU test suite disables the persistent
# cache (tests/conftest.py) because CPU executables AOT-compiled via the
# remote helper can carry mismatched machine features, and concurrent
# writers (a TPU fuzz run alongside the CPU suite) can segfault the
# cache reader.
if _os.environ.get("JAX_EXBLAS_CACHE", "1") != "0":
    _cache_dir = _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/jax_exblas")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without these options
        pass

from . import core  # noqa: E402
from .ops import (  # noqa: E402
    exsum, exsum_acc, exsum_bits, exsum_segmented,
    exdot, exdot_acc, exdot_bits,
    exgemv, exgemm, extrsv,
)
from .utils.generators import (  # noqa: E402
    init_fpuniform,
    init_fpuniform_matrix,
    init_fpuniform_tr_matrix,
    init_ill_cond,
    init_lognormal,
    init_lognormal_matrix,
    init_lognormal_tr_matrix,
    init_naive,
)

__version__ = "0.1.0"

__all__ = [
    "core",
    "exsum",
    "exsum_acc",
    "exsum_bits",
    "exsum_segmented",
    "exdot",
    "exdot_acc",
    "exdot_bits",
    "exgemv",
    "exgemm",
    "extrsv",
    "init_fpuniform",
    "init_fpuniform_matrix",
    "init_fpuniform_tr_matrix",
    "init_ill_cond",
    "init_lognormal",
    "init_lognormal_matrix",
    "init_lognormal_tr_matrix",
    "init_naive",
]
