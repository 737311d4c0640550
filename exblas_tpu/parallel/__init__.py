from .distributed import (
    exdot_sharded,
    exsum_sharded,
    make_mesh,
    psum_superacc,
)
from .blas2 import exgemm_sharded, exgemv_sharded

__all__ = [
    "exdot_sharded",
    "exgemm_sharded",
    "exgemv_sharded",
    "exsum_sharded",
    "make_mesh",
    "psum_superacc",
]
