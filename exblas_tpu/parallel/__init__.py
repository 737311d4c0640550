from .distributed import (
    exdot_sharded,
    exsum_sharded,
    make_mesh,
    psum_superacc,
)
from .blas2 import (exgemm_sharded, exgemm_sharded_2d, exgemm_sharded_k,
                    exgemv_sharded, exgemv_sharded_2d, make_mesh_2d)
from .trsv import extrsv_sharded

__all__ = [
    "exdot_sharded",
    "extrsv_sharded",
    "exgemm_sharded",
    "exgemm_sharded_2d",
    "exgemm_sharded_k",
    "exgemv_sharded",
    "exgemv_sharded_2d",
    "exsum_sharded",
    "make_mesh",
    "make_mesh_2d",
    "psum_superacc",
]
