from .distributed import (
    exdot_sharded,
    exsum_sharded,
    make_mesh,
    psum_superacc,
)

__all__ = ["exdot_sharded", "exsum_sharded", "make_mesh", "psum_superacc"]
