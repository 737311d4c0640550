"""Checkpoint / resume of exact accumulator state.

The reference has no checkpointing, but its superaccumulator is serializable
exact state (get/set_accumulator, reference superaccumulator.hpp:104-113),
which its MPI path exploits.  Here that becomes a first-class feature: a
Superacc is a pytree of integer arrays, so saving and restoring it preserves
the *exact* partial reduction -- a resumed computation is bit-identical to an
uninterrupted one, regardless of where it was cut.
"""

from __future__ import annotations

import numpy as np

from .types import AccFormat, DOT_FORMAT, SUM_FORMAT, Superacc


def superacc_to_arrays(acc: Superacc) -> dict:
    """Host-side snapshot (exact)."""
    return {
        "limbs": np.asarray(acc.limbs),
        "special": np.asarray(acc.special),
        "n_limbs": np.int64(acc.fmt.n_limbs),
        "offset_bits": np.int64(acc.fmt.offset_bits),
    }


def superacc_from_arrays(d) -> Superacc:
    import jax.numpy as jnp

    fmt = AccFormat(n_limbs=int(d["n_limbs"]),
                    offset_bits=int(d["offset_bits"]))
    if fmt == SUM_FORMAT:
        fmt = SUM_FORMAT
    elif fmt == DOT_FORMAT:
        fmt = DOT_FORMAT
    return Superacc(limbs=jnp.asarray(d["limbs"]),
                    special=jnp.asarray(d["special"]), fmt=fmt)


def save_superacc(path: str, acc: Superacc) -> None:
    np.savez(path, **superacc_to_arrays(acc))


def load_superacc(path: str) -> Superacc:
    with np.load(path) as d:
        return superacc_from_arrays(d)
