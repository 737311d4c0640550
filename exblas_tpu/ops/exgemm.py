"""ExGEMM: C := C + A*B, reproducible (placeholder, built next)."""

from __future__ import annotations


def exgemm(*args, **kwargs):
    raise NotImplementedError("exgemm is implemented in a later milestone")
