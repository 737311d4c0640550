"""ExGEMV: y := alpha*A*x + beta*y, reproducible (placeholder, built next)."""

from __future__ import annotations


def exgemv(*args, **kwargs):
    raise NotImplementedError("exgemv is implemented in a later milestone")
