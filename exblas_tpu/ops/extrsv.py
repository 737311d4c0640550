"""ExTRSV: solve T*x = b, reproducible (placeholder, built next)."""

from __future__ import annotations


def extrsv(*args, **kwargs):
    raise NotImplementedError("extrsv is implemented in a later milestone")
