from . import generators, timing  # noqa: F401
