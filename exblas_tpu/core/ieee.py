"""IEEE-754 binary64 bit codec.

On this TPU generation, float64 is software-rewritten by XLA into f32 pairs:
f64 values do not even round-trip through device storage (1e-300 -> 0,
1e308 -> inf), and ``bitcast_convert_type`` on f64 fails to compile.  The
framework therefore never lets fp64 *floats* touch the device: doubles cross
the host boundary once, as raw bit patterns split into (hi, lo) uint32 pairs,
and everything on-device is exact integer arithmetic.

``F64Bits`` is the device-side container for fp64 data (a pytree of two uint32
arrays).  All routine entry points accept numpy float64 arrays (converted here,
zero-copy via ``.view``) or pre-converted ``F64Bits``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .types import F64_EXP_SPECIAL

__all__ = ["F64Bits", "split_f64", "join_f64", "decode_fields"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class F64Bits:
    """A (batch of) IEEE binary64 values as raw (hi, lo) uint32 bit tensors.

    hi holds bits 32..63 (sign, exponent, top 20 fraction bits), lo holds
    bits 0..31.  Shapes of hi and lo are identical and equal the logical
    array shape.
    """

    hi: Any
    lo: Any

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def shape(self):
        return self.hi.shape

    @classmethod
    def from_numpy(cls, x: np.ndarray) -> "F64Bits":
        x = np.ascontiguousarray(x, dtype=np.float64)
        u = x.view(np.uint64)
        hi = (u >> np.uint64(32)).astype(np.uint32)
        lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return cls(hi=jnp.asarray(hi), lo=jnp.asarray(lo))

    def to_numpy(self) -> np.ndarray:
        hi = np.asarray(self.hi, dtype=np.uint64)
        lo = np.asarray(self.lo, dtype=np.uint64)
        return ((hi << np.uint64(32)) | lo).view(np.float64)

    def reshape(self, *shape) -> "F64Bits":
        return F64Bits(hi=self.hi.reshape(*shape), lo=self.lo.reshape(*shape))


def split_f64(x) -> F64Bits:
    """Convert array-like float64 data (host) to F64Bits."""
    if isinstance(x, F64Bits):
        return x
    if isinstance(x, jax.Array) and x.dtype == jnp.float64:
        try:
            platform = next(iter(x.devices())).platform
        except Exception:
            platform = "cpu"
        if platform != "cpu":
            # f64 does not even round-trip TPU storage (f32-pair emulation):
            # the bits are already corrupted by the time we could split them.
            raise ValueError(
                "split_f64: received a float64 jax.Array on a non-CPU "
                "device; fp64 values cannot live on this accelerator "
                "losslessly. Pass a numpy array (or core.F64Bits) instead."
            )
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return F64Bits(hi=u[..., 1], lo=u[..., 0])
    return F64Bits.from_numpy(np.asarray(x, dtype=np.float64))


def join_f64(bits: F64Bits) -> np.ndarray:
    return bits.to_numpy()


@jax.jit
def _transpose_pair(hi, lo):
    return hi.T, lo.T


def transpose_bits(bits: F64Bits) -> F64Bits:
    """Device-side transpose of a 2-D bit-pair matrix.

    The trans='T' paths used to take numpy ``.T`` views at the API
    boundary; feeding those to a jit triggers a single-threaded host
    re-layout copy (~0.75 s per 256 MB uint32 plane at 8192^2).  Shipping
    the original contiguous planes and transposing on-device rides HBM
    instead (~ms), and on the CPU backend XLA's multithreaded transpose
    still beats numpy's.
    """
    hi, lo = _transpose_pair(jnp.asarray(bits.hi), jnp.asarray(bits.lo))
    return F64Bits(hi=hi, lo=lo)


@jax.jit
def _flip2_pair(hi, lo):
    return hi[::-1, ::-1], lo[::-1, ::-1]


def flip2_bits(bits: F64Bits) -> F64Bits:
    """Device-side both-axes reversal of a 2-D bit-pair matrix (the
    upper->lower TRSV mapping); same host-copy rationale as
    ``transpose_bits``."""
    hi, lo = _flip2_pair(jnp.asarray(bits.hi), jnp.asarray(bits.lo))
    return F64Bits(hi=hi, lo=lo)


def decode_fields(hi, lo):
    """Decode (hi, lo) uint32 -> (sign, expfield, mant_hi21, mant_lo32).

    sign      : int32, 0 or 1
    expfield  : int32 in [0, 2047]
    mant_hi21 : uint32, top 21 bits of the 53-bit significand (implicit bit
                included for normals; subnormals have bit 20 clear)
    mant_lo32 : uint32, low 32 bits of the significand

    The represented value is ``(-1)^sign * mant53 * 2^E`` with
    ``E = max(expfield, 1) - 1075`` and ``mant53 = mant_hi21*2^32 + mant_lo32``.
    Works identically on CPU and TPU (pure int32 ops); usable inside Pallas.
    """
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    sign = (hi >> 31).astype(jnp.int32)
    expfield = ((hi >> 20) & jnp.uint32(0x7FF)).astype(jnp.int32)
    frac_hi = hi & jnp.uint32(0xFFFFF)
    is_normal = jnp.logical_and(expfield != 0, expfield != F64_EXP_SPECIAL)
    mant_hi21 = jnp.where(is_normal, frac_hi | jnp.uint32(1 << 20), frac_hi)
    return sign, expfield, mant_hi21, lo
