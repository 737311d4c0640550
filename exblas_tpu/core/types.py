"""Core numeric format constants for the TPU-native superaccumulator.

The reference ExBLAS superaccumulator is 39 x int64 limbs with a 52-bit payload
and 12 carry-save bits (reference: src/cpu/blas/blas1/superaccumulator.hpp:118-120,
include/common.hpp:31-43).  TPU integer datapaths are 32-bit, so we re-derive the
format for int32 limbs (see SURVEY.md §7 "Design stance"):

* ``LIMB_BITS`` = 20 payload bits per int32 limb (base ``2**20``), leaving 11 bits
  of carry slack -- ~2048 signed deposits per lane between (vectorized, branch-free)
  carry-propagation passes.  This replaces the reference's atomic ``xadd`` +
  overflow-side-channel machinery (superaccumulator.hpp:132-171) with
  deterministic, race-free arithmetic.
* A sum accumulator covers every bit position a finite double can populate,
  ``2^-1074 .. 2^1023`` plus >= 64 bits of carry headroom (exact for sums of up
  to ~2^60 terms): ``L_SUM`` limbs.
* A dot accumulator additionally covers the *full product underflow range* down
  to ``2^-2148``: ``L_DOT`` limbs.  This is strictly more exact than the
  reference, whose FMA-based TwoProd loses residuals that underflow
  (acknowledged TODO at reference ExSUM.FPE.hpp:408).

An accumulator with limbs ``v[0..L-1]`` represents the exact integer
``V = sum_j v[j] * 2**(LIMB_BITS*j)`` and the real value ``V * 2**-offset_bits``
where bit 0 of the accumulator sits at ``2**-offset_bits``.

Special values (NaN/Inf) are tracked in a separate, associatively-mergeable
(count-based) side channel -- see :class:`Superacc`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Limb format
# ---------------------------------------------------------------------------

LIMB_BITS = 20
LIMB_BASE = 1 << LIMB_BITS
LIMB_MASK = LIMB_BASE - 1
CARRY_SLACK_BITS = 31 - LIMB_BITS  # 11: log2(#deposits) allowed between renorms

# IEEE-754 binary64 facts.
F64_MANT_BITS = 52          # stored fraction bits
F64_PREC = 53               # significand precision incl. implicit bit
F64_EXP_BIAS = 1023
F64_EXP_SPECIAL = 0x7FF
# value = mant53 * 2**E with E = max(expfield,1) - 1075; E in [-1074, 971].
F64_EMIN_LSB = -1074        # exponent of the least significant representable bit
F64_EMAX_MSB = 1023         # exponent of the most significant representable bit

# Sum accumulator: bit 0 == 2^-1074.  Top populated bit for a single double is
# 1074 + 1023 = 2097 (hence ExBLAS's "2098-bit" accumulator); add 64+ bits of
# headroom for sums of up to ~2^60 terms and round up to a sublane multiple.
SUM_OFFSET_BITS = 1074
_SUM_BITS_NEEDED = 1074 + 1024 + 64
L_SUM = 112  # 112*20 = 2240 bits >= 2162

# Dot accumulator: products reach down to 2^-2148 and up to just below 2^2048.
DOT_OFFSET_BITS = 2148
_DOT_BITS_NEEDED = 2148 + 2048 + 64
L_DOT = 216  # 216*20 = 4320 bits >= 4260

# Indices in the "special" counter vector.
SPECIAL_NAN = 0
SPECIAL_POS_INF = 1
SPECIAL_NEG_INF = 2
N_SPECIAL = 3


@dataclasses.dataclass(frozen=True)
class AccFormat:
    """Static description of a superaccumulator layout."""

    n_limbs: int
    offset_bits: int  # bit 0 of the accumulator == 2**-offset_bits

    @property
    def total_bits(self) -> int:
        return self.n_limbs * LIMB_BITS


SUM_FORMAT = AccFormat(n_limbs=L_SUM, offset_bits=SUM_OFFSET_BITS)
DOT_FORMAT = AccFormat(n_limbs=L_DOT, offset_bits=DOT_OFFSET_BITS)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Superacc:
    """A (batch of) exact Kulisch superaccumulator(s).

    ``limbs``   : int32[..., n_limbs] -- base-2^20 signed limbs, little-endian.
    ``special`` : int32[..., 3]       -- counts of (NaN, +Inf, -Inf) absorbed.
    ``fmt``     : static AccFormat.

    The represented value is exact; merging two Superaccs is element-wise
    integer addition (associative and commutative), which is what makes every
    reduction bit-reproducible regardless of partitioning -- the TPU-native
    equivalent of the reference's limb-wise ``MPI_Reduce(MPI_LONG, MPI_SUM)``
    (reference src/cpu/blas/blas1/ExSUM.cpp:266-273).
    """

    limbs: Any
    special: Any
    fmt: AccFormat

    def tree_flatten(self):
        return (self.limbs, self.special), self.fmt

    @classmethod
    def tree_unflatten(cls, fmt, children):
        limbs, special = children
        return cls(limbs=limbs, special=special, fmt=fmt)

    @classmethod
    def zero(cls, fmt: AccFormat, batch_shape=(), dtype=jnp.int32) -> "Superacc":
        return cls(
            limbs=jnp.zeros(batch_shape + (fmt.n_limbs,), dtype),
            special=jnp.zeros(batch_shape + (N_SPECIAL,), dtype),
            fmt=fmt,
        )

    def __add__(self, other: "Superacc") -> "Superacc":
        assert self.fmt == other.fmt
        return Superacc(
            limbs=self.limbs + other.limbs,
            special=self.special + other.special,
            fmt=self.fmt,
        )

    def dump(self) -> str:
        """Hex dump of the raw limb state for debugging/introspection --
        the analog of ``Superaccumulator::Dump`` (reference
        superaccumulator.cpp:164-184).  Limbs print most-significant first
        (as the reference does), one hex word per limb, with the special
        counters and the exact represented value appended.
        """
        import numpy as np

        limbs = np.asarray(self.limbs)
        special = np.asarray(self.special)
        if limbs.ndim > 1:
            return "\n".join(
                Superacc(limbs=limbs[i], special=special[i],
                         fmt=self.fmt).dump()
                for i in range(limbs.shape[0])
            )
        words = " ".join(
            format(int(v) & 0xFFFFFFFF, "08x") for v in limbs[::-1]
        )
        v = sum(int(x) << (LIMB_BITS * j) for j, x in enumerate(limbs))
        return (
            f"superacc[{self.fmt.n_limbs}x{LIMB_BITS}b "
            f"2^-{self.fmt.offset_bits}] {words} "
            f"| nan={int(special[0])} +inf={int(special[1])} "
            f"-inf={int(special[2])} | V={v}"
        )
