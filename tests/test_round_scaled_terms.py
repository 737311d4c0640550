"""round_scaled_terms: the one-launch Pallas tail of the MXU sum/dot
epilogues (limb build + canonicalize + correctly-rounded conversion),
checked against the exact Fraction oracle in interpret mode.

The MXU sum/dot bits paths route through this kernel (sum_mxu.sum_bits_mxu,
dot_mxu.dot_bits_mxu), so the existing sum/dot interpret + hardware tests
exercise it end to end; this file pins the kernel's own contract,
including signs, cancellation, overflow-to-Inf and subnormal exponents.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from exblas_tpu.ops.kernels.round_in_kernel import round_scaled_terms
from oracle import _round_fraction


def _check(vals, pos, eadj, l_rel):
    with pltpu.force_tpu_interpret_mode():
        hi, lo = round_scaled_terms(
            jnp.asarray(vals, jnp.int64), tuple(int(p) for p in pos),
            jnp.int32(eadj), l_rel)
    got = np.uint64((int(hi) << 32) | int(lo)).view(np.float64)
    v = sum(int(x) * (1 << int(p)) for x, p in zip(vals, pos))
    want = _round_fraction(Fraction(v) * Fraction(2) ** int(eadj))
    assert np.float64(want).tobytes() == np.float64(got).tobytes(), (
        vals, pos, eadj, float(got), want)


def test_basic_and_edges():
    _check([5], [0], 0, 3)
    _check([5, -3], [0, 8], -10, 3)
    _check([0] * 4, [0, 20, 40, 60], 0, 6)          # zero -> +0
    _check([1, -1], [0, 0], 0, 3)                   # exact cancellation
    _check([-(1 << 40), 1], [0, 0], 5, 5)
    _check([1], [0], 1100, 3)                       # overflow -> +Inf
    _check([-1], [0], 1100, 3)                      # -> -Inf
    _check([3], [0], -1074, 3)                      # subnormal
    _check([1], [0], -1100, 3)                      # underflow -> +0


@pytest.mark.parametrize("seed", [0, 1])
def test_random_vs_fraction(seed):
    rng = np.random.RandomState(seed)
    l_rel = (300 + 54) // 20 + 2
    for _ in range(12):
        t = int(rng.randint(1, 60))
        vals = rng.randint(-2 ** 48, 2 ** 48, t).tolist()
        pos = rng.randint(0, 300, t).tolist()
        eadj = int(rng.randint(-1200, 1100))
        _check(vals, pos, eadj, l_rel)
