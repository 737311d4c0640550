"""Property test of the rounding core itself: random signed limb states
(canonical and messy, positive and negative, huge and subnormal) must round
exactly like float(Fraction(exact value))."""

import math
from fractions import Fraction

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import exblas_tpu  # noqa: F401
from exblas_tpu.core.rounding import round_superacc_to_f64_bits
from exblas_tpu.core.types import DOT_FORMAT, LIMB_BITS, SUM_FORMAT, Superacc


def _oracle(limbs, fmt):
    v = sum(int(l) << (LIMB_BITS * j) for j, l in enumerate(limbs))
    if v == 0:
        return 0.0
    try:
        return float(Fraction(v, 1 << fmt.offset_bits))
    except OverflowError:
        return math.inf if v > 0 else -math.inf


@pytest.mark.parametrize("fmt", [SUM_FORMAT, DOT_FORMAT],
                         ids=["sum", "dot"])
def test_round_random_limb_states(fmt):
    rng = np.random.RandomState(99)
    L = fmt.n_limbs
    f = jax.jit(round_superacc_to_f64_bits)
    for trial in range(300):
        limbs = np.zeros(L, np.int64)
        kind = trial % 6
        if kind == 0:      # canonical-ish random digits over a random window
            a = rng.randint(0, L - 1)
            b = min(L - 1, a + rng.randint(1, 8))
            limbs[a:b] = rng.randint(0, 1 << LIMB_BITS, b - a)
        elif kind == 1:    # messy signed limbs within int32 range
            a = rng.randint(0, L - 4)
            limbs[a:a + 4] = rng.randint(-(1 << 28), 1 << 28, 4)
        elif kind == 2:    # single limb, low positions (subnormal region)
            limbs[rng.randint(0, 4)] = rng.randint(1, 1 << LIMB_BITS)
        elif kind == 3:    # near the top (overflow region)
            limbs[L - rng.randint(2, 6)] = rng.randint(1, 1 << LIMB_BITS)
        elif kind == 4:    # negative value via a single negative limb
            limbs[rng.randint(0, L - 1)] = -rng.randint(1, 1 << 24)
        else:              # exact tie candidates: one bit + far-below bit
            p = rng.randint(60, fmt.total_bits - 80)
            limbs[p // LIMB_BITS] = 1 << (p % LIMB_BITS)
            if rng.rand() < 0.7:
                q = p - rng.randint(53, 56)
                if q >= 0:
                    limbs[q // LIMB_BITS] += 1 << (q % LIMB_BITS)
        acc = Superacc(limbs=jnp.asarray(limbs, jnp.int32)
                       if np.abs(limbs).max(initial=0) < 2**31
                       else jnp.asarray(limbs),
                       special=jnp.zeros(3, jnp.int32), fmt=fmt)
        got = float(np.asarray(f(acc)).reshape(1).view(np.float64)[0])
        want = _oracle(limbs, fmt)
        assert np.float64(got).tobytes() == np.float64(want).tobytes(), (
            trial, kind, got, want)
