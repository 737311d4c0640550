"""RNGExample analog: summation of random numbers under adversarial
partitioning (reference RNGExample.cpp:373-451, 532-600: pthread partial
sums with random splits, partials combined by one more exsum)."""

from __future__ import annotations

import numpy as np

from ..ops.exsum import exsum, exsum_acc
from ..core.rounding import round_superacc_to_f64_bits


def _partitioned_float_sum(x, rng):
    """Non-reproducible control: random partitions, float partial sums,
    combined in random order."""
    n = len(x)
    cuts = np.sort(rng.choice(n, size=rng.randint(2, 16), replace=False))
    parts = np.split(x, cuts)
    order = rng.permutation(len(parts))
    total = 0.0
    for i in order:
        total += float(np.sum(parts[i]))
    return total


def _partitioned_exsum(x, rng, impl=None):
    """Reproducible path: random partitions, each reduced exactly, partials
    merged exactly (integer limb adds) in random order."""
    n = len(x)
    cuts = np.sort(rng.choice(n, size=rng.randint(2, 16), replace=False))
    parts = np.split(x, cuts)
    order = rng.permutation(len(parts))
    total = None
    for i in order:
        acc = exsum_acc(parts[i], impl=impl)
        total = acc if total is None else total + acc
    bits = round_superacc_to_f64_bits(total)
    return float(np.asarray(bits).reshape(1).view(np.float64)[0])


def rng_sum_experiment(n: int = 100_000, repeats: int = 10, seed: int = 0,
                       impl: str | None = None) -> dict:
    """Shuffle-and-rerun protocol.  Returns bitwise-uniqueness counts."""
    rng = np.random.RandomState(seed)
    x = (rng.uniform(-1, 1, n) * np.exp2(rng.randint(-30, 30, n)))

    repro_bits, control_bits = set(), set()
    for _ in range(repeats):
        perm = rng.permutation(n)
        xs = x[perm]
        repro_bits.add(np.float64(_partitioned_exsum(xs, rng, impl)).tobytes())
        control_bits.add(np.float64(_partitioned_float_sum(xs, rng)).tobytes())

    single = exsum(x, impl=impl)
    return {
        "repro_unique": len(repro_bits),          # must be 1
        "control_unique": len(control_bits),      # > 1 expected
        "repro_equals_single_pass": (
            np.float64(single).tobytes() in repro_bits
        ),
        "value": single,
    }
