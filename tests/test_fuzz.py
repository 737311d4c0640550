"""Deterministic slice of the fuzz campaign (tests/fuzz.py) wired into CI.

The full campaign is one command:  python tests/fuzz.py --cases 257
(see RESULTS.md for the recorded runs on CPU and TPU hardware).
"""

import pytest

from fuzz import run_case

CAMPAIGN_SEED = 20260816


@pytest.mark.parametrize("idx", range(24))
def test_fuzz_case(idx):
    run_case(idx, CAMPAIGN_SEED, impl="xla", max_n=2000)


def test_fuzz_regression_renorm_top_limb_sign():
    """Fuzz seed 20260820 case 1 (exgemm cancellation 3x2x27, alpha=-1,
    rung (8, 12)): the MXU GEMM's relative-accumulator renorm used to strip
    the top limb's carry, adding 2^(20*l_rel) whenever negative class-0
    (carry-digit x carry-digit) sums put a borrow in the top limb -- 26/81
    elements rounded with the wrong sign.  Replays the exact failing case
    through the MXU path in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        run_case(1, 20260820, impl="pallas", max_n=60000)
