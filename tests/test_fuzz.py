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
