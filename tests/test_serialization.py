"""Checkpoint/resume: a reduction interrupted, saved, restored, and resumed
must produce the identical bits of an uninterrupted run."""

import os
import tempfile

import numpy as np

import exblas_tpu as xb
from exblas_tpu.core.rounding import round_superacc_to_f64_bits
from exblas_tpu.core.serialization import load_superacc, save_superacc
from oracle import assert_same_bits, exact_sum


def test_checkpoint_resume_exact():
    x = xb.init_ill_cond(20000, 1e28, seed=31)
    ref = xb.exsum(x, impl="xla")

    acc1 = xb.exsum_acc(x[:7321], impl="xla")
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        save_superacc(path, acc1)
        restored = load_superacc(path)

    acc2 = xb.exsum_acc(x[7321:], impl="xla")
    total = restored + acc2
    got = float(np.asarray(round_superacc_to_f64_bits(total))
                .reshape(1).view(np.float64)[0])
    assert_same_bits(got, ref, "resume")
    assert_same_bits(got, exact_sum(x), "resume-vs-oracle")


def test_superacc_dump():
    """Hex introspection analog of Superaccumulator::Dump (reference
    superaccumulator.cpp:164-184)."""
    import exblas_tpu as xb

    acc = xb.exsum_acc(np.array([1.5, -0.25]), impl="xla")
    s = acc.dump()
    assert "superacc[112x20b" in s and "V=" in s
    # exact value: 1.25 * 2^1074
    assert f"V={int(1.25 * 4) << (1074 - 2)}" in s
    assert "nan=0 +inf=0 -inf=0" in s
    acc2 = xb.exsum_acc(np.array([np.inf, np.nan]), impl="xla")
    assert "nan=1 +inf=1" in acc2.dump()
