"""Deterministic slice of the mesh-invariance stress fuzzer (fuzz_mesh.py).

Runs in a subprocess because the virtual device count is process-global
(the conftest pins this process to 8 devices); 16 devices exercises mesh
sizes and 2-D factorizations beyond the in-process tests.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.filterwarnings("ignore")
def test_fuzz_mesh_deterministic_slice():
    env = dict(os.environ, JAX_ENABLE_X64="1")
    env.pop("JAX_EXBLAS_TPU_TESTS", None)
    env.pop("XLA_FLAGS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tests/fuzz_mesh.py", "--cases", "10",
         "--seed", "20260825", "--devices", "16"],
        env=env, cwd=root, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (
        f"stdout:\n{r.stdout[-4000:]}\nstderr:\n{r.stderr[-3000:]}")
    assert "0 failures" in r.stdout and r.stdout.count("PASS") == 10
