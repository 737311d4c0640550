"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (mesh-shape invariance) is exercised without TPU hardware,
mirroring the reference's `mpirun -np 2`-on-one-host strategy
(reference src/cpu/blas/blas1/CMakeLists.txt:19-26).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote-TPU backend and
# overrides JAX_PLATFORMS; pin the CPU platform explicitly after import.
# (JAX_EXBLAS_TPU_TESTS=1 disables the pin for tests/test_tpu_kernels.py.)
if os.environ.get("JAX_EXBLAS_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    # CPU AOT results cached from the remote compile helper can carry
    # mismatched machine features (SIGILL risk); compile locally in tests.
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
