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
    # The CPU suite uses its OWN persistent compile cache, for two reasons:
    # * it must NOT share ~/.cache/jax_exblas with the TPU runs -- entries
    #   AOT-compiled via the remote helper can carry mismatched machine
    #   features (SIGILL risk), and concurrent writers can segfault the
    #   reader;
    # * it must not compile everything in-process either: XLA:CPU in this
    #   jaxlib (0.9.0) sporadically SEGFAULTS in backend_compile_and_load
    #   after a few hundred in-process compilations (reproduced twice at
    #   different tests ~40 min into a cold full-suite run).  A warm local
    #   cache keeps the per-process compile count low; entries written
    #   before a crash persist, so reruns converge.
    # JAX_EXBLAS_CACHE=0 keeps exblas_tpu's import from re-pointing the
    # cache at the shared TPU dir after this block.
    os.environ["JAX_EXBLAS_CACHE"] = "0"
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_exblas_cpu_tests"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jit_executables_per_module():
    """Root cause of the full-suite SIGSEGV: every XLA:CPU executable pins
    JIT code pages (measured ~280 mmap regions per test), so one process
    running the whole suite crosses ``vm.max_map_count`` (65530) at ~70%
    and LLVM's next code-page mmap fails inside backend_compile_and_load.
    Dropping the executable caches after each test module keeps the map
    count bounded (verified: clear_caches() returns the process to its
    baseline map count); the persistent compile cache above makes any
    re-JIT of shared helpers cheap."""
    yield
    jax.clear_caches()
