"""Large virtual-mesh invariance (32 / 64 devices), committed evidence for
the README claim ("validated on host-simulated meshes up to 32 devices").

The conftest pins this process to 8 virtual devices (the JAX device count
is process-global), so the large-mesh checks run in a subprocess with
``--xla_force_host_platform_device_count=64`` -- the TPU-native analog of
scaling the reference's `mpirun -np N` matrix (reference
src/cpu/blas/blas1/CMakeLists.txt:19-26) beyond one node.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r'''
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # the axon TPU plugin overrides JAX_PLATFORMS
import exblas_tpu as xb
from exblas_tpu.parallel import exsum_sharded, exdot_sharded, make_mesh

assert len(jax.devices()) == 64, len(jax.devices())

def f(bits):
    return np.asarray(bits).reshape(1).view(np.float64)[0]

# ExSUM: bit-identical on 1 / 32 / 64-device meshes (ill-conditioned data)
x = xb.init_ill_cond(20000, 1e28, seed=71)
want = f(exsum_sharded(x, mesh=make_mesh(1), impl="xla"))
for nd in (32, 64):
    got = f(exsum_sharded(x, mesh=make_mesh(nd), impl="xla"))
    assert np.float64(got).tobytes() == np.float64(want).tobytes(), nd
print("sum ok")

# uneven shards at 64 devices (n % 64 != 0): padding must not change bits
x2 = xb.init_fpuniform(20011, 40, -10, seed=72)
a64 = f(exsum_sharded(x2, mesh=make_mesh(64), impl="xla"))
a1 = f(exsum_sharded(x2, mesh=make_mesh(1), impl="xla"))
assert np.float64(a64).tobytes() == np.float64(a1).tobytes()
print("uneven ok")

# ExDOT across 64 devices
a = xb.init_ill_cond(8192, 1e20, seed=73)
b = xb.init_ill_cond(8192, 1e20, seed=74)
d64 = f(exdot_sharded(a, b, mesh=make_mesh(64), impl="xla"))
d1 = f(exdot_sharded(a, b, mesh=make_mesh(1), impl="xla"))
assert np.float64(d64).tobytes() == np.float64(d1).tobytes()
print("dot ok")

# specials crossing 64 shards stay deterministic
xs = np.concatenate([np.full(100, 1.0), [np.inf], np.full(900, 2.0)])
assert f(exsum_sharded(xs, mesh=make_mesh(64), impl="xla")) == np.inf
print("ALL OK")
'''


@pytest.mark.filterwarnings("ignore")
def test_mesh_invariance_64_devices():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=64",
        JAX_ENABLE_X64="1",
    )
    env.pop("JAX_EXBLAS_TPU_TESTS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, cwd=root,
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "ALL OK" in r.stdout
