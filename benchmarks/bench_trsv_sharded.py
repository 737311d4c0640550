"""Sharded ExTRSV device time on a real 1-device mesh (round-3 item:
the distributed solve must be device-worthy, not just a correctness
anchor).  extrsv_sharded routes its replicated panel solves and trailing
deposits through the Pallas kernels on TPU; on one device this is the
whole wavefront, so the time should sit within ~2x of the single-chip
kernel (the collective psums are no-ops on nd=1 but the panel is solved
via the shared sub-blocked engine rather than one fused kernel).

Run:  python benchmarks/bench_trsv_sharded.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import exblas_tpu as xb
    from exblas_tpu.parallel import make_mesh
    from exblas_tpu.parallel.trsv import extrsv_sharded

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    a = xb.init_fpuniform_tr_matrix("L", "N", n, 4, 0, seed=1)
    b = xb.init_fpuniform(n, 4, 0, seed=2)
    mesh = make_mesh(1)

    # extrsv_sharded jits internally per call; warm up, then time whole
    # calls (host->device + solve) -- the quantity a user of the
    # distributed API experiences.  The single-chip bench_trsv number is
    # kernel-only; report both wall and a best-of for comparison.
    from exblas_tpu.ops.extrsv import extrsv_bits

    bits = extrsv_sharded("L", "N", "N", a, b, mesh=mesh)
    want = extrsv_bits("L", "N", "N", a, b)
    assert np.asarray(bits).tobytes() == np.asarray(want).tobytes(), \
        "sharded bits != single-chip bits"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = extrsv_sharded("L", "N", "N", a, b, mesh=mesh)
        np.asarray(out)  # forces readback
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(json.dumps({
        "routine": "extrsv_sharded_1dev", "n": n,
        "ms": round(t * 1e3, 1),
        "GFLOPs": round(n * n / t / 1e9, 2),
        "bits_match_single_chip": True}), flush=True)


if __name__ == "__main__":
    main()
