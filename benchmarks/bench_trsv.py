"""ExTRSV device time at n=8192 (BASELINE.md config): left-looking Pallas
kernel vs the non-reproducible emulated-f64 triangular_solve control.

Run:  python benchmarks/bench_trsv.py [n]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.extrsv import _trsv_lower_pallas_jit
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    a = xb.init_fpuniform_tr_matrix("L", "N", n, 4, 0, seed=1)
    b = xb.init_fpuniform(n, 4, 0, seed=2)
    tb, bb = split_f64(a), split_f64(b)
    args = tuple(jax.device_put(v) for v in
                 (tb.hi, tb.lo, bb.hi, bb.lo))

    def mk(R):
        @jax.jit
        def f(th, tl, bh, bl):
            def body(state, it):
                bits = _trsv_lower_pallas_jit(
                    th, tl, bh, bl ^ (state.astype(jnp.uint32)
                                      & jnp.uint32(1)),
                    unit=False)
                return state ^ bits[0], None
            s, _ = jax.lax.scan(body, jnp.uint64(0),
                                jnp.arange(R, dtype=jnp.uint32))
            return s
        return f

    t = amortized_seconds(mk, args, R=5, reps=3)
    print(json.dumps({"routine": "extrsv_pallas", "n": n,
                      "ms": round(t * 1e3, 1),
                      "GFLOPs": round(n * n / t / 1e9, 2)}), flush=True)

    ad = jax.device_put(jnp.asarray(a))
    bd = jax.device_put(jnp.asarray(b))

    def mk_base(R):
        @jax.jit
        def f(ad, bd):
            def body(state, it):
                r = jax.scipy.linalg.solve_triangular(
                    ad, bd + state * 1e-30, lower=True)
                return state + r[0] * 1e-30, None
            s, _ = jax.lax.scan(body, jnp.float64(0),
                                jnp.arange(R, dtype=jnp.int32))
            return s
        return f

    t = amortized_seconds(mk_base, (ad, bd), R=5, reps=3)
    print(json.dumps({"routine": "control_f64emu_trsv", "n": n,
                      "ms": round(t * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
