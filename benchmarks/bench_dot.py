"""ExDOT throughput at n=2^24 (the BASELINE.md declared config) by
distribution, plus the non-reproducible emulated-f64 control.

Run:  python benchmarks/bench_dot.py [log2n]
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
    from exblas_tpu.ops.kernels.dot_kernel import exdot_bits_pallas
    from exblas_tpu.utils.bench_utils import amortized_seconds

    from exblas_tpu.ops.exdot import _exdot_bits_mxu_auto

    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
    rng = __import__("numpy").random.default_rng(5)
    cases = {
        "narrow": (xb.init_fpuniform(n, 2, 0, seed=7),
                   xb.init_fpuniform(n, 2, 0, seed=8)),
        "wide": (xb.init_fpuniform(n, 50, -25, seed=9),
                 xb.init_fpuniform(n, 50, -25, seed=10)),
        "lognormal": (xb.init_lognormal(n, 1.0, 2.0, seed=11),
                      xb.init_lognormal(n, 1.0, 2.0, seed=12)),
        "illcond_1e30": (xb.init_ill_cond(n, 1e30, seed=13),
                         rng.uniform(0.5, 2.0, n)),
    }

    def mk_path(dot_fn):
        def mk(R):
            @jax.jit
            def f(ha, la, hb, lb):
                def body(state, it):
                    r = dot_fn(ha, la ^ state.astype(jnp.uint32), hb, lb)
                    return state ^ r, None
                s, _ = jax.lax.scan(body, jnp.uint64(0),
                                    jnp.arange(R, dtype=jnp.uint32))
                return s
            return f
        return mk

    for name, (a, b) in cases.items():
        ab, bb = split_f64(a), split_f64(b)
        args = tuple(jax.device_put(v) for v in
                     (ab.hi, ab.lo, bb.hi, bb.lo))
        for path, fn in (("mxu_auto", _exdot_bits_mxu_auto),
                         ("vpu", exdot_bits_pallas)):
            t = amortized_seconds(mk_path(fn), args, R=129, reps=4)
            print(json.dumps({"dist": name, "path": path,
                              "GBps": round(16.0 * n / t / 1e9, 1)}),
                  flush=True)

    ad = jax.device_put(jnp.asarray(cases["narrow"][0]))
    bd = jax.device_put(jnp.asarray(cases["narrow"][1]))

    def mk_base(R):
        @jax.jit
        def f(ad, bd):
            def body(state, it):
                return state + jnp.dot(ad + state * 1e-300, bd) * 1e-300, None
            s, _ = jax.lax.scan(body, jnp.float64(0),
                                jnp.arange(R, dtype=jnp.int32))
            return s
        return f

    t = amortized_seconds(mk_base, (ad, bd), R=129, reps=4)
    print(json.dumps({"dist": "control_f64emu_dot",
                      "GBps": round(16.0 * n / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
