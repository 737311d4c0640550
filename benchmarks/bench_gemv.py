"""ExGEMV throughput at m=n=8192 (BASELINE.md config): MXU byte-plane path
vs the VPU digit-plane kernel vs the non-reproducible fp64 control.

Amortized timing (R dependent iterations inside one jit, 1-iteration time
subtracted) -- see utils/bench_utils.py for why naive timing is meaningless
behind this environment's ~35 ms host tunnel.

Run:  python benchmarks/bench_gemv.py [m] [k]
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
    from exblas_tpu.ops.exgemv import (_gemv_bits_auto, _gemv_bits_jit,
                                       _scalar_bits)
    from exblas_tpu.utils.bench_utils import amortized_seconds

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    a = xb.init_fpuniform_matrix(m, k, 10, 0, seed=1)
    x = xb.init_fpuniform(k, 10, 0, seed=2)
    ab, xb_ = split_f64(a), split_f64(x)
    one_h, one_l = _scalar_bits(1.0)
    zero_h, zero_l = _scalar_bits(0.0)
    yz = jnp.zeros((m,), jnp.uint32)
    args = tuple(jax.device_put(v) for v in
                 (ab.hi, ab.lo, xb_.hi, xb_.lo))

    def mk(path):
        def mk_R(R):
            @jax.jit
            def f(ah, al, xh, xl):
                def body(state, it):
                    ah2 = ah
                    xh2 = xh ^ (it & jnp.uint32(1))
                    if path == "auto":
                        bits = _gemv_bits_auto(
                            ah2, al, xh2, xl, one_h, one_l,
                            zero_h, zero_l, yz, yz, "zero", 128)
                    else:
                        bits = _gemv_bits_jit(
                            ah2, al, xh2, xl, one_h, one_l,
                            zero_h, zero_l, yz, yz, path, "zero", 128)
                    return state ^ bits[0], None
                out, _ = jax.lax.scan(body, jnp.uint64(0),
                                      jnp.arange(R, dtype=jnp.uint32))
                return out
            return f
        return mk_R

    results = {}
    for path, R in (("auto", 33), ("pallas", 9)):
        t = amortized_seconds(mk(path), args, R=R, reps=3)
        results[path] = {
            "seconds": t,
            "GBps": 8.0 * m * k / t / 1e9,
            "GFLOPs": 2.0 * m * k / t / 1e9,
        }

    # fp64 control (f32-pair emulation; non-reproducible)
    ad = jax.device_put(jnp.asarray(a))
    xd = jax.device_put(jnp.asarray(x))

    def mk_base(R):
        @jax.jit
        def f(ad, xd):
            def body(state, it):
                r = ad @ (xd + state * 0)
                return state + r[0], None
            out, _ = jax.lax.scan(body, jnp.float64(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return out
        return f

    t = amortized_seconds(mk_base, (ad, xd), R=33, reps=3)
    results["control_f64emu"] = {
        "seconds": t,
        "GBps": 8.0 * m * k / t / 1e9,
        "GFLOPs": 2.0 * m * k / t / 1e9,
    }
    print(json.dumps({"m": m, "k": k, **{
        p: {kk: round(vv, 4) for kk, vv in d.items()}
        for p, d in results.items()}}, indent=1))


if __name__ == "__main__":
    main()
