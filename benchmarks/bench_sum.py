"""ExSUM throughput at n=2^24 (BASELINE.md config) by distribution, plus
the non-reproducible emulated-f64 control.

Reproduces the RESULTS.md ExSUM rows.  Amortized timing (R dependent
iterations in one jit; see utils/bench_utils.py).  The per-iteration XOR
perturbation defeats loop-invariant hoisting but adds one extra HBM read
+ write of the 4-byte lo plane (~17% traffic) that the reported GB/s does
NOT credit -- kernel-only rates are ~1.2x higher.

Run:  python benchmarks/bench_sum.py
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
    from exblas_tpu.ops.exsum import _exsum_bits_mxu_auto
    from exblas_tpu.ops.kernels.sum_kernel import exsum_bits_pallas
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 1 << 24
    dists = {
        "narrow": xb.init_fpuniform(n, 2, 0, seed=7),
        "wide": xb.init_fpuniform(n, 50, -25, seed=8),
        "illcond": xb.init_ill_cond(n, 1e30, seed=9),
        "lognormal": xb.init_lognormal(n, 1.0, 2.0, seed=10),
    }

    def mk_impl(fn):
        def mk(R):
            @jax.jit
            def f(hi, lo):
                def body(state, it):
                    r = fn(hi, lo ^ state.astype(jnp.uint32))
                    return state ^ r, None
                s, _ = jax.lax.scan(body, jnp.uint64(0),
                                    jnp.arange(R, dtype=jnp.uint32))
                return s
            return f
        return mk

    impls = {
        "auto(mxu)": _exsum_bits_mxu_auto,   # sampled-anchor MXU ladder
        "vpu": exsum_bits_pallas,            # windowed-deposit VPU kernel
    }
    out = {}
    for name, x in dists.items():
        b = split_f64(x)
        hi = jax.device_put(b.hi)
        lo = jax.device_put(b.lo)
        for iname, fn in impls.items():
            t = amortized_seconds(mk_impl(fn), (hi, lo), R=129, reps=4)
            gbps = round(8.0 * n / t / 1e9, 1)
            if iname == "auto(mxu)":
                out[name] = gbps
            print(json.dumps({"dist": name, "impl": iname, "GBps": gbps}),
                  flush=True)

    # control: non-reproducible emulated-f64 jnp.sum
    xd = jax.device_put(jnp.asarray(dists["narrow"]))

    def mk_base(R):
        @jax.jit
        def f(xd):
            def body(state, it):
                return state + jnp.sum(xd + state * 1e-300) * 1e-300, None
            s, _ = jax.lax.scan(body, jnp.float64(0),
                                jnp.arange(R, dtype=jnp.int32))
            return s
        return f

    t = amortized_seconds(mk_base, (xd,), R=129, reps=4)
    print(json.dumps({"dist": "control_f64emu_sum",
                      "GBps": round(8.0 * n / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
