"""Headline benchmark: reproducible ExDOT vs non-reproducible fp64 control.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = ExDOT (Pallas, exact/reproducible) element throughput at
               n = 2^22, in Gelem/s (amortized timing -- the TPU here sits
               behind a ~35 ms host tunnel, so R dependent iterations run
               inside one jit and the 1-iteration time is subtracted).
vs_baseline  = exdot_time / jnp.dot_time against the non-reproducible
               "fp64" jnp.dot on the same chip (f32-pair emulation -- the
               TPU has no native fp64), i.e. the slowdown factor of exact
               reproducibility.  BASELINE.md north star: <= 2x.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.core.rounding import round_superacc_to_f64_bits
    from exblas_tpu.ops.kernels.dot_kernel import exdot_pallas
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 1 << 22
    a = xb.init_ill_cond(n, 1e16, seed=1)
    b = xb.init_fpuniform(n, 10, 0, seed=2)
    ba, bb = split_f64(a), split_f64(b)
    hi_a, lo_a = jax.device_put(ba.hi), jax.device_put(ba.lo)
    hi_b, lo_b = jax.device_put(bb.hi), jax.device_put(bb.lo)

    def mk_exdot(R):
        @jax.jit
        def f(hi_a, lo_a, hi_b, lo_b):
            def body(state, it):
                acc = exdot_pallas(hi_a, lo_a ^ it, hi_b, lo_b, rows=64)
                return state ^ round_superacc_to_f64_bits(acc), None
            out, _ = jax.lax.scan(
                body, jnp.uint64(0), jnp.arange(R, dtype=jnp.uint32))
            return out
        return f

    t_ex = amortized_seconds(mk_exdot, (hi_a, lo_a, hi_b, lo_b), R=5, reps=2)

    # Non-reproducible fp64 control (reference analog: plain BLAS dot).
    ad = jax.device_put(jnp.asarray(a))
    bd = jax.device_put(jnp.asarray(b))

    def mk_base(R):
        @jax.jit
        def f(ad, bd):
            def body(state, it):
                return state + jnp.dot(ad + state * 0, bd), None
            out, _ = jax.lax.scan(
                body, jnp.float64(0), jnp.arange(R, dtype=jnp.int32))
            return out
        return f

    t_base = amortized_seconds(mk_base, (ad, bd), R=5, reps=2)

    print(json.dumps({
        "metric": "exdot_n2p22_gelem_per_s",
        "value": round(n / t_ex / 1e9, 4),
        "unit": "Gelem/s",
        "vs_baseline": round(t_ex / t_base, 3),
    }))


if __name__ == "__main__":
    main()
