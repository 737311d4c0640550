"""Decompose the ExDOT MXU path's fixed overhead, stage by stage.

n defaults to 2^23; pass log2(n) as the sole argv parameter to change it
(e.g. ``python benchmarks/bench_dot_overhead.py 24`` for n=2^24).

This harness drove the round-4 redesign (it exposed the ~0.77 ms
conditional-routing cost that led to the branch-free full-window path);
it times each stage separately with the amortized-R protocol:

  * vpu        -- exdot_bits_pallas (the any-data fallback kernel)
  * kernel     -- _run_dot_kernel only (pre-padded inputs, fixed anchors:
                  the raw MXU matmul loop + spill, no routing/epilogue)
  * tier       -- dot_bits_mxu (kernel + one-launch term rounding, fixed
                  anchors, no sampling/cold-retry scaffolding)
  * sample     -- the two sample_anchor passes alone
  * ladder     -- _exdot_bits_mxu_auto end to end (sample + unconditional
                  kernel + untaken cold-retry cond)

GB/s uses 16 bytes/element (both streams).  Stage deltas attribute the
overhead: ladder-tier = routing residue (incl. the scan harness's
materialized xor-perturbed stream captured by the cold cond),
tier-kernel = epilogue, sample = sampling.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.exdot import _exdot_bits_mxu_auto
    from exblas_tpu.ops.kernels.dot_kernel import exdot_bits_pallas
    from exblas_tpu.ops.kernels.dot_mxu import (
        WIDE, _run_dot_kernel, dot_bits_mxu, dot_pad_rows)
    from exblas_tpu.ops.kernels.sum_mxu import sample_anchor
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)
    a = xb.init_fpuniform(n, 2, 0, seed=7)
    b = xb.init_fpuniform(n, 2, 0, seed=8)
    ab, bb = split_f64(a), split_f64(b)
    flat = tuple(jax.device_put(v) for v in (ab.hi, ab.lo, bb.hi, bb.lo))
    r8 = dot_pad_rows(n)
    padded = tuple(jax.device_put(jnp.asarray(v).reshape(r8, WIDE))
                   for v in flat)  # n is a multiple of WIDE*8 here
    ea = jnp.int32(1 + 8)
    eb = jnp.int32(1 + 8)

    def mk(fn, args_are_padded):
        def make(R):
            @jax.jit
            def f(ha, la, hb, lb):
                def body(state, it):
                    r = fn(ha, la ^ state.astype(jnp.uint32), hb, lb)
                    return state ^ r, None
                s, _ = jax.lax.scan(body, jnp.uint64(0),
                                    jnp.arange(R, dtype=jnp.uint32))
                return s
            return f
        return make

    def kernel_only(ha, la, hb, lb):
        d, bad = _run_dot_kernel(ha, la, hb, lb, ea, eb)
        return d[0, 0].astype(jnp.uint64) ^ bad.astype(jnp.uint64)

    def tier_only(ha, la, hb, lb):
        bits, bad = dot_bits_mxu(ha, la, hb, lb, ea, eb)
        return bits ^ bad.astype(jnp.uint64)

    def sample_only(ha, la, hb, lb):
        e1, s1 = sample_anchor(ha)
        e2, s2 = sample_anchor(hb)
        return (e1 + e2 + s1 + s2).astype(jnp.uint64) ^ la[0].astype(
            jnp.uint64)

    stages = [
        ("vpu", exdot_bits_pallas, flat),
        ("kernel", kernel_only, padded),
        ("tier", tier_only, padded),
        ("sample", sample_only, flat),
        ("ladder", _exdot_bits_mxu_auto, flat),
    ]
    out = {}
    for name, fn, args in stages:
        t = amortized_seconds(mk(fn, args is padded), args, R=129, reps=4)
        out[name] = {"ms": round(t * 1e3, 4),
                     "GBps": round(16.0 * n / t / 1e9, 1)}
        print(json.dumps({"stage": name, **out[name]}), flush=True)

    print(json.dumps({
        "overhead_ms": {
            "routing (ladder-tier)": round(
                out["ladder"]["ms"] - out["tier"]["ms"], 4),
            "epilogue (tier-kernel)": round(
                out["tier"]["ms"] - out["kernel"]["ms"], 4),
            "sampling (alone)": out["sample"]["ms"],
        }}))


if __name__ == "__main__":
    main()
