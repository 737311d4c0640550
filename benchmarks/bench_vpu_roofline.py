"""VPU integer-op roofline probe.

ExSUM/ExDOT/ExGEMV on TPU are *decode-bound*: every exact method must read
each f64's exponent and align its significand to an accumulator grid, which
costs tens of int32 VPU ops per element -- while the chip can stream far
more bytes from HBM than the VPU can decode.  This probe measures the
sustained int32 op rate of a Pallas kernel that streams the same
(rows, 128) x 2 uint32 layout as the sum kernel and runs a serially
dependent chain of OPS int ops per element.  The resulting ops/s ceiling,
divided by the decode's op count, is the honest speed-of-light for exact
streaming reductions (reported next to the measured kernels in RESULTS.md).

Run:  python benchmarks/bench_vpu_roofline.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
ROWS = 512


def make_kernel(ops: int):
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _I = jnp.int32
    _Z = _np.int32(0)

    def kernel(hi_ref, lo_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        v = jax.lax.bitcast_convert_type(hi_ref[...], _I)
        w = jax.lax.bitcast_convert_type(lo_ref[...], _I)
        # serially dependent chain: 2 ops per loop step (xor + add)
        for t in range(ops // 2):
            v = (v ^ w) + _I(2 * t + 1)
        acc[...] += jnp.sum(v.reshape(ROWS // 8, 8, LANES), axis=0,
                            dtype=_I)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    @functools.partial(jax.jit, static_argnames=())
    def run(hi, lo):
        nrows = hi.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(nrows // ROWS,),
            in_specs=[
                pl.BlockSpec((ROWS, LANES), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, LANES), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (_Z, _Z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        )(hi, lo)

    return run


def main():
    import jax
    import jax.numpy as jnp
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 1 << 24
    rng_hi = jnp.arange(n, dtype=jnp.uint32).reshape(-1, LANES)
    rng_lo = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
              ).reshape(-1, LANES)
    hi = jax.device_put(rng_hi)
    lo = jax.device_put(rng_lo)

    out = {}
    for ops in (0, 8, 16, 32, 48, 64):
        run = make_kernel(ops)

        def mk(R, run=run):
            @jax.jit
            def f(hi, lo):
                def body(state, it):
                    r = run(hi ^ state, lo)
                    return state ^ r[0, 0].astype(jnp.uint32), None
                s, _ = jax.lax.scan(body, jnp.uint32(0),
                                    jnp.arange(R, dtype=jnp.uint32))
                return s
            return f

        t = amortized_seconds(mk, (hi, lo), R=17, reps=3)
        out[ops] = {
            "GBps": round(8.0 * n / t / 1e9, 1),
            "Gelem_per_s": round(n / t / 1e9, 2),
            "Gops_per_s": round(ops * n / t / 1e9, 1) if ops else None,
        }
        print(json.dumps({"ops_per_elem": ops, **out[ops]}), flush=True)


if __name__ == "__main__":
    main()
