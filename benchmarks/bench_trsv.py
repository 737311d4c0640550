"""ExTRSV device time at n=8192 (BASELINE.md config): left-looking Pallas
kernel vs the non-reproducible emulated-f64 triangular_solve control.

Run:  python benchmarks/bench_trsv.py [n]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gen_tr_bits_device(n: int, block: int = 2048):
    """Lower-triangular bit-pair matrix generated ON DEVICE (for n where an
    8-byte/element host matrix would take minutes through the tunnel and
    gigabytes of host RAM).  Diagonal in [1, 2) with 52 random mantissa
    bits; strict-lower magnitudes ~2^-60 (random mantissas) so the solution
    stays bounded; upper = +0.0.  Kernel timing is data-independent (the
    digit-plane deposit does fixed work), so this times the same kernel the
    host-generated path does."""
    import jax
    import jax.numpy as jnp

    import functools

    nb = -(-n // block)
    assert n % block == 0, "devgen wants block | n (bitcast reshape, no copy)"

    def one(i):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        k1, k2 = jax.random.split(key)
        man = jax.random.bits(k1, (block, n), jnp.uint32) & jnp.uint32(0xFFFFF)
        lo = jax.random.bits(k2, (block, n), jnp.uint32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (block, n), 0) + i * block
        ci = jax.lax.broadcasted_iota(jnp.int32, (block, n), 1)
        diag = ri == ci
        lower = ri > ci
        hi = jnp.where(diag, jnp.uint32(0x3FF00000) | man,
                       jnp.where(lower, jnp.uint32(0x3C300000) | man,
                                 jnp.uint32(0)))
        return hi, jnp.where(diag | lower, lo, jnp.uint32(0))

    # one jit end-to-end: the eager path's reshape/slice copies doubled the
    # 8.6 GB footprint at n=32768 and OOM'd; jitted, the reshape is a bitcast
    @jax.jit
    def gen():
        hi, lo = jax.lax.map(one, jnp.arange(nb))
        return hi.reshape(n, n), lo.reshape(n, n)

    return gen()


def main():
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.extrsv import _trsv_lower_pallas_jit
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    devgen = n > 16384 or "--devgen" in sys.argv
    b = xb.init_fpuniform(n, 4, 0, seed=2)
    bb = split_f64(b)
    if devgen:
        t_hi, t_lo = _gen_tr_bits_device(n)
        t_hi.block_until_ready()
        args = (t_hi, t_lo, jax.device_put(bb.hi), jax.device_put(bb.lo))
    else:
        a = xb.init_fpuniform_tr_matrix("L", "N", n, 4, 0, seed=1)
        tb = split_f64(a)
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

    if devgen:
        # the control would need a second ~8n^2-byte matrix alongside the
        # bit pair -- past HBM at n=32768; run it in its own invocation
        return

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
