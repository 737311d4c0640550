"""Device-resident reproducible k-means throughput (round-3 app upgrade).

Times one jitted k-means iteration (MXU f32 assignment + exact segmented
center update + correctly-rounded division) on the real TPU, vs a plain
non-reproducible f32 iteration.  The reference app loops a scalar exsum
per (cluster, feature) on the host (kmeans_clustering.cpp:203-223); this
measures the batched device analog.

    python benchmarks/bench_kmeans.py [n] [nf] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from exblas_tpu.apps.kmeans import kmeans_step_device, _f32_from_bits
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (n, nf)) * np.exp2(rng.randint(-8, 8, (n, nf)))
    b = split_f64(pts)
    cb = split_f64(pts[:k])
    args = tuple(jax.device_put(jnp.asarray(v))
                 for v in (b.hi, b.lo, cb.hi, cb.lo))

    def mk(R):
        @jax.jit
        def f(hi, lo, c_hi, c_lo):
            def body(carry, it):
                ch, cl = carry
                ch, cl, _ = kmeans_step_device(hi, lo, ch, cl, k)
                return (ch, cl), None
            (ch, cl), _ = jax.lax.scan(body, (c_hi, c_lo),
                                       jnp.arange(R, dtype=jnp.int32))
            return ch[0, 0], cl[0, 0]
        return f

    t = amortized_seconds(mk, args, R=5, reps=3)
    print(json.dumps({
        "routine": "kmeans_step_device_repro", "n": n, "nf": nf, "k": k,
        "ms_per_iter": round(t * 1e3, 2),
        "Melem_per_s": round(n / t / 1e6, 1)}), flush=True)

    # non-reproducible f32 control iteration
    p32 = jax.device_put(_f32_from_bits(args[0], args[1]))
    c32 = jax.device_put(_f32_from_bits(args[2], args[3]))

    def mk_ctl(R):
        @jax.jit
        def f(p32, c32):
            def body(c, it):
                d = (jnp.sum(p32 * p32, 1, keepdims=True)
                     - 2.0 * p32 @ c.T + jnp.sum(c * c, 1)[None, :])
                mem = jnp.argmin(d, axis=1)
                oh = jax.nn.one_hot(mem, k, dtype=jnp.float32)
                sums = oh.T @ p32
                cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)
                return sums / cnt[:, None], None
            c, _ = jax.lax.scan(body, c32, jnp.arange(R, dtype=jnp.int32))
            return c[0, 0]
        return f

    t2 = amortized_seconds(mk_ctl, (p32, c32), R=5, reps=3)
    print(json.dumps({
        "routine": "kmeans_step_f32_control", "n": n, "nf": nf, "k": k,
        "ms_per_iter": round(t2 * 1e3, 2),
        "Melem_per_s": round(n / t2 / 1e6, 1),
        "repro_overhead_x": round(t / t2, 2)}), flush=True)


if __name__ == "__main__":
    main()
