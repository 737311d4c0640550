"""Wide-rung MXU GEMV benchmark: the round-3 dynamic-range extension.

Round 2's byte-plane GEMV was capped at 128 anchored bits per side
(rung (4,4)); wider per-row spreads fell to the VPU digit-plane kernel
at ~86 GB/s.  Round 3 extends the rung ladder to (8,6) = 256/192
anchored bits.  Unlike GEMM, the extra cost is only per-element slicing
work (~8 ops/word), so wide data should run at a large fraction of the
covered rate.  This measures each wide rung at m=k=8192 on the real TPU
through the full auto ladder (sampling + routing included):

    python benchmarks/bench_gemv_wide.py [m] [k]
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
    from exblas_tpu.ops.exgemv import _gemv_bits_auto, _scalar_bits
    from exblas_tpu.utils.bench_utils import amortized_seconds

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    one_h, one_l = _scalar_bits(1.0)
    zero_h, zero_l = _scalar_bits(0.0)
    yz = jnp.zeros((m,), jnp.uint32)

    def mk(R):
        @jax.jit
        def f(ah, al, xh, xl):
            def body(state, it):
                bits = _gemv_bits_auto(
                    ah, al, xh ^ (it & jnp.uint32(1)), xl, one_h, one_l,
                    zero_h, zero_l, yz, yz, "zero", 128)
                return state ^ bits[0], None
            out, _ = jax.lax.scan(body, jnp.uint64(0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return f

    # per-row spread ~ rng_bits + 54; rungs cover 64*nwa-ish anchored bits
    # (round-4: (12,7)/(16,7) extend A-side coverage to 384/512 bits)
    for label, rng_bits in (("rung(3,3)~96b", 40), ("rung(4,4)~128b", 70),
                            ("rung(5,4)~160b", 100), ("rung(6,5)~192b", 135),
                            ("rung(8,6)~256b", 195), ("rung(12,7)~384b", 310),
                            ("rung(16,7)~512b", 440), ("vpu(>512b)", 490)):
        a = xb.init_fpuniform_matrix(m, k, rng_bits, -rng_bits // 2, seed=3)
        x = xb.init_fpuniform(k, min(rng_bits, 130), 0, seed=4)
        ab, xb_ = split_f64(a), split_f64(x)
        args = tuple(jax.device_put(v) for v in
                     (ab.hi, ab.lo, xb_.hi, xb_.lo))
        t = amortized_seconds(mk, args, R=17, reps=3)
        print(json.dumps({
            "case": label, "range_bits": rng_bits,
            "GBps": round(8.0 * m * k / t / 1e9, 1),
            "GFLOPs": round(2.0 * m * k / t / 1e9, 1),
            "ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
