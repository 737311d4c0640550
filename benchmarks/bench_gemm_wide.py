"""Wide-rung MXU GEMM benchmark: the round-3 dynamic-range ladder.

The reference's exact GEMM runs at full rate on ANY data (private
superaccumulator per work-item, ExGEMM.Superacc.cl:200-284).  Round 2's
MXU ladder topped out at 128 anchored bits per side; wider data (e.g.
init_ill_cond at c=1e50, spread ~137-166 bits) fell to the exact VPU
kernel at ~6 GFLOP/s.  Round 3 extends the ladder to 256 bits per side;
this measures each wide rung's rate at n=4096 so the cliff is a gentle
slope: cost grows as (sa+1)(sb+1) -- the information-theoretic floor for
a dense byte-slice decomposition.  Run on the real TPU:

    python benchmarks/bench_gemm_wide.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import exblas_tpu as xb
from exblas_tpu.core.ieee import split_f64
from exblas_tpu.ops.kernels.gemm_mxu import gemm_bits_mxu
from exblas_tpu.utils.bench_utils import amortized_seconds

import jax
import jax.numpy as jnp


def main(n: int = 4096):
    flops = 2.0 * n * n * n

    def make_runner(ab, bb, sa, sb):
        def make(R):
            @jax.jit
            def f(ah, al, bh, bl):
                def body(state, it):
                    hi, lo = gemm_bits_mxu(
                        ah, al ^ (it & jnp.uint32(1)), bh, bl,
                        beta_mode="zero", sa=sa, sb=sb)
                    return state ^ hi[0, 0] ^ lo[0, 0], None
                out, _ = jax.lax.scan(body, jnp.uint32(0),
                                      jnp.arange(R, dtype=jnp.uint32))
                return out
            return f
        return make

    # spread per side ~8*sa bits; ill-cond c=1e50 (~166 bits) lands on
    # (24, 24).  The round-4 top rungs (40/48 slices = 320/384 bits)
    # keep even extreme spreads well above the ~6 GFLOP/s VPU fallback;
    # (48, 48) is the VMEM ceiling (see gemm_mxu._pick_kt_bn).
    for sa, sb, rng_bits in ((16, 16, 70), (20, 20, 100), (24, 24, 135),
                             (28, 28, 165), (32, 32, 200), (40, 40, 260),
                             (48, 48, 310)):
        a = xb.init_fpuniform_matrix(n, n, rng_bits, -rng_bits // 2, seed=sa)
        b = xb.init_fpuniform_matrix(n, n, rng_bits, -rng_bits // 2,
                                     seed=sa + 1)
        ab, bb = split_f64(a), split_f64(b)
        t = amortized_seconds(make_runner(ab, bb, sa, sb),
                              (ab.hi, ab.lo, bb.hi, bb.lo), R=3, reps=2)
        print(f"(sa={sa:2d}, sb={sb:2d}) spread<=~{rng_bits + 54:3d}b: "
              f"{t * 1e3:8.2f} ms  {flops / t / 1e12:6.3f} TFLOP-equiv/s",
              flush=True)

    # the headline case: true init_ill_cond data through the full auto
    # dispatcher (round 2: ~23 s on the VPU fallback at n=4096)
    av = xb.init_ill_cond(n * n, 1e50, seed=7).reshape(n, n)
    bv = xb.init_ill_cond(n * n, 1e50, seed=8).reshape(n, n)
    from exblas_tpu.ops.exgemm import _gemm_bits_auto
    from exblas_tpu.ops.exgemv import _scalar_bits

    abv, bbv = split_f64(av), split_f64(bv)
    ah, al = _scalar_bits(1.0)
    zh = zl = jnp.uint32(0)
    cz = jnp.zeros((n, n), jnp.uint32)

    def make_auto(R):
        @jax.jit
        def f(a_hi, a_lo, b_hi, b_lo):
            def body(state, it):
                bits = _gemm_bits_auto(a_hi, a_lo ^ (it & jnp.uint32(1)),
                                       b_hi, b_lo, ah, al, zh, zl,
                                       cz, cz, "zero")
                return state ^ bits[0, 0], None
            out, _ = jax.lax.scan(body, jnp.uint64(0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return f

    t = amortized_seconds(make_auto, (abv.hi, abv.lo, bbv.hi, bbv.lo),
                          R=3, reps=2)
    print(f"auto @ init_ill_cond(1e50): {t * 1e3:8.2f} ms  "
          f"{flops / t / 1e12:6.3f} TFLOP-equiv/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
