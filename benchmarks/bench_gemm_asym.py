"""Asymmetric MXU rung benchmark: narrow A x wide B at n=4096.

The auto dispatcher picks the cheapest (sa, sb) pair covering each
operand's spread (matmul count = sa*sb): narrow A (<= 64-bit window)
against wide B (<= 96-bit) runs (8, 12) = 96 products instead of the
symmetric (12, 12) = 144 the pre-asymmetric ladder used -- a ~1.5x
kernel-cost cut for mixed-spread data.  Run on the real TPU:

    python benchmarks/bench_gemm_asym.py
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
    a = xb.init_fpuniform_matrix(n, n, 8, 0, seed=1)       # spread <= 61
    b = xb.init_fpuniform_matrix(n, n, 40, -20, seed=2)    # spread <= 93
    ab, bb = split_f64(a), split_f64(b)
    flops = 2.0 * n * n * n

    def make_runner(sa, sb):
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

    for sa, sb in ((8, 12), (12, 12)):
        t = amortized_seconds(make_runner(sa, sb),
                              (ab.hi, ab.lo, bb.hi, bb.lo), R=3, reps=2)
        print(f"(sa={sa}, sb={sb}): {t * 1e3:8.2f} ms  "
              f"{flops / t / 1e12:6.3f} TFLOP-equiv/s")

    # sanity: auto dispatch must agree bitwise with XLA on this data
    got = xb.exgemm("N", "N", 1.0, a[:256, :256], b[:256, :256],
                    beta=0.0, impl="mxu")
    want = xb.exgemm("N", "N", 1.0, a[:256, :256], b[:256, :256],
                     beta=0.0, impl="xla")
    assert (got.view(np.uint64) == want.view(np.uint64)).all()
    print("auto-vs-xla bits: OK (256^2 slice)")


if __name__ == "__main__":
    main()
