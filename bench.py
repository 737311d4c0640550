"""Headline benchmark: reproducible ExGEMM vs the non-reproducible fp64
control at n=4096 (the BASELINE.json target config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = exact, bit-reproducible ExGEMM (MXU Ozaki-Kulisch slice path)
               throughput at n = 4096 in TFLOP-equiv/s.
vs_baseline  = t_exgemm / t_baseline against the non-reproducible "fp64"
               jnp matmul on the same chip (f32-pair emulation -- the TPU
               has no native fp64).  BASELINE.md north star: <= 2.0.
               Values < 1 mean the *exact* GEMM is faster than the
               non-reproducible control.

Timing is amortized (R dependent iterations inside one jit, 1-iteration time
subtracted) because this TPU sits behind a ~35 ms host tunnel and
block_until_ready does not block through it.
"""

from __future__ import annotations

import json


def main():
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.ops.exgemm import _gemm_bits_auto
    from exblas_tpu.ops.exgemv import _scalar_bits
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 4096
    a = xb.init_fpuniform_matrix(n, n, 10, 0, seed=1)
    b = xb.init_fpuniform_matrix(n, n, 10, 0, seed=2)
    c = xb.init_fpuniform_matrix(n, n, 10, 0, seed=3)
    ab, bb, cb = split_f64(a), split_f64(b), split_f64(c)
    one_h, one_l = _scalar_bits(1.0)
    args = tuple(jax.device_put(v) for v in
                 (ab.hi, ab.lo, bb.hi, bb.lo, cb.hi, cb.lo))

    # Reference default semantics C += A@B (ExGEMM.Superacc.cl:338) through
    # the fully jittable auto dispatch (MXU slice ladder + special override).
    def mk_ex(R):
        @jax.jit
        def f(ah, al, bh, bl, ch, cl):
            def body(state, it):
                bits = _gemm_bits_auto(ah, al ^ (it & jnp.uint32(1)),
                                       bh, bl, one_h, one_l, one_h, one_l,
                                       ch, cl, "one")
                return state ^ bits[0, 0], None
            out, _ = jax.lax.scan(body, jnp.uint64(0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return f

    t_ex = amortized_seconds(mk_ex, args, R=3, reps=2)

    ad = jax.device_put(jnp.asarray(a))
    bd = jax.device_put(jnp.asarray(b))
    cd = jax.device_put(jnp.asarray(c))

    def mk_base(R):
        @jax.jit
        def f(ad, bd, cd):
            def body(state, it):
                r = cd + ad @ (bd + state * 0)
                return state + r[0, 0], None
            out, _ = jax.lax.scan(body, jnp.float64(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return out
        return f

    t_base = amortized_seconds(mk_base, (ad, bd, cd), R=3, reps=2)

    print(json.dumps({
        "metric": "exgemm_n4096_beta1_tflops_exact_reproducible",
        "value": round(2 * n ** 3 / t_ex / 1e12, 3),
        "unit": "TFLOP-equiv/s",
        "vs_baseline": round(t_ex / t_base, 3),
    }))


def fallback():
    """Cheap-compile fallback metric: ExSUM bandwidth at n=2^24."""
    import jax
    import jax.numpy as jnp
    import exblas_tpu as xb
    from exblas_tpu.core.ieee import split_f64
    from exblas_tpu.core.rounding import round_superacc_to_f64_bits
    from exblas_tpu.ops.kernels.sum_kernel import exsum_pallas
    from exblas_tpu.utils.bench_utils import amortized_seconds

    n = 1 << 24
    x = xb.init_fpuniform(n, 2, 0, seed=1)
    b = split_f64(x)
    hi, lo = jax.device_put(b.hi), jax.device_put(b.lo)

    def mk(R):
        @jax.jit
        def f(hi, lo):
            def body(state, it):
                acc = exsum_pallas(hi, lo ^ it, rows=512)
                return state ^ round_superacc_to_f64_bits(acc), None
            out, _ = jax.lax.scan(body, jnp.uint64(0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return f

    t = amortized_seconds(mk, (hi, lo), R=65, reps=3)
    print(json.dumps({
        "metric": "exsum_n2p24_gb_per_s",
        "value": round(n * 8 / t / 1e9, 1),
        "unit": "GB/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # A broken flagship path must never masquerade as a benchmark
        # choice: log the failure loudly before reporting the fallback
        # metric (still one JSON line on stdout for the driver).
        import sys
        import traceback

        print("bench.py: FLAGSHIP GEMM PATH FAILED -- reporting the "
              "ExSUM fallback metric instead. Traceback:", file=sys.stderr)
        traceback.print_exc()
        fallback()
