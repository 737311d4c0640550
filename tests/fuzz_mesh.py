"""Seeded mesh-invariance stress fuzzer: random mesh shapes x sharding
strategies x distributions x permutations, asserting the framework's core
guarantee -- the SAME BITS from every decomposition (reference README.md:8-10;
the randomized analog of the reference's `mpirun -np 2` CTest matrix,
src/cpu/blas/blas1/CMakeLists.txt:19-26, and of its random-partition
pthread experiments, RNGExample.cpp:336-371).

Every case derives deterministically from (campaign_seed, case_index):

    python tests/fuzz_mesh.py --cases 100 --seed 20260825
    python tests/fuzz_mesh.py --cases 50 --seed 1 --devices 32

Per case, one routine runs on 2-4 random mesh shapes (1-D and, for BLAS-2/3,
2-D meshes with random factorizations) and every available sharding strategy
(rows / k / 2-D); all results must be bitwise identical, sum/dot results
must equal the exact-rational oracle, and a random global permutation
(sum/dot) or k-permutation (gemv/gemm) must not change the bits.
A small deterministic subset runs in pytest (test_fuzz_mesh.py).
"""

from __future__ import annotations

import argparse
import os
import sys

# Device count is process-global and must be set before jax imports.
if __name__ == "__main__":
    _ap = argparse.ArgumentParser(description=__doc__)
    _ap.add_argument("--cases", type=int, default=100)
    _ap.add_argument("--seed", type=int, default=20260825)
    _ap.add_argument("--start", type=int, default=0)
    _ap.add_argument("--devices", type=int, default=16)
    _args = _ap.parse_args()
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={_args.devices}"
        ).strip()

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same cache policy as tests/conftest.py: never load the shared TPU cache
# dir from a CPU process (remote-compiled AOT entries carry mismatched
# machine features -> SIGILL risk), but keep a warm CPU-only cache.
os.environ["JAX_EXBLAS_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # virtual mesh: always host CPU
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_exblas_cpu_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass

from fuzz import DISTRIBUTIONS, gen_vector  # noqa: E402
from oracle import exact_sum_with_specials, native_sum  # noqa: E402

try:
    native_sum([1.0])
    _SUM_ORACLE = native_sum
except Exception:  # pragma: no cover
    _SUM_ORACLE = exact_sum_with_specials


def _bits(x) -> np.ndarray:
    return np.asarray(x).reshape(-1).view(np.uint64)


def _mesh_sizes(rng, nd_max: int, k: int):
    """k distinct device counts in [1, nd_max], always including 1.

    Dims need NOT divide the mesh sizes: every sharded routine pads
    uneven shards with zero rows/columns (exact -- zeros deposit nothing)
    and slices the result, so the draws here are unconstrained (round 3;
    the lcm workaround is gone)."""
    pool = [d for d in range(1, nd_max + 1)]
    picks = {1}
    tries = 0
    while len(picks) < min(k, nd_max) and tries < 32:
        tries += 1
        picks.add(int(rng.choice(pool)))
    return sorted(picks)


def _factor_2d(rng, nd: int):
    """Random (p, q) with p*q == nd."""
    divs = [d for d in range(1, nd + 1) if nd % d == 0]
    p = int(rng.choice(divs))
    return p, nd // p


def run_case(idx: int, campaign_seed: int, nd_max: int) -> str:
    import exblas_tpu as xb
    from exblas_tpu.parallel import (
        exdot_sharded, exgemm_sharded, exgemm_sharded_2d, exgemm_sharded_k,
        exgemv_sharded, exgemv_sharded_2d, exsum_sharded, extrsv_sharded,
        make_mesh, make_mesh_2d,
    )

    rng = np.random.RandomState((campaign_seed * 999983 + idx) % 2 ** 31)
    routine = ["exsum", "exsum", "exdot", "exdot",
               "exgemv", "exgemm", "extrsv"][int(rng.randint(7))]
    dist = DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))]
    meshes = _mesh_sizes(rng, nd_max, k=int(rng.randint(2, 5)))
    label = (f"case {idx} (seed {campaign_seed}): {routine} {dist} "
             f"meshes={meshes}")

    if routine == "exsum":
        # deliberately uneven n most of the time (padding must not matter)
        n = int(rng.randint(1, 20001))
        x = gen_vector(dist, n, rng)
        want = np.float64(_SUM_ORACLE(x)).view(np.uint64)
        for nd in meshes:
            got = _bits(exsum_sharded(x, mesh=make_mesh(nd), impl="xla"))[0]
            assert got == want, f"{label}: mesh {nd} {got:#x} != {want:#x}"
        p = rng.permutation(n)
        nd = meshes[-1]
        got_p = _bits(exsum_sharded(x[p], mesh=make_mesh(nd),
                                    impl="xla"))[0]
        assert got_p == want, f"{label}: permuted mesh {nd} differs"
        return label + f" n={n}"

    if routine == "exdot":
        n = int(rng.randint(1, 12001))
        a = gen_vector(dist, n, rng)
        b_dist = (dist if rng.rand() < 1 / 3 else
                  DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))])
        b = gen_vector(b_dist, n, rng)
        res = [_bits(exdot_sharded(a, b, mesh=make_mesh(nd),
                                   impl="xla"))[0] for nd in meshes]
        assert len(set(res)) == 1, f"{label}: {[hex(r) for r in res]}"
        # dot is a sum of per-index products: any same-pairing permutation
        # must reproduce the bits
        p = rng.permutation(n)
        got_p = _bits(exdot_sharded(a[p], b[p], mesh=make_mesh(meshes[-1]),
                                    impl="xla"))[0]
        assert got_p == res[0], f"{label}: permuted differs"
        return label + f" n={n}"

    if routine == "extrsv":
        # finite data, nonzero diagonal, bounded solution growth -- the
        # same conditioning as fuzz.py's extrsv case; uneven n by default
        # (the sharded solve pads with an identity extension)
        safe = {"special_laced": "fpuniform_std",
                "subnormal_heavy": "fpuniform_std",
                "fpuniform_full": "fpuniform_large"}
        tdist = safe.get(dist, dist)
        nt = int(rng.randint(1, 65))
        uplo = ["L", "U"][int(rng.randint(2))]
        diag = ["N", "U"][int(rng.randint(2))]
        trans = ["N", "T"][int(rng.randint(2))]
        m0 = gen_vector(tdist, nt * nt, rng).reshape(nt, nt)
        a = np.tril(m0) if uplo == "L" else np.triu(m0)
        idxd = np.arange(nt)
        a[idxd, idxd] = 0.0
        off_max = float(np.max(np.abs(a))) if nt > 1 else 0.0
        if off_max > 0.0:
            s = 2.0 ** -max(0, int(np.ceil(np.log2(off_max * nt * 4))))
            a *= s
        a[idxd, idxd] = (gen_vector("fpuniform_std", nt, rng) + 1.0) * (
            np.where(rng.rand(nt) < 0.5, -1.0, 1.0))
        b = gen_vector(tdist, nt, rng)
        # anchor: the single-chip solve; every mesh must reproduce it
        want = _bits(xb.extrsv(uplo, trans, diag, a, b, impl="xla"))
        for nd in meshes:
            got = _bits(extrsv_sharded(uplo, trans, diag, a, b,
                                       mesh=make_mesh(nd)))
            assert (got == want).all(), (
                f"{label}: mesh {nd} sharded TRSV bits differ")
        return label + f" {uplo}{trans}{diag} n={nt}"

    if routine == "exgemv":
        # uneven dims by default: shard padding must not change a bit
        m = int(rng.randint(1, 97))
        k = int(rng.randint(1, 129))
        alpha = [1.0, -0.5, 3.7][int(rng.randint(3))]
        a = gen_vector(dist, m * k, rng).reshape(m, k)
        xv = gen_vector(dist, k, rng)
        res = []
        for nd in meshes:
            mesh = make_mesh(nd)
            res.append(_bits(exgemv_sharded(a, xv, alpha, mesh=mesh,
                                            shard="rows", impl="xla")))
            res.append(_bits(exgemv_sharded(a, xv, alpha, mesh=mesh,
                                            shard="k", impl="xla")))
            pq = _factor_2d(rng, nd)
            res.append(_bits(exgemv_sharded_2d(
                a, xv, alpha, mesh=make_mesh_2d(pq))))
        for r in res[1:]:
            assert (r == res[0]).all(), (
                f"{label}: rows/k/2-D sharding bits differ")
        # k-permutation: same products, any order
        p = rng.permutation(k)
        got_p = _bits(exgemv_sharded(a[:, p], xv[p], alpha,
                                     mesh=make_mesh(meshes[-1]),
                                     shard="rows", impl="xla"))
        assert (got_p == res[0]).all(), f"{label}: k-permuted differs"
        # beta extension
        beta = [1.0, -2.25][int(rng.randint(2))]
        yv = gen_vector("fpuniform_large", m, rng)
        kw = dict(alpha=alpha, beta=beta, y=yv, impl="xla")
        nd = meshes[-1]
        rb = [_bits(exgemv_sharded(a, xv, mesh=make_mesh(nd),
                                   shard=s, **kw)) for s in ("rows", "k")]
        rb.append(_bits(exgemv_sharded_2d(
            a, xv, alpha, mesh=make_mesh_2d(_factor_2d(rng, nd)),
            beta=beta, y=yv)))
        rb.append(_bits(exgemv_sharded(a, xv, mesh=make_mesh(1),
                                       shard="rows", **kw)))
        for r in rb[1:]:
            assert (r == rb[0]).all(), f"{label}: beta={beta} bits differ"
        # trans="T": the sharded op(A) path must match the explicitly
        # pre-transposed matrix on the same mesh
        shard_t = ["rows", "k"][int(rng.randint(2))]
        xt = gen_vector(dist, m, rng)
        got_t = _bits(exgemv_sharded(a, xt, alpha, mesh=make_mesh(nd),
                                     shard=shard_t, impl="xla", trans="T"))
        want_t = _bits(exgemv_sharded(np.ascontiguousarray(a.T), xt, alpha,
                                      mesh=make_mesh(nd), shard=shard_t,
                                      impl="xla"))
        assert (got_t == want_t).all(), f"{label}: trans=T bits differ"
        return label + f" {m}x{k} alpha={alpha} beta={beta} +T"

    # exgemm -- uneven dims by default (shard padding must not matter)
    m = int(rng.randint(1, 49))
    k = int(rng.randint(1, 65))
    n2 = int(rng.randint(1, 49))
    a = gen_vector(dist, m * k, rng).reshape(m, k)
    b_dist = (dist if rng.rand() < 1 / 3 else
              DISTRIBUTIONS[int(rng.randint(len(DISTRIBUTIONS)))])
    b = gen_vector(b_dist, k * n2, rng).reshape(k, n2)
    res = []
    for nd in meshes:
        res.append(_bits(exgemm_sharded(a, b, mesh=make_mesh(nd),
                                        impl="xla")))
        pq = _factor_2d(rng, nd)
        res.append(_bits(exgemm_sharded_2d(
            a, b, mesh=make_mesh_2d(pq, axes=("rows", "cols")),
            impl="xla")))
        res.append(_bits(exgemm_sharded_k(a, b, mesh=make_mesh(nd))))
    for r in res[1:]:
        assert (r == res[0]).all(), (
            f"{label}: rows/2-D/k sharding bits differ")
    p = rng.permutation(k)
    got_p = _bits(exgemm_sharded(a[:, p], b[p, :],
                                 mesh=make_mesh(meshes[-1]), impl="xla"))
    assert (got_p == res[0]).all(), f"{label}: k-permuted differs"
    # alpha/beta extension (draws appended: recorded replays unchanged)
    alpha = [1.0, -0.5][int(rng.randint(2))]
    beta = [1.0, 3.25][int(rng.randint(2))]
    cm = gen_vector("fpuniform_large", m * n2, rng).reshape(m, n2)
    kw = dict(alpha=alpha, beta=beta, c=cm)
    nd = meshes[-1]
    rb = [_bits(exgemm_sharded(a, b, mesh=make_mesh(nd), impl="xla", **kw)),
          _bits(exgemm_sharded_k(a, b, mesh=make_mesh(nd), **kw)),
          _bits(exgemm_sharded_2d(a, b, impl="xla",
                                  mesh=make_mesh_2d(_factor_2d(rng, nd),
                                                    ("rows", "cols")),
                                  **kw)),
          _bits(exgemm_sharded(a, b, mesh=make_mesh(1), impl="xla", **kw))]
    for r in rb[1:]:
        assert (r == rb[0]).all(), (
            f"{label}: alpha={alpha} beta={beta} bits differ")
    # transa/transb: sharded op() must match the pre-transposed operands
    ta = ["N", "T"][int(rng.randint(2))]
    tb = "T" if ta == "N" else ["N", "T"][int(rng.randint(2))]
    a_t = np.ascontiguousarray(a.T) if ta == "T" else a
    b_t = np.ascontiguousarray(b.T) if tb == "T" else b
    got_t = _bits(exgemm_sharded(a_t, b_t, mesh=make_mesh(nd), impl="xla",
                                 transa=ta, transb=tb))
    assert (got_t == _bits(exgemm_sharded(
        a, b, mesh=make_mesh(nd), impl="xla"))).all(), (
        f"{label}: transa={ta} transb={tb} bits differ")
    return label + f" {m}x{k}x{n2} alpha={alpha} beta={beta} +{ta}{tb}"


def main(args) -> int:
    nd = len(jax.devices())
    print(f"{nd} virtual devices", flush=True)
    failures = 0
    for idx in range(args.start, args.start + args.cases):
        try:
            label = run_case(idx, args.seed, nd)
            print(f"PASS {label}", flush=True)
        except AssertionError as e:
            failures += 1
            print(f"FAIL {e}", flush=True)
    print(f"\n{args.cases} cases, {failures} failures (seed {args.seed}, "
          f"{nd} devices)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(_args))
