"""Reproducible k-means (Rodinia kmeans analog).

The reference swaps the per-(cluster, feature) center update for exsum over
the gathered member features (reference kmeans_clustering.cpp:203-223);
membership assignment stays plain floating point (order-insensitive).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..ops.exsum import exsum_segmented


def _assign(points, centers):
    d = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1)


# ---------------------------------------------------------------------------
# Fully device-resident iteration (assignment on the MXU + exact update)
# ---------------------------------------------------------------------------
#
# The host path above mirrors the reference app structure; this path is the
# TPU throughput story: one jit per iteration, membership assignment as an
# f32 matmul (|x|^2 - 2 x.C^T + |c|^2 rides the MXU), the center update as
# exact segmented limb deposits + correctly-rounded division -- so the
# centers remain BIT-reproducible under any shuffle of the points while the
# whole loop stays on-device (the reference's kmeans assignment is plain
# float too, kmeans_clustering.cpp:180-201).

def _f64_bits_from_int(c):
    """Exact f64 bit pattern of a non-negative int32 (c < 2^31)."""
    import jax
    import jax.numpy as jnp

    c = c.astype(jnp.int32)
    p = jnp.int32(31) - jax.lax.clz(jnp.maximum(c, 1))
    m = c.astype(jnp.uint64) << (jnp.uint64(52) - p.astype(jnp.uint64))
    bits = (((jnp.uint64(1023) + p.astype(jnp.uint64)) << jnp.uint64(52))
            | (m & jnp.uint64((1 << 52) - 1)))
    return jnp.where(c == 0, jnp.uint64(0), bits)


def _f32_from_bits(hi, lo):
    """Truncating f64 -> f32 conversion from raw (hi, lo) bits.

    Only used for the distance/argmin assignment step, which tolerates
    rounding; exponents outside the f32 range clamp to +-inf / 0."""
    import jax.numpy as jnp

    sign = (hi >> jnp.uint32(31)).astype(jnp.uint32)
    expf = ((hi >> jnp.uint32(20)) & jnp.uint32(0x7FF)).astype(jnp.int32)
    e32 = expf - jnp.int32(1023) + jnp.int32(127)
    mant23 = (((hi & jnp.uint32(0xFFFFF)) << jnp.uint32(3))
              | (lo >> jnp.uint32(29)))
    f32 = ((sign << jnp.uint32(31))
           | (jnp.clip(e32, 0, 254).astype(jnp.uint32) << jnp.uint32(23))
           | mant23)
    f32 = jnp.where(e32 >= 255,
                    (sign << jnp.uint32(31)) | jnp.uint32(0x7F800000), f32)
    f32 = jnp.where(jnp.logical_or(e32 <= 0, expf == 0),
                    sign << jnp.uint32(31), f32)
    f32 = jnp.where(expf == 0x7FF,
                    (sign << jnp.uint32(31)) | jnp.uint32(0x7FC00000), f32)
    return f32.view(jnp.float32)


def kmeans_step_device(hi, lo, c_hi, c_lo, k: int):
    """One reproducible k-means iteration on device.

    hi/lo: (n, nf) point bits; c_hi/c_lo: (k, nf) center bits.  Returns
    (new_c_hi, new_c_lo, membership).  Centers are exact segmented sums
    divided by counts with one correctly-rounded f64 division each --
    bit-identical under any permutation of the points.
    """
    import jax
    import jax.numpy as jnp

    from ..core.f64ops import f64_div
    from ..ops.exsum import exsum_segmented_bits

    n, nf = hi.shape
    p32 = _f32_from_bits(hi, lo)
    c32 = _f32_from_bits(c_hi, c_lo)
    d = (jnp.sum(p32 * p32, axis=1, keepdims=True)
         - 2.0 * jnp.dot(p32, c32.T, preferred_element_type=jnp.float32)
         + jnp.sum(c32 * c32, axis=1)[None, :])
    mem = jnp.argmin(d, axis=1).astype(jnp.int32)

    seg = (mem[:, None] * nf
           + jnp.arange(nf, dtype=jnp.int32)[None, :]).reshape(-1)
    sum_bits = exsum_segmented_bits(hi.reshape(-1), lo.reshape(-1),
                                    seg, k * nf).reshape(k, nf)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), mem,
                                 num_segments=k)
    cnt_bits = _f64_bits_from_int(counts)[:, None]
    s_hi = (sum_bits >> jnp.uint64(32)).astype(jnp.uint32)
    s_lo = (sum_bits & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    q = f64_div(s_hi, s_lo,
                jnp.broadcast_to((cnt_bits >> jnp.uint64(32))
                                 .astype(jnp.uint32), sum_bits.shape),
                jnp.broadcast_to((cnt_bits & jnp.uint64(0xFFFFFFFF))
                                 .astype(jnp.uint32), sum_bits.shape))
    q = jnp.where(counts[:, None] > 0, q, jnp.uint64(0))
    return ((q >> jnp.uint64(32)).astype(jnp.uint32),
            (q & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), mem)


def kmeans_device(points, k: int, iters: int = 5, init=None):
    """Device-resident reproducible k-means: returns (centers, membership).

    The per-iteration step is one jitted program (assignment matmul +
    exact segmented update); centers are f64 values reproducible bit-for-bit
    under any point shuffle (pass explicit ``init`` centers so the starting
    point is shuffle-independent too)."""
    import jax
    import jax.numpy as jnp

    from ..core.ieee import split_f64

    step = jax.jit(partial(kmeans_step_device, k=k))
    b = split_f64(np.asarray(points, np.float64))
    hi = jnp.asarray(b.hi)
    lo = jnp.asarray(b.lo)
    init = points[:k] if init is None else init
    cb = split_f64(np.asarray(init, np.float64))
    c_hi, c_lo = jnp.asarray(cb.hi), jnp.asarray(cb.lo)
    mem = None
    for _ in range(iters):
        c_hi, c_lo, mem = step(hi, lo, c_hi, c_lo)
    bits = (np.asarray(c_hi, np.uint64) << np.uint64(32)) | np.asarray(
        c_lo, np.uint64)
    return bits.view(np.float64), np.asarray(mem)


def _update_centers_repro(points, membership, k, impl=None):
    """All k*nf exact center sums in ONE batched segmented pass (the
    reference loops a scalar exsum per (cluster, feature),
    kmeans_clustering.cpp:203-223 -- O(k*nf) kernel launches)."""
    n, nf = points.shape
    seg = (np.repeat(membership, nf) * nf
           + np.tile(np.arange(nf), n)).astype(np.int32)
    sums = exsum_segmented(points.reshape(-1), seg, k * nf).reshape(k, nf)
    counts = np.bincount(membership, minlength=k).astype(np.float64)
    safe = np.maximum(counts, 1.0)
    return np.where(counts[:, None] > 0, sums / safe[:, None], 0.0)


def _update_centers_control(points, membership, k, rng):
    nf = points.shape[1]
    centers = np.zeros((k, nf))
    for c in range(k):
        members = points[membership == c]
        cnt = len(members)
        if cnt:
            # float sum in randomized order: the non-reproducible control
            perm = rng.permutation(cnt)
            acc = np.zeros(nf)
            for i in perm:
                acc += members[i]
            centers[c] = acc / cnt
    return centers


def kmeans(points, k: int, iters: int = 5, reproducible: bool = True,
           rng=None, impl=None):
    rng = rng or np.random.RandomState(0)
    centers = points[:k].copy()
    for _ in range(iters):
        membership = _assign(points, centers)
        if reproducible:
            centers = _update_centers_repro(points, membership, k, impl)
        else:
            centers = _update_centers_control(points, membership, k, rng)
    return centers, membership


def kmeans_experiment(n: int = 2000, nf: int = 4, k: int = 5,
                      repeats: int = 5, seed: int = 0,
                      impl: str | None = None) -> dict:
    """Shuffle-and-rerun: point order is permuted between repeats; the
    reproducible path must give bit-identical centers every time."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n, nf)) * np.exp2(
        rng.randint(-20, 20, (n, nf)))
    # fixed initial centers regardless of shuffling
    init = pts[rng.choice(n, k, replace=False)].copy()

    def run(points, reproducible, rrng):
        centers = init.copy()
        for _ in range(3):
            membership = _assign(points, centers)
            if reproducible:
                centers = _update_centers_repro(points, membership, k, impl)
            else:
                centers = _update_centers_control(points, membership, k, rrng)
        return centers

    repro, control = set(), set()
    for _ in range(repeats):
        perm = rng.permutation(n)
        repro.add(run(pts[perm], True, rng).tobytes())
        control.add(run(pts[perm], False, rng).tobytes())
    return {"repro_unique": len(repro), "control_unique": len(control)}


def main(argv=None):
    """CLI: reproducible k-means on a Rodinia-format points file.

    python -m exblas_tpu.apps.kmeans <points-file> [k] [repeats]
    (e.g. the reference's shipped ``kmeans (Rodinia)/data/100``)
    """
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        print(main.__doc__)
        return 1
    from .io import read_kmeans_points

    pts = read_kmeans_points(argv[0])
    k = int(argv[1]) if len(argv) > 1 else 5
    repeats = int(argv[2]) if len(argv) > 2 else 5
    rng = np.random.RandomState(0)
    n = len(pts)
    init = pts[rng.choice(n, k, replace=False)].copy()

    repro, control = set(), set()
    for _ in range(repeats):
        perm = rng.permutation(n)
        shuffled = pts[perm]
        centers = init.copy()
        for _ in range(3):
            mem = _assign(shuffled, centers)
            centers = _update_centers_repro(shuffled, mem, k)
        repro.add(centers.tobytes())
        centers = init.copy()
        for _ in range(3):
            mem = _assign(shuffled, centers)
            centers = _update_centers_control(shuffled, mem, k, rng)
        control.add(centers.tobytes())
    print(f"{argv[0]}: n={n} features={pts.shape[1]} k={k} "
          f"repeats={repeats}")
    print(f"reproducible path: {len(repro)} distinct result(s)   "
          f"{'OK' if len(repro) == 1 else 'FAILED'}")
    print(f"control path:      {len(control)} distinct result(s) "
          "(non-reproducible by design)")
    return 0 if len(repro) == 1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
