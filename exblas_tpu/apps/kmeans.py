"""Reproducible k-means (Rodinia kmeans analog).

The reference swaps the per-(cluster, feature) center update for exsum over
the gathered member features (reference kmeans_clustering.cpp:203-223);
membership assignment stays plain floating point (order-insensitive).
"""

from __future__ import annotations

import numpy as np

from ..ops.exsum import exsum_segmented


def _assign(points, centers):
    d = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1)


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
