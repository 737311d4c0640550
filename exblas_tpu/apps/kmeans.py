"""Reproducible k-means (Rodinia kmeans analog).

The reference swaps the per-(cluster, feature) center update for exsum over
the gathered member features (reference kmeans_clustering.cpp:203-223);
membership assignment stays plain floating point (order-insensitive).
"""

from __future__ import annotations

import numpy as np

from ..ops.exsum import exsum


def _assign(points, centers):
    d = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1)


def _update_centers_repro(points, membership, k, impl=None):
    nf = points.shape[1]
    centers = np.zeros((k, nf))
    for c in range(k):
        members = points[membership == c]
        cnt = len(members)
        for f in range(nf):
            s = exsum(members[:, f], impl=impl) if cnt else 0.0
            centers[c, f] = s / cnt if cnt else 0.0
    return centers


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
