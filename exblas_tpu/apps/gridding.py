"""Reproducible gridding (Parboil mri-gridding analog).

The reference accumulates each grid point's real/imag contributions through
exsum under a reproducibility flag (reference CPU_kernels.cpp:293-302,
920-929).  Here scattered complex samples are binned to cells and each
cell's contributions are reduced exactly.
"""

from __future__ import annotations

import numpy as np

from ..ops.exsum import exsum


def grid_repro(cells, values, n_cells, impl=None):
    """Exact per-cell accumulation: order-independent by construction."""
    out_re = np.zeros(n_cells)
    out_im = np.zeros(n_cells)
    order = np.argsort(cells, kind="stable")
    sc = cells[order]
    sv = values[order]
    bounds = np.searchsorted(sc, np.arange(n_cells + 1))
    for c in range(n_cells):
        a, b = bounds[c], bounds[c + 1]
        if b > a:
            out_re[c] = exsum(sv[a:b].real.copy(), impl=impl)
            out_im[c] = exsum(sv[a:b].imag.copy(), impl=impl)
    return out_re + 1j * out_im


def grid_control(cells, values, n_cells):
    """Float scatter-add in arrival order (non-reproducible under shuffles)."""
    out = np.zeros(n_cells, dtype=np.complex128)
    for c, v in zip(cells, values):
        out[c] += v
    return out


def gridding_experiment(n_samples: int = 5000, n_cells: int = 16,
                        repeats: int = 5, seed: int = 0,
                        impl: str | None = None) -> dict:
    rng = np.random.RandomState(seed)
    cells = rng.randint(0, n_cells, n_samples)
    mag = np.exp2(rng.randint(-25, 25, n_samples).astype(np.float64))
    values = (rng.uniform(-1, 1, n_samples) * mag
              + 1j * rng.uniform(-1, 1, n_samples) * mag)

    repro, control = set(), set()
    for _ in range(repeats):
        perm = rng.permutation(n_samples)
        repro.add(grid_repro(cells[perm], values[perm], n_cells,
                             impl).tobytes())
        control.add(grid_control(cells[perm], values[perm],
                                 n_cells).tobytes())
    return {"repro_unique": len(repro), "control_unique": len(control)}
