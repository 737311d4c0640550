"""Reproducible SpMV (Parboil spmv analog).

The reference gathers each row's A_ij * x_j products to doubles and reduces
them with exsum per row (reference src/gpu/examples/spmv (Parboil)/
StrongReproducibility/main.cpp:229-286).  Here rows are padded to a common
nnz and all rows are reduced in one batched exact pass (products are
accumulated exactly, which is stronger than the reference's
promote-then-sum).
"""

from __future__ import annotations

import numpy as np
import jax

from ..core import deposit as dep
from ..core.ieee import split_f64
from ..core.types import DOT_FORMAT, LIMB_BITS
from ..ops.exgemv import round_rows

_I64 = None


def _rows_dot_exact(vals, gathered_x):
    """Per-row exact dot of equal-length (padded) rows -> f64 array."""
    import jax.numpy as jnp

    m, n = vals.shape
    L = DOT_FORMAT.n_limbs
    av = split_f64(vals)
    xv = split_f64(gathered_x)
    t = dep.product_terms(av.hi, av.lo, xv.hi, xv.lo,
                          DOT_FORMAT.offset_bits)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    q, r, s = t["q"], t["r"], t["s"].astype(jnp.int64)
    limbs = jnp.zeros((m * L,), jnp.int64)
    for k, cls in enumerate(t["classes"]):
        pbit = r + 14 * k
        dq = pbit // LIMB_BITS
        rr = pbit - dq * LIMB_BITS
        p0, p1, p2 = dep.split_value30(cls.astype(jnp.uint32), rr)
        for off, piece in enumerate((p0, p1, p2)):
            seg = row_ids * L + q + dq + off
            limbs = limbs + jax.ops.segment_sum(
                piece.astype(jnp.int64).reshape(-1) * s.reshape(-1),
                seg.reshape(-1), num_segments=m * L)
    special = jnp.stack([jnp.sum(t["nan"], axis=1),
                         jnp.sum(t["pinf"], axis=1),
                         jnp.sum(t["ninf"], axis=1)], axis=-1)
    bits = round_rows(limbs.reshape(m, L), special)
    return np.asarray(bits).view(np.float64)


def make_random_csr(m: int, nnz_per_row: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    cols = np.stack([rng.choice(m, nnz_per_row, replace=False)
                     for _ in range(m)])
    vals = rng.uniform(-1, 1, (m, nnz_per_row)) * np.exp2(
        rng.randint(-25, 25, (m, nnz_per_row)))
    return vals, cols


def spmv_repro(vals, cols, x):
    return _rows_dot_exact(vals, x[cols])


def spmv_control(vals, cols, x, rng):
    """Float SpMV with per-row randomized accumulation order."""
    m, nnz = vals.shape
    y = np.zeros(m)
    for i in range(m):
        order = rng.permutation(nnz)
        acc = 0.0
        for j in order:
            acc += vals[i, j] * x[cols[i, j]]
        y[i] = acc
    return y


def spmv_experiment(m: int = 200, nnz: int = 32, repeats: int = 5,
                    seed: int = 0) -> dict:
    vals, cols = make_random_csr(m, nnz, seed)
    rng = np.random.RandomState(seed + 1)
    x = rng.uniform(-1, 1, m) * np.exp2(rng.randint(-25, 25, m))

    repro, control = set(), set()
    for _ in range(repeats):
        perm = rng.permutation(nnz)  # permute the nnz order within rows
        repro.add(spmv_repro(vals[:, perm], cols[:, perm], x).tobytes())
        control.add(spmv_control(vals[:, perm], cols[:, perm], x,
                                 rng).tobytes())
    return {"repro_unique": len(repro), "control_unique": len(control)}
