"""MXU fast path for ExDOT: cross-plane int8 matmuls in a wide-lane layout.

The VPU dot kernel (dot_kernel.py) pays ~210 integer ops per element pair
(two stream decodes + the 106-bit product/deposit machinery), holding ExDOT
near 160 GB/s while the chip streams >600 GB/s.  This path keeps only the
~75-op byte-plane slice on the VPU and moves ALL product arithmetic onto
the MXU:

* both vectors are reshaped to (R8, 8192) -- tile-native for a flat f64
  bit-pair stream (any (n,) -> (R, 128k) reshape is an interpretation, not
  a copy) -- and each grid step loads one (8, 8192) block per stream;
* every element is shifted to a W = 32*nw-bit fixed-point integer relative
  to its vector's GLOBAL anchor and two's-complemented; ``pltpu.bitcast``
  of the XOR-0x80808080'd words IS the excess-128 byte-plane stack
  (row 4r+b = byte b of data row r) -- `_slice_byte_words`, shared with
  gemv_mxu/sum_mxu;
* the byte-plane rows of A, its 0/1 negative-mask rows, and a ones row are
  stacked into U (32*nwa+16, 8192); V likewise for B; ONE int8 MXU matmul
  per block step, ``D += U @ V^T`` (contraction over the 8192-lane axis),
  computes every plane x plane, plane x sign, plane x ones cross sum with
  exact int32 accumulation.  The same-element constraint is enforced by
  construction: element (r, c)'s bytes live in rows 4r+b of BOTH stacks,
  so the epilogue reads only the r-matched entries D[.. 4r+ba, .. 4r+bb]
  (mismatched-r entries are computed and discarded -- MXU cycles are ~6x
  cheaper than the VPU decode here, so the 7/8 output waste is free);
* D spills into an (hi, lo) int32 pair every 8 steps (|D| grows < 2^27
  per step), giving exact int64 totals at any n;
* the epilogue is O((4nwa)*(4nwb)) int64 XLA scalar work: reconstruct the
  excess-128 identity   a*b = (S_a + C_a - 2^Wa n_a)(S_b + C_b - 2^Wb n_b)
  summed over elements, where every cross term is an r-matched slice of D
  (plane-pair sums, plane sums via the ones row, sign-mask cross sums,
  negative counts), yielding ~2(na+nb) static-position int64 terms; the
  bits path rounds them in ONE Pallas launch (round_scaled_terms -- the
  XLA limb-build + canonicalize + round tail was ~150 tiny ops of pure
  launch overhead), while the Superacc path builds ~22 relative limbs
  and shifts them into the absolute DOT_FORMAT accumulator (the
  distributed psum wire format).

Coverage contract: every element of a (resp. b) must have all its bits in
[EA+1-Wa, EA] -- checked PER ELEMENT inside the kernel (`bad` output), so
the dispatcher (ops/exdot.py) uses cheap *sampled* anchors on the hot
path; a miss costs an exact-anchor retry, never correctness.  NaN/Inf
flag; uncovered spreads fall back to the exact VPU kernel.

Reference counterpart: ExDOT's kernels are per-element TwoProductFMA +
FPE + superaccumulator loops (ExDOT.FPE.cl:226-270) -- bandwidth-bound on
GPUs, VPU-decode-bound if transliterated to TPU.  The cross-plane matmul
scheme has no reference analog (same design family as sum_mxu/gemv_mxu).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import LIMB_BITS
from .gemv_mxu import _slice_byte_words

_I = jnp.int32
_I64 = jnp.int64
_Z = _np.int32(0)

WIDE = 8192             # lane width of the (R8, WIDE) layout
# |D entry| grows by <= WIDE * 2^14 = 2^27 per step; spill every 8 steps
# keeps the int32 accumulator under 2^30.
_SPILL_STEPS = 8
# Dlo grows by < 2^16 + 2^16 per spill, Dhi by < 2^15: 2^14 spills are
# safe; at 8 steps * 65536 elements per spill that is n <= 2^33 -- beyond
# any single-chip input (int32 plane products bound n <= 2^31 anyway).
MAX_N_DOT_MXU = 1 << 31


def dot_pad_rows(n: int) -> int:
    """Rows of the padded (R8, WIDE) layout for a flat length-n dot."""
    r = -(-n // WIDE)
    return -(-r // 8) * 8


# ---------------------------------------------------------------------------
# Full-window kernel (round 4)
#
# The pre-round-4 ladder picked a STATIC (nwa, nwb) word-count tier via
# lax.switch around per-tier kernels.  On TPU the (n,) -> (R8, WIDE)
# reshape is a relayout: XLA fuses it into the (arbitrary-layout) Pallas
# operand when the call is unconditional, but a conditional forces
# canonical layouts on the buffers crossing it, MATERIALIZING the
# relayout (~0.77 ms of pure "routing" for the four 67 MB streams at
# n=2^24 while the kernel itself ran 0.52 ms).  In-kernel tier gating
# (pl.when around word slices / matmul sizes, tiers as data) was built
# and measured next: ANY dynamic conditional around the main matmul
# serializes the Mosaic pipeline (~+0.9 ms -- the conditional compute
# cannot overlap the input DMAs).  What survives measurement is the
# simplest design: ONE static kernel that always computes the FULL
# 160-bit window (5 words + negm + ones per side), no conditionals
# anywhere on the hot path.  The uniform cost beats the tiered ladder on
# every benchmark distribution (the tier savings never paid for the
# routing): ~240 GB/s flat vs 137-215 tiered at n=2^24, and
# ill-conditioned data pays exactly what narrow data pays -- the
# reference's own "exact costs the same whatever the data" property
# (ExDOT kernels run one code path for any input, ExDOT.FPE.cl:226-270).
# ---------------------------------------------------------------------------

RU5 = 176                     # stack height: 5 words + negm + ones rows


def _stack_planes(hi, lo, e_blk):
    """(8, WIDE) bit-pair block -> ((RU5, WIDE) int8 value stack, bad).

    Rows [0, 160): byte planes (row 32w + 4r + b = byte b of word w of
    data row r, values byte-128 via the excess-128 XOR + bitcast).
    Rows [160, 168): 0/1 negative masks (row 160 + r).
    Row 168: ones; rows above: zero.
    """
    tc, negm, bad = _slice_byte_words(hi, lo, e_blk, 5, check=True)
    planes = [pltpu.bitcast(t, jnp.int8) for t in tc]
    ones = (jax.lax.broadcasted_iota(_I, (8, WIDE), 0) == _I(0)) \
        .astype(jnp.int8)
    return jnp.concatenate(planes + [negm, ones], axis=0), bad


def _dot_flat_kernel(hi_a_ref, lo_a_ref, hi_b_ref, lo_b_ref, e_ref,
                     dhi_out, dlo_out, flag_out, d_acc):
    """Grid-accumulating kernel: all outputs map to the same blocks every
    step (VMEM-resident for the whole grid, final after the last step)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dhi_out[...] = jnp.zeros_like(dhi_out)
        dlo_out[...] = jnp.zeros_like(dlo_out)
        flag_out[...] = jnp.zeros_like(flag_out)
        d_acc[...] = jnp.zeros_like(d_acc)

    ua, bad_a = _stack_planes(hi_a_ref[...], lo_a_ref[...], e_ref[0:8, :])
    ub, bad_b = _stack_planes(hi_b_ref[...], lo_b_ref[...], e_ref[8:16, :])
    # ONE matmul: every plane/sign/ones cross sum, contraction over the
    # 8192 elements-in-lanes axis, exact int32 accumulation.
    d_acc[...] += jax.lax.dot_general(
        ua, ub, (((1,), (1,)), ((), ())), preferred_element_type=_I)
    flag_out[...] |= jnp.logical_or(bad_a, bad_b).astype(_I)

    spill = jnp.logical_or(
        jnp.bitwise_and(i + 1, _I(_SPILL_STEPS - 1)) == 0, i == n - 1)

    @pl.when(spill)
    def _():
        d = d_acc[...]
        h = d >> _I(16)
        dhi_out[...] += h
        dlo_out[...] += d - (h << _I(16))
        d_acc[...] = jnp.zeros_like(d_acc)


def _run_dot_kernel(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb):
    """Launch the kernel over the (R8, WIDE) layout.

    Returns (d int64 (RU5, RU5), bad bool) where d[i, j] = sum over all
    element slots of U-row-i times V-row-j (see _stack_planes layout).
    """
    r8, w = hi_a2.shape
    assert w == WIDE and r8 % 8 == 0
    # anchor block: rows 0..7 broadcast EA, rows 8..15 EB (Mosaic cannot
    # broadcast a (1, 1) vector in both axes at once; one 512 KB VMEM
    # block loaded once beats a per-element select)
    e2 = jnp.concatenate([
        jnp.broadcast_to(ea.reshape(1, 1), (8, WIDE)).astype(_I),
        jnp.broadcast_to(eb.reshape(1, 1), (8, WIDE)).astype(_I),
    ])

    dhi, dlo, flag = pl.pallas_call(
        _dot_flat_kernel,
        grid=(r8 // 8,),
        in_specs=[
            pl.BlockSpec((8, WIDE), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, WIDE), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, WIDE), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, WIDE), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, WIDE), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RU5, RU5), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RU5, RU5), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, WIDE), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((RU5, RU5), jnp.int32),
            jax.ShapeDtypeStruct((RU5, RU5), jnp.int32),
            jax.ShapeDtypeStruct((8, WIDE), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((RU5, RU5), jnp.int32)],
    )(hi_a2, lo_a2, hi_b2, lo_b2, e2)

    d = dhi.astype(_I64) * _I64(1 << 16) + dlo.astype(_I64)
    return d, jnp.max(flag) > 0


def _dot_epilogue_terms(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb):
    """Kernel + extraction: the dot value as a static-position term
    sum in the full 160-bit-window frame (nwa = nwb = 5 positions).

    Returns (vals int64 (T,), bits_pos tuple, bad, l_rel):
    sum = sum_t vals[t] * 2^(bits_pos[t]) in the relative frame whose bit
    p has exponent p + ea + eb + 2 - 320.

    Epilogue of the excess-128 identity, summed over every slot e
    (zero-padded slots contribute exactly 0 -- their bytes are all -128,
    so S = -C and n = 0 give a = 0):

      sum_e a_e b_e = sum_{pa,pb} 2^(8(pa+pb)) [ Dss + 128 PS_A
                                                 + 128 PS_B + 128^2 N ]
                    - 2^Wb sum_pa 2^(8pa) (Dsn[pa] + 128 NB)
                    - 2^Wa sum_pb 2^(8pb) (Dns[pb] + 128 NA)
                    + 2^(Wa+Wb) Dnn

    with Dss[pa,pb] = sum_e s_pa s_pb, PS_* the plane sums (ones-row
    column of D), Dsn/Dns the sign-mask cross sums, NA/NB the negative
    counts and Dnn = sum_e n_a n_b -- every one an r-matched static slice
    of the kernel's D matrix.  N is the static total slot count.

    Term magnitude bound (round_scaled_terms needs |vals| < 2^52 so its
    16/16/20-bit splits deposit exactly): the binding term is tot[c] =
    sum_{pa+pb=c} m[pa,pb] with m[pa,pb] = sum_e (s_pa+128)(s_pb+128)
    = sum_e b_pa b_pb in [0, n_slots * 255^2]; at most na = 20 pairs per
    anti-diagonal gives |tot| <= 20 * 255^2 * n_slots < n_slots * 2^20.4,
    so n_slots <= 2^31 (asserted below; equals MAX_N_DOT_MXU -- a 16 GB
    input, unreachable single-chip) keeps every term under 2^51.4.  The
    sign/count terms are <= 255 * n_slots, far below.
    """
    assert hi_a2.shape[0] * WIDE <= MAX_N_DOT_MXU, (
        "dot epilogue term bound |vals| < 2^52 requires n_slots <= 2^31")
    d, bad = _run_dot_kernel(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb)
    nwa = nwb = 5
    w_a, w_b = 32 * nwa, 32 * nwb
    na, nb = 4 * nwa, 4 * nwb
    neg_a0, one_a = 32 * nwa, 32 * nwa + 8
    neg_b0, one_b = 32 * nwb, 32 * nwb + 8
    n_slots = hi_a2.shape[0] * WIDE

    # Row i = 32*wa + 4*r + ba unravels as (wa, r, ba); all extractions are
    # static slices + reshapes + an identity-contraction einsum (gather
    # ops on TPU serialize; these stay vectorized).
    # (masked elementwise sums, not einsum: the TPU X64-emulation pass
    # has no int64 dot_general)
    eye8 = jnp.eye(8, dtype=_I64)
    d8 = d[:32 * nwa, :32 * nwb].reshape(nwa, 8, 4, nwb, 8, 4)
    # plane x plane, r-matched: dss[pa, pb] = sum_r d[rowA+4r, rowB+4r]
    dss = (d8 * eye8[None, :, None, None, :, None]).sum((1, 4)) \
        .reshape(na, nb)
    # plane sums via the ones rows (independent of r: plain sums)
    ps_a = d[:32 * nwa, one_b].reshape(nwa, 8, 4).sum(1).reshape(na)
    ps_b = d[one_a, :32 * nwb].reshape(nwb, 8, 4).sum(1).reshape(nb)
    # sign-mask cross sums r-match plane row 4r+b against negm row r
    dsn = (d[:32 * nwa, neg_b0:neg_b0 + 8].reshape(nwa, 8, 4, 8)
           * eye8[None, :, None, :]).sum((1, 3)).reshape(na)
    dns = (d[neg_a0:neg_a0 + 8, :32 * nwb].reshape(8, nwb, 8, 4)
           * eye8[:, None, :, None]).sum((0, 2)).reshape(nb)
    na_tot = d[neg_a0:neg_a0 + 8, one_b].sum()
    nb_tot = d[one_a, neg_b0:neg_b0 + 8].sum()
    dnn = (d[neg_a0:neg_a0 + 8, neg_b0:neg_b0 + 8] * eye8).sum()

    top_bit = w_a + w_b + 54
    l_rel = top_bit // LIMB_BITS + 2

    # per-bit-weight totals of the plane x plane / plane-sum / constant
    # family: tot[c] = sum_{pa+pb=c} M[pa, pb] (anti-diagonal sums)
    m = (dss + _I64(128) * ps_a[:, None] + _I64(128) * ps_b[None, :]
         + _I64(128 * 128 * n_slots))
    tot = sum(jnp.pad(m[pa], (pa, na - 1 - pa)) for pa in range(na))

    vals = jnp.concatenate([
        tot,                                       # at bits 8c
        -(dsn + _I64(128) * nb_tot),               # at bits w_b + 8pa
        -(dns + _I64(128) * na_tot),               # at bits w_a + 8pb
        dnn[None],                                 # at bit w_a + w_b
    ])
    bits_pos = ([8 * c for c in range(na + nb - 1)]
                + [w_b + 8 * p for p in range(na)]
                + [w_a + 8 * p for p in range(nb)]
                + [w_a + w_b])
    return vals, tuple(bits_pos), bad, l_rel


def _dot_rel_limbs(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb):
    """Exact relative limbs of the dot product: rel bit p has exponent
    p + ea + eb + 2 - 320.  Returns (limbs int64 (L,), bad).

    One vectorized limb build: every term's (bit, value) with bit static;
    value split at 32 bits so each chunk shifted by < 20 stays far below
    int64 (per-limb fan-in ~8 chunks of < 2^52 each).  Used by the
    Superacc (absolute wire format) path; the bits path rounds the terms
    directly in one Pallas launch (round_scaled_terms).
    """
    vals, bits_pos, bad, l_rel = _dot_epilogue_terms(
        hi_a2, lo_a2, hi_b2, lo_b2, ea, eb)
    wl = _np.zeros((len(bits_pos), l_rel), _np.int64)
    wh = _np.zeros((len(bits_pos), l_rel), _np.int64)
    for t, bit in enumerate(bits_pos):
        q, rr = divmod(bit, LIMB_BITS)
        wl[t, q] = 1 << rr
        q, rr = divmod(bit + 32, LIMB_BITS)
        wh[t, q] = 1 << rr
    vh = vals >> _I64(32)
    vl = vals & _I64(0xFFFFFFFF)
    limbs = (vl[:, None] * jnp.asarray(wl)
             + vh[:, None] * jnp.asarray(wh)).sum(0)
    return limbs, bad


@jax.jit
def dot_bits_mxu(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb):
    """Correctly rounded exact dot of two (R8, WIDE) bit-pair layouts.

    ea/eb: int32 scalar anchors (upper bounds on the msb exponents of the
    covered elements of a / b).  One static full-window kernel, no
    conditionals: the caller needs NO switch around this call (see the
    design note above _stack_planes).  Returns ``(bits, bad)``: uint64
    result bits and a bool that is True when ANY element was not covered
    by its anchor window (or was NaN/Inf) -- the bits must then be
    discarded.  Exactness: covered elements are exact 160-bit fixed-point
    integers, every cross sum is exact int32/int64, the epilogue terms
    are exact int64 -> one correct rounding in one Pallas launch
    (round_scaled_terms: the XLA limb-build + canonicalize + round tail
    was ~150 tiny ops of pure launch overhead).
    """
    vals, bits_pos, bad, l_rel = _dot_epilogue_terms(
        hi_a2, lo_a2, hi_b2, lo_b2, ea, eb)
    from .round_in_kernel import round_scaled_terms

    e_adj = ea + eb + _I(2) - _I(320)
    hi, lo = round_scaled_terms(vals, bits_pos, e_adj, l_rel)
    bits = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return bits, bad


@jax.jit
def dot_acc_limbs_mxu(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb):
    """Exact dot as ABSOLUTE DOT_FORMAT limbs (the distributed wire
    format): returns (limbs int64 (L_DOT,), bad).

    Every covered product is an integer multiple of 2^-2148 = absolute
    bit 0 (each factor is a multiple of 2^-1074), so the shift is exact
    (see core.rounding.rel_limbs_to_abs_limbs).
    """
    from ...core.rounding import rel_limbs_to_abs_limbs
    from ...core.types import DOT_FORMAT

    rel, bad = _dot_rel_limbs(hi_a2, lo_a2, hi_b2, lo_b2, ea, eb)
    p0 = ea + eb + _I(2) - _I(320) + _I(DOT_FORMAT.offset_bits)
    return rel_limbs_to_abs_limbs(rel, p0, DOT_FORMAT), bad
