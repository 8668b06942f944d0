"""Batched alignment DPs as JAX/XLA device ops.

The reference runs its edit-distance style DPs one problem at a time in C
(src/compute-alignments.c:319-453 K-band, :39-207 global alignment).  On
TPU the same recurrences are evaluated as a *batch*: one row-wavefront
`lax.scan` over the DP rows with the whole batch advancing in lockstep on
the VPU lanes.  All shapes are static (padded); per-problem lengths and
band widths are data.

Numerical contract: `banded_edit_distance` reproduces the host/C
`kband_core` exactly for every problem in the batch (int32 DP, same
band-boundary semantics), which the unit tests check against the host
implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# safe sentinel: > any real distance, no overflow.  Plain python int so
# importing this module never creates a device array (which would
# initialize a JAX backend as an import side effect).
BIG = 1 << 20


def pack_ops(ops):
    """Pack traceback op codes (values 0..3) four per byte on device:
    the op stream is the dominant device->host transfer of the
    traceback kernels, and a remote-attached chip is link-bound, so
    the wire carries 2 bits per op.  Width must be a multiple of 4."""
    B, T = ops.shape
    o = ops.astype(jnp.uint8).reshape(B, T // 4, 4)
    return (o[:, :, 0] | (o[:, :, 1] << 2) | (o[:, :, 2] << 4)
            | (o[:, :, 3] << 6))


_UNPACK_LUT = None


def unpack_ops(packed, width: int):
    """Host-side inverse of pack_ops: (B, T/4) uint8 -> (B, width)
    int8 op codes (width <= T)."""
    global _UNPACK_LUT
    if _UNPACK_LUT is None:
        v = np.arange(256, dtype=np.uint8)
        _UNPACK_LUT = np.stack(
            [(v >> (2 * k)) & 3 for k in range(4)], axis=1).astype(np.int8)
    p = np.asarray(packed)
    B = p.shape[0]
    return _UNPACK_LUT[p].reshape(B, -1)[:, :width]


def decode_nw_fused(fused, width: int):
    """Split batch_nw_traceback's fused wire array into (ops, nsteps)
    — ONE host fetch for the whole result."""
    f = np.asarray(fused)
    ops = unpack_ops(f[:, :-2], width)
    nsteps = f[:, -2].astype(np.int32) | (f[:, -1].astype(np.int32) << 8)
    return ops, nsteps


def decode_gap_fused(fused, width: int):
    """Split batch_gap_traceback's fused wire array into
    (sm, ops, nsteps)."""
    f = np.asarray(fused)
    ops = unpack_ops(f[:, :-3], width)
    nsteps = f[:, -3].astype(np.int32) | (f[:, -2].astype(np.int32) << 8)
    sm = f[:, -1].astype(np.int32)
    return sm, ops, nsteps


@functools.partial(jax.jit, static_argnames=("max_rows", "k_max"))
def banded_edit_distance(seq1, len1, seq2, len2, band, *, max_rows: int,
                         k_max: int):
    """Batched banded (K-band) edit distance.

    Args:
      seq1: (B, N_max) int8/int32 codes of the LONGER sequences (padded).
      len1: (B,) int32 actual lengths n.
      seq2: (B, M_max) codes of the shorter sequences; M_max <= max_rows.
      len2: (B,) int32 actual lengths m (m <= n).
      band: (B,) int32 per-problem band half-width k (k <= k_max).
      max_rows: static row count to scan (>= max(len2)).
      k_max: static band half-width bound; band vector width is 2*k_max+1.

    Returns:
      (B,) int32 final band cell values M[m][n] (the banded distance),
      identical to the reference's K-band result for each problem.
    """
    B = seq1.shape[0]
    W = 2 * k_max + 1
    offs = jnp.arange(W, dtype=jnp.int32)  # o = c - r + k_max

    seq1 = seq1.astype(jnp.int32)
    seq2 = seq2.astype(jnp.int32)
    len1 = len1.astype(jnp.int32)
    len2 = len2.astype(jnp.int32)
    band = band.astype(jnp.int32)

    # row 0: M[o] = c for 0 <= c <= k, BIG outside the band
    c0 = offs[None, :] - k_max  # (1, W) -> c at r=0
    in_init = (c0 >= 0) & (c0 <= band[:, None])
    M0 = jnp.where(in_init, c0, BIG).astype(jnp.int32)

    def row_step(M1, r):
        # r: current row (1-based), traced scalar
        c = offs[None, :] + r - k_max                       # (B, W)
        in_band = jnp.abs(c - r) <= band[:, None]
        valid_c = (c >= 1) & (c <= len1[:, None])
        active = in_band & valid_c & (r <= len2[:, None])

        ch1 = jnp.take_along_axis(
            seq1, jnp.clip(c - 1, 0, seq1.shape[1] - 1), axis=1)
        ch2 = jnp.take_along_axis(
            seq2, jnp.broadcast_to(jnp.clip(r - 1, 0, seq2.shape[1] - 1),
                                   (B, 1)), axis=1)
        mism = (ch1 != ch2).astype(jnp.int32)

        diag = M1 + mism
        up = jnp.concatenate([M1[:, 1:], jnp.full((B, 1), BIG)], axis=1) + 1
        cand = jnp.minimum(diag, up)
        # boundary cell c == 0 is forced to r while r <= k
        is_boundary = (c == 0) & (r <= band[:, None])
        cand = jnp.where(is_boundary, r, cand)
        cand = jnp.where(active | is_boundary, cand, BIG)
        # left-chain: M2[o] = min_{j<=o} cand[j] + (o - j)
        shifted = jax.lax.cummin(cand - offs[None, :], axis=1)
        M2 = jnp.minimum(shifted + offs[None, :], BIG)
        # rows past len2 keep the previous band (final answer frozen)
        M2 = jnp.where(r <= len2[:, None], M2, M1)
        return M2, None

    rows = jnp.arange(1, max_rows + 1, dtype=jnp.int32)
    Mf, _ = jax.lax.scan(row_step, M0, rows)
    final_off = jnp.clip(len1 - len2 + k_max, 0, W - 1)
    return jnp.take_along_axis(Mf, final_off[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("max_rows",))
def batch_edit_distance_score(seq1, len1, seq2, len2, *, max_rows: int):
    """Batched full (unbanded) unit-cost edit distance — final score only.

    Row-wavefront over seq2's rows; the in-row (left) dependency is closed
    with a prefix-min (`cummin`), so each row is one vectorized VPU pass.
    Matches the reference edit_distance (src/refine.c:50-83) final cell.
    """
    B, N = seq1.shape
    seq1 = seq1.astype(jnp.int32)
    seq2 = seq2.astype(jnp.int32)
    cols = jnp.arange(N + 1, dtype=jnp.int32)
    M0 = jnp.broadcast_to(cols, (B, N + 1)).astype(jnp.int32)

    def row_step(M1, r):
        ch2 = jnp.take_along_axis(
            seq2, jnp.broadcast_to(jnp.clip(r - 1, 0, seq2.shape[1] - 1),
                                   (B, 1)), axis=1)
        mism = (seq1 != ch2).astype(jnp.int32)
        diag = M1[:, :-1] + mism
        up = M1[:, 1:] + 1
        cand = jnp.minimum(diag, up)
        first = jnp.full((B, 1), r, dtype=jnp.int32)
        cand = jnp.concatenate([first, cand], axis=1)
        row = jax.lax.cummin(cand - cols[None, :], axis=1) + cols[None, :]
        row = jnp.where(r <= len2[:, None], row, M1)
        return row, None

    rows = jnp.arange(1, max_rows + 1, dtype=jnp.int32)
    Mf, _ = jax.lax.scan(row_step, M0, rows)
    return jnp.take_along_axis(Mf, len1[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("max_rows",))
def batch_edit_rowmin(seq1, len1, seq2, len2, *, max_rows: int):
    """Batched full edit distance returning PER-ROW minima and FIRST
    minimal positions — the device side of the refine-borders offload
    (refine.c:105-192: each pass needs min/argmin-first of every DP
    row, the host then selects the cut).

    Args are batch_edit_distance_score's: seq1 (B, N) the TEXT windows
    (columns), seq2 (B, M) the PATTERNS (rows), len1/len2 (B,) int32.
    Returns ONE fused int16 array (B, 2*(max_rows+1)): per-row minima
    over columns 0..len1, then the smallest columns attaining them.
    Rows past len2 are garbage (callers slice 0..len2).  Same int32
    recurrence as the host rows — bit-identical minima/positions.
    Requires the PADDED width N <= 16382 (the argmin encoding needs
    C = p2(N+2) <= 2**15 so CLAMP stays above every genuine row value;
    callers guard before padding)."""
    B, N = seq1.shape
    seq1 = seq1.astype(jnp.int32)
    seq2 = seq2.astype(jnp.int32)
    cols = jnp.arange(N + 1, dtype=jnp.int32)
    M0 = jnp.broadcast_to(cols, (B, N + 1)).astype(jnp.int32)

    C = 1
    while C < N + 2:
        C <<= 1
    CLAMP = (1 << 30) // C - 1

    def rowmin(row):
        # mask columns beyond len1, encode (value, column) so one min
        # gives the earliest minimal column
        masked = jnp.where(cols[None, :] <= len1[:, None], row, BIG)
        enc = jnp.minimum(masked, CLAMP) * C + cols[None, :]
        best = jnp.min(enc, axis=1)
        return best // C, best % C

    v0, p0 = rowmin(M0)

    def row_step(M1, r):
        ch2 = jnp.take_along_axis(
            seq2, jnp.broadcast_to(jnp.clip(r - 1, 0, seq2.shape[1] - 1),
                                   (B, 1)), axis=1)
        mism = (seq1 != ch2).astype(jnp.int32)
        diag = M1[:, :-1] + mism
        up = M1[:, 1:] + 1
        cand = jnp.minimum(diag, up)
        first = jnp.full((B, 1), r, dtype=jnp.int32)
        cand = jnp.concatenate([first, cand], axis=1)
        row = jax.lax.cummin(cand - cols[None, :], axis=1) + cols[None, :]
        v, p = rowmin(row)
        return row, (v, p)

    rows = jnp.arange(1, max_rows + 1, dtype=jnp.int32)
    _, (vs, ps) = jax.lax.scan(row_step, M0, rows)
    vals = jnp.concatenate([v0[None, :], vs], axis=0).T  # (B, R+1)
    pos = jnp.concatenate([p0[None, :], ps], axis=0).T
    # int16 on the wire, vals and pos fused side by side in ONE array:
    # genuine values are < 2**15 under the wrapper's size guard, the
    # tables (not the sequences) are the transfer cost of this op, and
    # each fetched output leaf costs its own round trip when the chip
    # is remote-attached
    return jnp.concatenate(
        [jnp.clip(vals, 0, 32000).astype(jnp.int16),
         pos.astype(jnp.int16)], axis=1)


@functools.partial(jax.jit, static_argnames=("max_n", "max_m"))
def batch_nw_traceback(est, elen, gen, glen, *, max_n: int, max_m: int):
    """Batched Needleman-Wunsch WITH device-side traceback — the
    building block for offloading the endpoint/alignment family
    (reference compute-alignments.c:39-207: unit costs, N-wildcard
    matches, direction preference diag > up > left).

    Args: est (B, max_n) / gen (B, max_m) int8 byte codes (padded),
    elen/glen (B,) int32.  Returns (score, fused):
      * score (B,) int32 — the final alignment cost;
      * fused (B, T/4 + 2) uint8 — the traceback in wire format:
        2-bit-packed op codes (0=diag, 1=up/gap-in-gen,
        2=left/gap-in-est; from the END of the alignment backwards)
        followed by nsteps as two little-endian bytes.  Decode with
        ``decode_nw_fused`` — ONE fused array because every fetched
        output leaf costs its own round trip on a remote-attached chip.
    The host reverses ops[:nsteps], prepends the remaining i/j border
    run, and materializes the two gapped strings — byte-identical to
    the host traceback (same direction tie-breaks, same value
    recurrence: ops/align.py's wavefront with cummin left-relax).
    """
    B = est.shape[0]
    est = est.astype(jnp.int32)
    gen = gen.astype(jnp.int32)
    elen = elen.astype(jnp.int32)
    glen = glen.astype(jnp.int32)
    NCODE = jnp.int32(ord("N"))
    ncode = jnp.int32(ord("n"))
    wild_g = (gen == NCODE) | (gen == ncode)          # (B, M)
    cols = jnp.arange(max_m + 1, dtype=jnp.int32)

    M0 = jnp.broadcast_to(cols, (B, max_m + 1)).astype(jnp.int32)

    def fill_row(M1, i):
        ce = jnp.take_along_axis(
            est, jnp.broadcast_to(jnp.clip(i - 1, 0, est.shape[1] - 1),
                                  (B, 1)), axis=1)                # (B,1)
        wild_e = (ce == NCODE) | (ce == ncode)
        match = (gen == ce) | wild_e | wild_g                     # (B,M)
        diag = M1[:, :-1] + jnp.where(match, 0, 1)
        up = M1[:, 1:] + 1
        cand = jnp.minimum(diag, up)
        first = jnp.full((B, 1), i, dtype=jnp.int32)
        cand_b = jnp.concatenate([first, cand], axis=1)
        vals = jax.lax.cummin(cand_b - cols[None, :], axis=1)             + cols[None, :]
        left = vals[:, :-1] + 1
        dirs = jnp.zeros((B, max_m), dtype=jnp.int8)
        dirs = jnp.where((up < diag) & (left >= up),
                         jnp.int8(1), dirs)
        dirs = jnp.where(left < jnp.minimum(diag, up),
                         jnp.int8(2), dirs)
        vals = jnp.where(i <= elen[:, None], vals, M1)
        return vals, dirs

    # 4 DP rows per scan step: on a remote-attached chip the per-step
    # scan overhead dominates the row work at these widths, so fewer,
    # fatter steps cut the fill wall ~3-4x (identical values — rows
    # past elen freeze)
    R4 = -(-max_n // 4) * 4
    rows4 = jnp.arange(0, R4, 4, dtype=jnp.int32)

    def fill_4rows(carry, r0):
        c0, d0 = fill_row(carry, r0 + 1)
        c1, d1 = fill_row(c0, r0 + 2)
        c2, d2 = fill_row(c1, r0 + 3)
        c3, d3 = fill_row(c2, r0 + 4)
        return c3, jnp.stack([d0, d1, d2, d3], axis=0)

    Mf, dstack = jax.lax.scan(fill_4rows, M0, rows4)  # (R4/4, 4, B, M)
    dirs = jnp.transpose(dstack.reshape(R4 // 4 * 4, B, max_m),
                         (1, 0, 2))                   # (B, R4, M)
    score = jnp.take_along_axis(Mf, glen[:, None], axis=1)[:, 0]

    # device traceback: every problem walks its own path in lockstep;
    # 8 ops per scan step to amortize the per-step overhead
    flat = dirs.reshape(B, R4 * max_m)

    def tb_one(carry):
        i, j, k = carry
        active = (i > 0) & (j > 0)
        fidx = jnp.clip((i - 1) * max_m + (j - 1), 0,
                        R4 * max_m - 1)
        d = jnp.take_along_axis(flat, fidx[:, None],
                                axis=1)[:, 0].astype(jnp.int32)
        d = jnp.where(active, d, 3)
        di = jnp.where((d == 0) | (d == 1), 1, 0)
        dj = jnp.where((d == 0) | (d == 2), 1, 0)
        return (i - di, j - dj, k + active.astype(jnp.int32)), \
            d.astype(jnp.int8)

    def tb_step(carry, _):
        outs = []
        for _u in range(8):
            carry, d = tb_one(carry)
            outs.append(d)
        return carry, jnp.stack(outs, axis=0)

    T8 = -(-(max_n + max_m) // 8)
    (ti, tj, nsteps), opsT = jax.lax.scan(
        tb_step, (elen, glen, jnp.zeros(B, jnp.int32)),
        None, length=T8)
    ops = jnp.transpose(opsT.reshape(T8 * 8, B), (1, 0))
    # one fused uint8 result: [packed ops | nsteps lo | nsteps hi] —
    # every fetched output leaf costs its own round trip over a
    # remote-attached chip, so the traceback ships as a single array
    fused = jnp.concatenate(
        [pack_ops(ops),
         (nsteps & 255).astype(jnp.uint8)[:, None],
         ((nsteps >> 8) & 255).astype(jnp.uint8)[:, None]], axis=1)
    return score, fused


@functools.partial(jax.jit, static_argnames=("max_n", "max_m"))
def batch_gap_traceback(est, elen, gen, glen, *, max_n: int, max_m: int):
    """Batched 3-matrix L/G/R gap alignment WITH device-side traceback —
    the device half of the intron-refinement offload (reference
    compute_gap_alignment, refine-intron.c:560-806: match +1 /
    mismatch -1 with N wildcards, gap -1 in L and R, zero-cost genomic
    gap in G, zero-cost horizontal moves on the LAST row of R).

    Bit-identical to the native ``gap_align_fill_packed`` +
    ``gap_align_run`` traceback (dp.c): same per-row formulation (raw
    diag/up candidates, slope-1 left relaxation via cummax, per-row
    prefix-max G), same direction tie chains (L: diag > up > left;
    G: keep > take-L; R: diag > i_del > grow > up), same start-matrix
    choice (R >= G >= L on ties).

    Args: est (B, max_n) / gen (B, max_m) int8 byte codes (padded),
    elen/glen (B,) int32.  Returns one fused uint8 array
    (B, T/4 + 3): 2-bit-packed traceback op codes (0=diag,
    1=up/gap-in-gen, 2=left/gap-in-est, 3=left with a matrix JUMP
    (R->G or G->L); from the END of the alignment backwards), then
    nsteps as two little-endian bytes, then the start matrix in
    {0,1,2} (L/G/R).  Decode with ``decode_gap_fused``.
    The native decoder (``ri_decode_ops``, consulted through the
    window-keyed lookaside) replays gap_align_run's walk from these ops:
    emits the two gapped strings right-to-left, records
    intron_end/factor_cut at the first jump when starting in R and
    intron_start at the G->L jump, prepends the border runs.
    """
    B = est.shape[0]
    est = est.astype(jnp.int32)
    gen = gen.astype(jnp.int32)
    elen = elen.astype(jnp.int32)
    glen = glen.astype(jnp.int32)
    NCODE = jnp.int32(ord("N"))
    ncode = jnp.int32(ord("n"))
    wild_g = (gen == NCODE) | (gen == ncode)            # (B, M)
    cols = jnp.arange(max_m + 1, dtype=jnp.int32)       # j = 0..M

    Z = jnp.zeros((B, max_m + 1), dtype=jnp.int32)
    L0, R0 = Z, Z

    def fill_row(carry, r):
        Lprev, Rprev = carry
        ce = jnp.take_along_axis(
            est, jnp.broadcast_to(jnp.clip(r - 1, 0, est.shape[1] - 1),
                                  (B, 1)), axis=1)      # (B, 1)
        wild_e = (ce == NCODE) | (ce == ncode)
        match = (gen == ce) | wild_e | wild_g           # (B, M)
        ms = jnp.where(match, 1, -1).astype(jnp.int32)
        cost = jnp.where(r == elen, 0, 1)[:, None]      # (B, 1)

        # L row: raw diag/up, then slope-1 left relaxation including
        # the fixed L[i][0] = 0 (cummax of value+j, minus j)
        diagL = Lprev[:, :-1] + ms
        upL = Lprev[:, 1:] - 1
        Lb = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.maximum(diagL, upL)],
            axis=1)
        Lrel = jax.lax.cummax(Lb + cols[None, :], axis=1) - cols[None, :]

        # G row: prefix max of the relaxed L row, shifted (G[0] = 0;
        # L[0] = 0 so the initial 0 is included by the cummax)
        Gcm = jax.lax.cummax(Lrel, axis=1)
        Grow = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), Gcm[:, :-1]], axis=1)

        # R row: raw diag/up/grow, then slope-`cost` left relaxation
        # (cost = 0 on each problem's LAST genuine row)
        diagR = Rprev[:, :-1] + ms
        upR = Rprev[:, 1:] - 1
        Rb = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.maximum(jnp.maximum(diagR, upR), Grow[:, :-1])],
            axis=1)
        ccols = cost * cols[None, :]
        Rrel = jax.lax.cummax(Rb + ccols, axis=1) - ccols

        # packed direction byte (dp.c gap_align_fill_packed layout):
        # bits 0-1 L dir, bit 2 G keep(1)/take-L(0), bits 3-4 R dir
        # (3 == the jump to G)
        lv = Lrel[:, 1:]
        ld = jnp.where(lv == diagL, 0, jnp.where(lv == upL, 1, 2))
        gd = jnp.where(Grow[:, :-1] < Lrel[:, :-1], 0, 1)
        rv = Rrel[:, 1:]
        rd = jnp.where(
            rv == diagR, 0,
            jnp.where(rv == Rrel[:, :-1] - cost, 2,
                      jnp.where(rv == Grow[:, :-1], 3, 1)))
        comb = (ld | (gd << 2) | (rd << 3)).astype(jnp.int8)

        # freeze rows past each problem's n (garbage dirs unread)
        keep = (r <= elen)[:, None]
        Lf = jnp.where(keep, Lrel, Lprev)
        Rf = jnp.where(keep, Rrel, Rprev)
        return (Lf, Rf), comb

    # 4 DP rows per scan step (see batch_nw_traceback: the per-step
    # scan overhead dominates the row work on a remote-attached chip)
    R4 = -(-max_n // 4) * 4
    rows4 = jnp.arange(1, R4 + 1, 4, dtype=jnp.int32)

    def fill_4rows(carry, r0):
        c0, d0 = fill_row(carry, r0)
        c1, d1 = fill_row(c0, r0 + 1)
        c2, d2 = fill_row(c1, r0 + 2)
        c3, d3 = fill_row(c2, r0 + 3)
        return c3, jnp.stack([d0, d1, d2, d3], axis=0)

    (Lfin, Rfin), cstack = jax.lax.scan(fill_4rows, (L0, R0), rows4)
    dirs = jnp.transpose(cstack.reshape(R4, B, max_m),
                         (1, 0, 2))                     # (B, R4, M)

    # finals at (n, m): G recomputed from the frozen final L row
    Gfin = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jax.lax.cummax(Lfin, axis=1)[:, :-1]], axis=1)
    Lf = jnp.take_along_axis(Lfin, glen[:, None], axis=1)[:, 0]
    Gf = jnp.take_along_axis(Gfin, glen[:, None], axis=1)[:, 0]
    Rf = jnp.take_along_axis(Rfin, glen[:, None], axis=1)[:, 0]
    sm0 = jnp.where(Rf >= Gf,
                    jnp.where(Rf >= Lf, 2, 0),
                    jnp.where(Gf >= Lf, 1, 0)).astype(jnp.int32)

    # device traceback with the matrix-state walk of gap_align_run;
    # 8 ops per scan step to amortize the per-step overhead
    flat = dirs.reshape(B, R4 * max_m)
    JUMP = jnp.int32(5)

    def tb_one(carry):
        i, j, sm, k = carry
        active = (i > 0) & (j > 0)
        fidx = jnp.clip((i - 1) * max_m + (j - 1), 0, R4 * max_m - 1)
        c = jnp.take_along_axis(flat, fidx[:, None],
                                axis=1)[:, 0].astype(jnp.int32)
        rdc = (c >> 3) & 3
        d2 = jnp.where(rdc == 3, JUMP, rdc)
        d1 = jnp.where((c & 4) != 0, 2, JUMP)
        d0 = c & 3
        d = jnp.where(sm == 2, d2, jnp.where(sm == 1, d1, d0))
        d = jnp.where(active, d, 4)
        # emitted codes stay 2-bit packable: jump -> 3, border -> 0
        # (positions past nsteps are never read by the decoder)
        opc = jnp.where(d == JUMP, 3,
                        jnp.where(d == 4, 0, d)).astype(jnp.int8)
        di = jnp.where((d == 0) | (d == 1), 1, 0)
        dj = jnp.where((d == 0) | (d == 2) | (d == JUMP), 1, 0)
        sm2 = sm - (d == JUMP).astype(jnp.int32)
        return (i - di, j - dj, sm2, k + active.astype(jnp.int32)), opc

    def tb_step(carry, _):
        outs = []
        for _u in range(8):
            carry, d = tb_one(carry)
            outs.append(d)
        return carry, jnp.stack(outs, axis=0)

    T8 = -(-(max_n + max_m) // 8)
    (_, _, _, nsteps), opsT = jax.lax.scan(
        tb_step, (elen, glen, sm0, jnp.zeros(B, jnp.int32)),
        None, length=T8)
    ops = jnp.transpose(opsT.reshape(T8 * 8, B), (1, 0))
    # single fused uint8 result (see batch_nw_traceback):
    # [packed ops | nsteps lo | nsteps hi | start matrix]
    fused = jnp.concatenate(
        [pack_ops(ops),
         (nsteps & 255).astype(jnp.uint8)[:, None],
         ((nsteps >> 8) & 255).astype(jnp.uint8)[:, None],
         sm0.astype(jnp.uint8)[:, None]], axis=1)
    return fused


def nw_traceback_decode(est_seq: str, gen_seq: str, ops, nsteps: int):
    """Host decode of one batch_nw_traceback row into the two gapped
    strings (same output as the host _traceback)."""
    i, j = len(est_seq), len(gen_seq)
    est_al = []
    gen_al = []
    for k in range(int(nsteps)):
        d = int(ops[k])
        if d == 0:
            est_al.append(est_seq[i - 1])
            gen_al.append(gen_seq[j - 1])
            i -= 1
            j -= 1
        elif d == 1:
            est_al.append(est_seq[i - 1])
            gen_al.append("-")
            i -= 1
        else:
            est_al.append("-")
            gen_al.append(gen_seq[j - 1])
            j -= 1
    while i > 0:
        est_al.append(est_seq[i - 1])
        gen_al.append("-")
        i -= 1
    while j > 0:
        est_al.append("-")
        gen_al.append(gen_seq[j - 1])
        j -= 1
    return "".join(reversed(est_al)), "".join(reversed(gen_al))


def encode_batch(strings, width: int) -> "tuple[np.ndarray, np.ndarray]":
    """Host helper: pack python strings into a padded int8 code batch."""
    B = len(strings)
    out = np.zeros((B, width), dtype=np.int8)
    lens = np.zeros((B,), dtype=np.int32)
    for i, s in enumerate(strings):
        b = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
        out[i, :len(b)] = b.astype(np.int8)
        lens[i] = len(b)
    return out, lens
