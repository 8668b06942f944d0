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
    Returns (vals, pos), both (B, max_rows+1) int32: row r's minimum
    over columns 0..len1 and the smallest column attaining it.  Rows
    past len2 are garbage (callers slice 0..len2).  Same int32
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
    # int16 on the wire: genuine values are < 2**15 under the wrapper's
    # size guard, and halving the row-table bytes matters when the
    # device is remote-attached (the tables, not the sequences, are the
    # transfer cost of this op)
    return (jnp.clip(vals, 0, 32000).astype(jnp.int16),
            pos.astype(jnp.int16))


@functools.partial(jax.jit, static_argnames=("max_n", "max_m"))
def batch_nw_traceback(est, elen, gen, glen, *, max_n: int, max_m: int):
    """Batched Needleman-Wunsch WITH device-side traceback — the
    building block for offloading the endpoint/alignment family
    (reference compute-alignments.c:39-207: unit costs, N-wildcard
    matches, direction preference diag > up > left).

    Args: est (B, max_n) / gen (B, max_m) int8 byte codes (padded),
    elen/glen (B,) int32.  Returns (score, ops, nsteps):
      * score (B,) int32 — the final alignment cost;
      * ops (B, max_n+max_m) int8 — traceback operations from the END
        of the alignment backwards (0=diag, 1=up/gap-in-gen,
        2=left/gap-in-est, 3=stopped at a matrix border);
      * nsteps (B,) int32 — ops consumed before the border.
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

    rows = jnp.arange(1, max_n + 1, dtype=jnp.int32)
    Mf, dstack = jax.lax.scan(fill_row, M0, rows)   # dstack (N, B, M)
    dirs = jnp.transpose(dstack, (1, 0, 2))          # (B, N, M)
    score = jnp.take_along_axis(Mf, glen[:, None], axis=1)[:, 0]

    # device traceback: every problem walks its own path in lockstep
    flat = dirs.reshape(B, max_n * max_m)

    def tb_step(carry, _):
        i, j, k = carry
        active = (i > 0) & (j > 0)
        fidx = jnp.clip((i - 1) * max_m + (j - 1), 0,
                        max_n * max_m - 1)
        d = jnp.take_along_axis(flat, fidx[:, None],
                                axis=1)[:, 0].astype(jnp.int32)
        d = jnp.where(active, d, 3)
        di = jnp.where((d == 0) | (d == 1), 1, 0)
        dj = jnp.where((d == 0) | (d == 2), 1, 0)
        return (i - di, j - dj, k + active.astype(jnp.int32)),             d.astype(jnp.int8)

    (ti, tj, nsteps), opsT = jax.lax.scan(
        tb_step, (elen, glen, jnp.zeros(B, jnp.int32)),
        None, length=max_n + max_m)
    return score, jnp.transpose(opsT, (1, 0)), nsteps


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
