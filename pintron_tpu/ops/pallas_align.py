"""Pallas TPU kernel for the batched banded (K-band) edit distance.

Device counterpart of the reference's hottest inner loop
(compute-alignments.c:319-453) and of the XLA version in
``pintron_tpu.ops.align.banded_edit_distance``: one DP-row wavefront,
the whole batch advancing in lockstep.

Layout is chosen for the VPU and for HBM traffic, not as a translation:

  * batch on LANES (grid over tiles of 128 problems),
  * the band (width W = 2*k_max+1) on SUBLANES,
  * rows as a ``fori_loop`` carrying TWO (W, 128) vectors in VMEM:
    the DP band ``M`` and the *sequence window* ``win`` with
    ``win[o, b] = seq1[b, c-1]`` for ``c = o + r - k_max``.

The window exploits the band's diagonal structure: advancing one row
shifts the window by exactly one sublane and admits ONE new character
per problem, so the per-cell character comparisons are computed
in-kernel from O(B*(N+R)) int32 of streamed data instead of the
(B, rows, W) int32 mismatch tensor the previous version precomputed in
HBM (a 16x traffic cut at the production shape — that tensor made the
kernel memory-bound at ~5% of VPU peak).  The in-row left-chain
``M2[o] = min_{j<=o}(cand[j] + (o-j))`` closes with a log2(W)
prefix scan built from NATIVE sublane rotates (``pltpu.roll``) with
constant iota masks; rows advance eight per ``fori`` iteration off one
vreg-aligned dynamic block read, and the band is padded to whole
8-sublane vregs.

Performance model (measured, round 5): the DP rows are a serial chain
of vector ops, so the sustained rate is bounded by vector ISSUE, not
ALU width — ~150 vreg-ops per 128-problem row step puts the ceiling
near ~26 Gcells/s at the production shape; the kernel runs at ~9-10
(unrolling, rotate lowering, band padding and wider tiles all land
within noise of that, and Mosaic rejects the 16-bit vector min that
would halve the op count on this target — see bench.py's roofline
note).

Numerical contract: bit-identical to the host/C ``kband_core`` per
problem (int32 DP, same band-boundary semantics) — checked by
tests/test_ops.py in interpret mode and by the production offload
equivalence tests on device.

VMEM budget per grid step: two (R, 128) int32 row tables (seq2 chars +
new-window chars), one (W, 128) initial window, three (1, 128) length
rows and the two carried (W, 128) vectors — ~300 KiB at the production
shape (rows 256, W 33), linear in rows (2.1 MiB at rows 2048), far
below the ~16 MiB/core VMEM; batch scales via the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain python int: a module-level jnp scalar would be a captured traced
# constant inside the pallas kernel, which pallas rejects
BIG = 1 << 20
_BIG16 = 1 << 13   # int16-mode sentinel; real values stay far below
_TB = 128  # batch tile: one full lane group per grid step


def _kband_kernel(win0_ref, nc_ref, ch2_ref, len1_ref, len2_ref,
                  band_ref, out_ref, *, max_rows: int, k_max: int,
                  small: bool):
    """``small=True`` runs the DP in int16 (2x VPU lane packing): every
    genuine band value is bounded by max(len1, len2) < _BIG16 under the
    wrapper's size gate, and the sentinel arithmetic peaks at
    _BIG16 + W + 1 << 32767, so the int16 program is exact.

    EIGHT DP rows per fori iteration: the per-iteration fixed costs
    (loop plumbing, the dynamic-sublane row reads) dominated the tiny
    per-row vector work at production widths, so each iteration loads
    an (8, TB) block of row/window chars once (a vreg-aligned dynamic
    slice) and runs eight row updates on static slices of it."""
    W = 2 * k_max + 1
    WP = -(-W // 8) * 8   # band padded to whole 8-sublane vregs: rolls
    #                       on ragged tiles lower to masked shuffles
    dt = jnp.int16 if small else jnp.int32
    big = _BIG16 if small else BIG
    offs = jax.lax.broadcasted_iota(jnp.int32, (WP, _TB), 0)  # o on sublanes
    offs_d = offs.astype(dt)
    len1 = len1_ref[0, :][None, :]
    len2 = len2_ref[0, :][None, :]
    band = band_ref[0, :][None, :]

    # |c - r| = |o - k_max| is row-independent
    in_band = jnp.abs(offs - k_max) <= band

    # row 0: M[o] = c for 0 <= c <= band (c = o - k_max at r = 0)
    c0 = offs - k_max
    M0 = jnp.where((c0 >= 0) & (c0 <= band), c0, big).astype(dt)

    # sublane shifts via the NATIVE rotate: a shift expressed as
    # concatenate(sentinel-rows, slice) lowers to multi-op relayouts on
    # every prefix-scan step, which dominated the row cost; rotate +
    # iota-mask select is two native ops.  Masks are loop constants.
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (WP, _TB), 0)
    up_masks = {}
    sh = 1
    while sh < W:
        up_masks[sh] = sub_iota < sh
        sh *= 2
    last_mask = sub_iota >= (W - 1)

    def shift_down(x, sh, fill):
        """x shifted +sh sublanes (row j <- row j-sh), fill on top."""
        return jnp.where(up_masks[sh], jnp.asarray(fill, dt),
                         pltpu.roll(x, sh, 0))

    def one_row(r, M1, win, ch2):
        c = offs + (r - k_max)
        active = in_band & (c >= 1) & (c <= len1) & (r <= len2)
        mism = (win != ch2).astype(dt)

        diag = M1 + mism
        up = jnp.where(last_mask, jnp.asarray(big, dt),
                       pltpu.roll(M1, WP - 1, 0)) + jnp.asarray(1, dt)
        cand = jnp.minimum(diag, up)
        is_boundary = (c == 0) & (r <= band)
        cand = jnp.where(is_boundary, r.astype(dt), cand)
        cand = jnp.where(active | is_boundary, cand, jnp.asarray(big, dt))

        # left-chain prefix-min over the band (sublanes) by doubling
        x = cand - offs_d
        sh = 1
        while sh < W:
            x = jnp.minimum(x, shift_down(x, sh, big))
            sh *= 2
        M2 = jnp.minimum(x + offs_d, jnp.asarray(big, dt))
        return jnp.where(r <= len2, M2, M1)

    def oct_step(q, carry):
        M1, win = carry
        r0 = 8 * (q - 1) + 1
        ch2q = ch2_ref[pl.ds(r0 - 1, 8), :].astype(dt)   # (8, TB)
        ncq = nc_ref[pl.ds(r0 - 1, 8), :].astype(dt)
        for u in range(8):
            M1 = one_row(r0 + u, M1, win, ch2q[u:u + 1, :])
            # advance the window one sublane; admit seq1[b, r+k_max]
            win = jnp.where(last_mask, ncq[u:u + 1, :],
                            pltpu.roll(win, WP - 1, 0))
        return M1, win

    Mf, _ = jax.lax.fori_loop(1, max_rows // 8 + 1, oct_step,
                              (M0, win0_ref[...].astype(dt)))

    # out[b] = Mf[len1 - len2 + k_max, b]
    final_off = jnp.clip(len1 - len2 + k_max, 0, W - 1)
    picked = jnp.where(offs == final_off, Mf.astype(jnp.int32), BIG)
    out_ref[0, :] = jnp.min(picked, axis=0)


@functools.partial(jax.jit, static_argnames=("max_rows", "k_max",
                                             "interpret"))
def banded_edit_distance_pallas(seq1, len1, seq2, len2, band, *,
                                max_rows: int, k_max: int,
                                interpret: bool = False):
    """Pallas version of ops.align.banded_edit_distance (same contract).

    Args mirror the XLA op: seq1 (B, N) codes of the longer sequences,
    seq2 (B, M) the shorter, len1/len2/band (B,) int32.  Returns (B,)
    int32 final band cell values.
    """
    B = seq1.shape[0]
    W = 2 * k_max + 1
    Bp = ((B + _TB - 1) // _TB) * _TB

    seq1 = seq1.astype(jnp.int32)
    seq2 = seq2.astype(jnp.int32)

    # XLA-side gathers with STATIC index vectors (fused, tiny):
    #   win0[o, b] = seq1[b, o - k_max]        (row-1 window)
    #   nc[i, b]   = seq1[b, i + 1 + k_max]    (char admitted after row i+1)
    #   ch2t[i, b] = seq2[b, i]                (row chars, transposed)
    # out-of-range indices are clipped; those cells are masked in-kernel.
    WP = -(-W // 8) * 8
    offs = jnp.arange(WP, dtype=jnp.int32)
    win0 = seq1[:, jnp.clip(offs - k_max, 0, seq1.shape[1] - 1)].T
    # rows padded to a multiple of 8 (the kernel steps 8 DP rows per
    # iteration; rows past each problem's len2 freeze, so padding rows
    # are inert)
    R4 = -(-max_rows // 8) * 8
    rows = jnp.arange(R4, dtype=jnp.int32)
    nc = seq1[:, jnp.clip(rows + 1 + k_max, 0, seq1.shape[1] - 1)].T
    ch2t = seq2[:, jnp.clip(rows, 0, seq2.shape[1] - 1)].T

    def padb(v, fill=0):
        return jnp.pad(v, ((0, 0), (0, Bp - B)), constant_values=fill)

    win0, nc, ch2t = padb(win0), padb(nc), padb(ch2t)

    def pad1(v):
        return jnp.pad(v.astype(jnp.int32), (0, Bp - B))[None, :]

    # int16 would halve VPU lanes-per-value, but this target's Mosaic
    # rejects int16 vector min/compare ("Target does not support this
    # comparison") — probed 2026-08: add16 OK, min16/ne16 FAIL.  The DP
    # needs min at every step, so the int16 mode stays off until the
    # toolchain supports it.
    small = False

    grid = (Bp // _TB,)
    row_spec = pl.BlockSpec((R4, _TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, _TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kband_kernel, max_rows=R4, k_max=k_max,
                          small=small),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((WP, _TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, one_spec, one_spec, one_spec,
        ],
        out_specs=one_spec,
        interpret=interpret,
    )(win0, nc, ch2t, pad1(len1), pad1(len2), pad1(band))
    return out[0, :B]
