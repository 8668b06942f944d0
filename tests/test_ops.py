"""Device-op equivalence: the batched JAX DPs and PWM scoring must match
the host (reference-exact) implementations bit-for-bit."""

import numpy as np
import pytest

from pintron_tpu.factorize.alignments import (compute_edit_distance,
                                              k_band_edit_distance)
from pintron_tpu.factorize.classify import mat_inspector_score
from pintron_tpu.ops.align import (banded_edit_distance,
                                   batch_edit_distance_score, encode_batch)
from pintron_tpu.ops.pwm import encode_windows, pwm_scores, pwm_tables

ALPHA = np.array(list("ACGT"))


def _random_cases(n_cases, seed=1):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n_cases):
        n = int(rng.integers(20, 120))
        k = int(rng.integers(1, 12))
        if 2 * k + 1 >= n:
            k = max(1, (n - 2) // 2)
        m = int(rng.integers(max(1, n - k), n + 1))
        s1 = "".join(rng.choice(ALPHA, n))
        s2l = list(s1[:m])
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, m))
            s2l[p] = str(rng.choice(ALPHA))
        cases.append((s1, "".join(s2l), k))
    return cases


def test_banded_edit_distance_matches_host():
    cases = _random_cases(100)
    N = max(len(c[0]) for c in cases)
    M = max(len(c[1]) for c in cases)
    s1b, l1 = encode_batch([c[0] for c in cases], N)
    s2b, l2 = encode_batch([c[1] for c in cases], M)
    bands = np.array([c[2] for c in cases], dtype=np.int32)
    res = np.asarray(banded_edit_distance(
        s1b, l1, s2b, l2, bands, max_rows=M, k_max=int(bands.max())))
    for i, (s1, s2, k) in enumerate(cases):
        if s1 == s2 or len(s1) - len(s2) > k or 2 * k + 1 >= len(s1):
            continue  # host shortcut paths, not the banded core
        _ok, expect = k_band_edit_distance(s1, s2, k)
        assert res[i] == expect, (i, res[i], expect)


def test_batch_edit_distance_matches_host():
    cases = _random_cases(100, seed=7)
    N = max(len(c[0]) for c in cases)
    M = max(len(c[1]) for c in cases)
    s1b, l1 = encode_batch([c[0] for c in cases], N)
    s2b, l2 = encode_batch([c[1] for c in cases], M)
    res = np.asarray(batch_edit_distance_score(s1b, l1, s2b, l2, max_rows=M))
    for i, (s1, s2, _k) in enumerate(cases):
        assert res[i] == compute_edit_distance(s1, s2)


@pytest.mark.parametrize("name", ["P5_GTAG_U2", "P3_GTAG_U2", "P5_GTAG_U12"])
def test_pwm_scores_match_host(name):
    rng = np.random.default_rng(3)
    wpwm, denom = pwm_tables(name)
    L = wpwm.shape[1]
    windows = ["".join(rng.choice(ALPHA, L)) for _ in range(50)]
    idx = encode_windows(windows, L)
    scores = np.asarray(pwm_scores(idx, wpwm, denominator=denom))
    for i, w in enumerate(windows):
        assert abs(scores[i] - mat_inspector_score(w, name)) < 1e-5


def test_pallas_kband_matches_host_interpret():
    """The Pallas TPU kernel reproduces the host/C K-band values
    bit-for-bit (interpret mode on the CPU mesh)."""
    import numpy as np

    from pintron_tpu.factorize.alignments import k_band_edit_distance
    from pintron_tpu.ops.pallas_align import banded_edit_distance_pallas

    rng = np.random.default_rng(7)
    max_rows, k_max = 48, 6
    B = 13  # intentionally not a multiple of the batch tile
    seq1 = np.zeros((B, max_rows + 16), dtype=np.int32)
    seq2 = np.zeros((B, max_rows), dtype=np.int32)
    len1 = np.zeros(B, dtype=np.int32)
    len2 = np.zeros(B, dtype=np.int32)
    band = np.zeros(B, dtype=np.int32)
    strs = []
    for b in range(B):
        m = int(rng.integers(8, max_rows))
        n = int(rng.integers(m, max_rows + 12))
        k = int(rng.integers(1, k_max + 1))
        # keep the band valid for the host kernel's regime (2k+1 < n)
        if 2 * k + 1 >= n:
            k = max(1, (n - 2) // 2)
        s1 = rng.integers(0, 4, n)
        s2 = s1[:m].copy()
        for _ in range(int(rng.integers(0, 4))):
            s2[rng.integers(0, m)] = rng.integers(0, 4)
        seq1[b, :n] = s1
        seq2[b, :m] = s2
        len1[b], len2[b], band[b] = n, m, k
        strs.append(("".join("ACGT"[c] for c in s1),
                     "".join("ACGT"[c] for c in s2), k))

    got = np.asarray(banded_edit_distance_pallas(
        seq1, len1, seq2, len2, band, max_rows=max_rows, k_max=k_max,
        interpret=True))
    for b, (s1, s2, k) in enumerate(strs):
        n, m = len(s1), len(s2)
        if n - m > k or 2 * k + 1 >= n:
            continue  # host shortcut regimes; kernel value unspecified
        from pintron_tpu.native import get_lib
        lib = get_lib()
        expect = int(lib.kband_core(s1.encode(), n, s2.encode(), m, k))
        assert int(got[b]) == expect, (b, s1, s2, k)


def test_batch_nw_traceback_matches_host():
    """Device NW fill + device-side traceback must reproduce the host
    compute_alignment exactly: same score, same gapped strings (same
    direction tie-breaks), including N-wildcard matching."""
    import numpy as np

    from pintron_tpu.factorize.alignments import _compute_alignment_uncached
    from pintron_tpu.ops.align import (batch_nw_traceback,
                                       decode_nw_fused,
                                       nw_traceback_decode)

    rng = np.random.default_rng(23)
    alpha = np.array(list("ACGT"))
    wildy = np.array(list("ACGTNn"))
    cases = []
    for _ in range(40):
        n = int(rng.integers(1, 90))
        m = int(rng.integers(1, 90))
        src = wildy if rng.integers(0, 3) == 0 else alpha
        e = "".join(rng.choice(src, n))
        if rng.integers(0, 2):
            g = list(e)
            for _ in range(int(rng.integers(0, 8))):
                g[int(rng.integers(0, n))] = str(rng.choice(alpha))
            g = "".join(g)[: max(1, n - int(rng.integers(0, 5)))]
        else:
            g = "".join(rng.choice(src, m))
        cases.append((e, g))
    cases.append(("ACGT", "ACGT"))
    cases.append(("A", "TTTT"))

    N = max(len(e) for e, _ in cases)
    M = max(len(g) for _, g in cases)
    B = len(cases)
    est = np.zeros((B, N), dtype=np.int8)
    gen = np.zeros((B, M), dtype=np.int8)
    elen = np.zeros(B, dtype=np.int32)
    glen = np.zeros(B, dtype=np.int32)
    for i, (e, g) in enumerate(cases):
        est[i, :len(e)] = np.frombuffer(e.encode(), dtype=np.uint8)
        gen[i, :len(g)] = np.frombuffer(g.encode(), dtype=np.uint8)
        elen[i] = len(e)
        glen[i] = len(g)

    score, fused = batch_nw_traceback(est, elen, gen, glen,
                                      max_n=N, max_m=M)
    score = np.asarray(score)
    ops, nsteps = decode_nw_fused(fused, N + M)
    for i, (e, g) in enumerate(cases):
        ref = _compute_alignment_uncached(e, g)
        assert int(score[i]) == ref.score, (i, e, g)
        ea, ga = nw_traceback_decode(e, g, ops[i], nsteps[i])
        assert ea == ref.est and ga == ref.gen, (i, e, g)


def test_batch_gap_traceback_matches_host():
    """Device 3-matrix gap fill + device-side traceback must reproduce
    the host gap_align_run exactly: same gapped strings, same
    factor_cut/intron coordinates and alignment positions (same
    direction tie chains and start-matrix choice)."""
    import numpy as np

    from pintron_tpu.factorize.gap_align import \
        _compute_gap_alignment_uncached
    from pintron_tpu.ops.align import batch_gap_traceback, decode_gap_fused

    rng = np.random.default_rng(31)
    alpha = np.array(list("ACGT"))
    wildy = np.array(list("ACGTNn"))
    cases = []
    for _ in range(60):
        n = int(rng.integers(1, 100))
        src = wildy if rng.integers(0, 4) == 0 else alpha
        e = "".join(rng.choice(src, n))
        if rng.integers(0, 2):
            # realistic: gen = est prefix + intron + est suffix + noise
            cut = int(rng.integers(0, n + 1))
            intr = "".join(rng.choice(alpha, int(rng.integers(0, 140))))
            g = list(e[:cut] + intr + e[cut:])
            for _ in range(int(rng.integers(0, 6))):
                if g:
                    g[int(rng.integers(0, len(g)))] = str(
                        rng.choice(alpha))
            g = "".join(g) or "A"
        else:
            g = "".join(rng.choice(src, int(rng.integers(1, 240))))
        cases.append((e, g))
    cases.append(("A", "A"))
    cases.append(("ACGT", "A"))
    cases.append(("A", "TTTTTTTT"))

    N = max(len(e) for e, _ in cases)
    M = max(len(g) for _, g in cases)
    B = len(cases)
    est = np.zeros((B, N), dtype=np.int8)
    gen = np.zeros((B, M), dtype=np.int8)
    elen = np.zeros(B, dtype=np.int32)
    glen = np.zeros(B, dtype=np.int32)
    for i, (e, g) in enumerate(cases):
        est[i, :len(e)] = np.frombuffer(e.encode(), dtype=np.uint8)
        gen[i, :len(g)] = np.frombuffer(g.encode(), dtype=np.uint8)
        elen[i] = len(e)
        glen[i] = len(g)

    fused = batch_gap_traceback(est, elen, gen, glen,
                                max_n=N, max_m=M)
    sm0, ops, nsteps = decode_gap_fused(fused, N + M)
    for b, (e, g) in enumerate(cases):
        ref = _compute_gap_alignment_uncached(e, g)
        # python replica of ri_decode_ops (the lookaside decoder)
        n, m = len(e), len(g)
        i, j, sm = n, m, int(sm0[b])
        cap = n + m
        w = cap
        ea = [""] * cap
        ga = [""] * cap
        jump_w = []
        fcut = istart = iend = 0
        for k in range(int(nsteps[b])):
            d = int(ops[b][k])
            w -= 1
            if d == 0:
                ea[w] = e[i - 1]; ga[w] = g[j - 1]; i -= 1; j -= 1
            elif d == 1:
                ea[w] = e[i - 1]; ga[w] = "-"; i -= 1
            else:
                if d == 3:
                    if sm == 2:
                        iend = j - 1; fcut = i
                    else:
                        istart = j - 1
                    sm -= 1
                    if len(jump_w) < 2:
                        jump_w.append(w)
                ea[w] = "-"; ga[w] = g[j - 1]; j -= 1
        while i > 0:
            w -= 1; ea[w] = e[i - 1]; ga[w] = "-"; i -= 1
        while j > 0:
            w -= 1; ea[w] = "-"; ga[w] = g[j - 1]; j -= 1
        is_al = ie_al = 0
        if int(sm0[b]) == 2:
            if len(jump_w) >= 1:
                ie_al = jump_w[0] - w
            if len(jump_w) >= 2:
                is_al = jump_w[1] - w
        elif int(sm0[b]) == 1:
            if len(jump_w) >= 1:
                is_al = jump_w[0] - w
        assert "".join(ea[w:]) == ref.est and "".join(ga[w:]) == ref.gen, \
            (b, e, g)
        assert (fcut, istart, iend) == (ref.factor_cut, ref.intron_start,
                                        ref.intron_end), (b, e, g)
        assert (is_al, ie_al) == (ref.intron_start_on_align,
                                  ref.intron_end_on_align), (b, e, g)
