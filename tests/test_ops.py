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
