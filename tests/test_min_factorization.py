"""Stage 3 (min-factorization) equality against golden outputs."""

import io

import pytest

from pintron_tpu.stages.min_factorization import run_min_factorization

CASES = ["test-788", "test-AMBN", "test-CPB2", "test-issue-13", "test_gtf5"]


@pytest.mark.parametrize("case", CASES)
def test_min_factorization_matches_reference(case, golden):
    gold = golden(case)
    raw = gold / "raw-multifasta-out.txt"
    expected = gold / "out-agree.txt"
    if not raw.exists() or not expected.exists():
        pytest.skip("missing golden stage files")
    out = io.StringIO()
    with open(raw) as fh:
        run_min_factorization(fh, out)
    assert out.getvalue() == expected.read_text()
