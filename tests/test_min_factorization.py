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


def _block(est_id, facts, polya=0, polyad=0):
    """Hand-built raw-multifasta-out.txt block (io-multifasta.c:187-243
    shape: header, polyA flags, `es ee gs ge est_seq gen_seq` rows)."""
    lines = [f">/gb={est_id}/gb={est_id}.0/clone_end=3'",
             f"#polya={polya}", f"#polyad={polyad}"]
    for es, ee, gs, ge in facts:
        lines.append(f"{es} {ee} {gs} {ge} "
                     f"{'A' * (ee - es + 1)} {'A' * (ge - gs + 1)}")
    return "\n".join(lines) + "\n"


def _run(text):
    out = io.StringIO()
    run_min_factorization(io.StringIO(text), out)
    return out.getvalue()


def test_min_cover_prefers_shared_factors():
    """Hand-built set-cover instance: EST1 offers {A,B} or {D}; EST2
    needs A, EST3 needs B.  The minimum factor cover is {A, B} (k=2 —
    covering EST1 through its first alternative), so EST1 must print
    the A+B factorization, never the D singleton (min_factorization.c:
    102-130 combination search + 326-384 best-per-EST selection)."""
    A = (1, 100, 101, 200)
    B = (101, 200, 301, 400)
    D = (1, 200, 601, 800)
    text = (_block("E1", [A, B]) + _block("E1", [D])
            + _block("E2", [A]) + _block("E3", [B]))
    got = _run(text)
    blocks = [b for b in got.split(">") if b.strip()]
    assert len(blocks) == 3
    e1 = blocks[0]
    assert "1\t 100\t 101\t 200" in e1 and "101\t 200\t 301\t 400" in e1
    assert "601" not in e1
    assert "1\t 100\t 101\t 200" in blocks[1]
    assert "101\t 200\t 301\t 400" in blocks[2]


def test_min_cover_single_shared_factor_beats_pairs():
    """EST1 offers {A,B} or {C}; EST2 needs C: the singleton cover {C}
    (k=1) wins, so EST1 must print its C alternative."""
    A = (1, 100, 101, 200)
    B = (101, 200, 301, 400)
    C = (1, 200, 501, 700)
    text = (_block("E1", [A, B]) + _block("E1", [C])
            + _block("E2", [C]))
    got = _run(text)
    blocks = [b for b in got.split(">") if b.strip()]
    assert len(blocks) == 2
    assert "1\t 200\t 501\t 700" in blocks[0]
    assert "101\t 200\t 301\t 400" not in blocks[0]
    assert "1\t 200\t 501\t 700" in blocks[1]


def test_polya_flags_follow_selected_factorization():
    """The polyA flags printed per EST belong to the SELECTED
    factorization (main-min-factorization.c:308-384 prints the chosen
    alternative's flags)."""
    A = (1, 100, 101, 200)
    C = (1, 100, 501, 600)
    text = (_block("E1", [A], polya=0) + _block("E1", [C], polya=1)
            + _block("E2", [C], polya=1))
    got = _run(text)
    blocks = [b for b in got.split(">") if b.strip()]
    # cover {C} (k=1): E1 prints the C alternative with ITS flags
    assert "#polya=1" in blocks[0]
    assert "501\t 600" in blocks[0].replace("1\t 100\t ", "")
