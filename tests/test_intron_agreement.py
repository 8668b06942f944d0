"""Stage 4 (intron-agreement) equality against golden outputs."""

import shutil

import pytest

from pintron_tpu.stages.intron_agreement import run_intron_agreement

CASES = ["test-788", "test-AMBN", "test-CPB2"]


@pytest.mark.parametrize("case", CASES)
def test_intron_agreement_matches_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["genomic.txt", "processed-ests.txt", "out-agree.txt"]:
        shutil.copy(gold / name, work / name)
    run_intron_agreement(str(work))
    for name in ["out-after-intron-agree.txt", "predicted-introns.txt"]:
        assert (work / name).read_bytes() == (gold / name).read_bytes(), \
            f"{case}/{name} differs"


def _mini_locus(tmp_path, shift_second=0):
    """Synthetic two-exon locus with a canonical GT..AG intron at rel
    positions 101..200 (1-based) and two perfectly spliced ESTs; when
    ``shift_second`` is nonzero, the second EST's splice is moved that
    many bases right (its intron is then non-canonical)."""
    import numpy as np
    rng = np.random.default_rng(97)
    gen = list("".join(rng.choice(list("ACGT"), 300)))
    gen[100:102] = "GT"          # rel 101..102
    gen[198:200] = "AG"          # rel 199..200
    # keep the shifted donor non-canonical
    gen[102:104] = "CC"
    gen = "".join(gen)
    work = tmp_path / f"ia{shift_second}"
    work.mkdir()
    (work / "genomic.txt").write_text(
        ">chr5:500000:500299:1\n" + gen + "\n")

    def est_block(eid, cut_gen):
        # est = exon1 (rel 1..cut_gen) + exon2 (rel cut_gen+200-100+1..)
        e1 = gen[:cut_gen]
        e2 = gen[cut_gen + 100:300]
        seq = e1 + e2
        oa = (f">/gb={eid}/gb={eid}.0/clone_end=3'\n"
              f"#polya=0\n#polyad=0\n"
              f"1\t {cut_gen}\t 1\t {cut_gen}\n"
              f"{cut_gen + 1}\t {len(seq)}\t {cut_gen + 101}\t 300\n")
        pe = f">/gb={eid}/gb={eid}.0/clone_end=3'\n{seq}\n"
        return oa, pe

    oa1, pe1 = est_block("E1", 100)
    oa2, pe2 = est_block("E2", 100 + shift_second)
    (work / "out-agree.txt").write_text(oa1 + oa2)
    (work / "processed-ests.txt").write_text(pe1 + pe2)
    return work, gen


def test_canonical_intron_registry_merges_support(tmp_path):
    """Two ESTs sharing one canonical intron must register a single
    genomic intron with support 2, GT..AG pattern and the right
    relative/absolute coordinates (main-intron-agreement.c:170-287
    registry; 804-904 report)."""
    work, gen = _mini_locus(tmp_path)
    run_intron_agreement(str(work))
    rows = [ln.split("\t") for ln in
            (work / "predicted-introns.txt").read_text().splitlines()
            if ln.strip()]
    assert len(rows) == 1
    r = rows[0]
    assert (r[0], r[1]) == ("101", "200")
    assert (r[2], r[3]) == ("500100", "500199")   # abs (start+rel-1-?)
    assert r[5] == "2"
    assert set(r[6].strip(",").split(",")) == {"E1", "E2"}
    assert r[14] == "GTAG"


def test_disagreeing_splice_rewrites_to_canonical(tmp_path):
    """An EST whose splice sits 2 nt right of the canonical site (and
    is non-canonical there) must be pulled onto the canonical intron by
    the agreement waterfall: one registry row, support 2, and E2's
    composition rewritten to E1's boundaries in
    out-after-intron-agree.txt (agree-introns.c:44-310)."""
    work, gen = _mini_locus(tmp_path, shift_second=2)
    run_intron_agreement(str(work))
    rows = [ln.split("\t") for ln in
            (work / "predicted-introns.txt").read_text().splitlines()
            if ln.strip()]
    assert len(rows) == 1, rows
    assert (rows[0][0], rows[0][1]) == ("101", "200")
    assert rows[0][5] == "2"
    after = (work / "out-after-intron-agree.txt").read_text()
    blocks = [b for b in after.split(">") if b.strip()]
    assert len(blocks) == 2
    # both compositions now agree on the canonical boundaries
    # (rows are `es ee gs ge est_seq gen_seq`, io-multifasta.c:187-243)
    for b in blocks:
        coords = [tuple(ln.split()[:4]) for ln in b.splitlines()
                  if ln and ln[0].isdigit()]
        assert [c[2:] for c in coords] == [("1", "100"),
                                           ("201", "300")], coords


def test_two_distinct_introns_stay_separate(tmp_path):
    """ESTs spliced at loci far apart register two independent introns
    (no agreement rewrite across unrelated sites)."""
    import numpy as np
    rng = np.random.default_rng(53)
    gen = list("".join(rng.choice(list("ACGT"), 500)))
    gen[100:102] = "GT"; gen[198:200] = "AG"
    gen[300:302] = "GT"; gen[398:400] = "AG"
    gen = "".join(gen)
    work = tmp_path / "ia2"
    work.mkdir()
    (work / "genomic.txt").write_text(
        ">chr5:500000:500499:1\n" + gen + "\n")
    e1 = gen[:100] + gen[200:500]
    e2 = gen[:300] + gen[400:500]
    (work / "out-agree.txt").write_text(
        ">/gb=E1/gb=E1.0/clone_end=3'\n#polya=0\n#polyad=0\n"
        "1\t 100\t 1\t 100\n"
        f"101\t {len(e1)}\t 201\t 500\n"
        ">/gb=E2/gb=E2.0/clone_end=3'\n#polya=0\n#polyad=0\n"
        "1\t 300\t 1\t 300\n"
        f"301\t {len(e2)}\t 401\t 500\n")
    (work / "processed-ests.txt").write_text(
        f">/gb=E1/gb=E1.0/clone_end=3'\n{e1}\n"
        f">/gb=E2/gb=E2.0/clone_end=3'\n{e2}\n")
    run_intron_agreement(str(work))
    rows = [ln.split("\t") for ln in
            (work / "predicted-introns.txt").read_text().splitlines()
            if ln.strip()]
    assert len(rows) == 2
    assert {(r[0], r[1]) for r in rows} == {("101", "200"),
                                           ("301", "400")}
    assert all(r[5] == "1" for r in rows)
