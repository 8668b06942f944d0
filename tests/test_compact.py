"""Stage 5 (compact-compositions) invariant equality against golden outputs.

The reference implementation (dist-scripts/compact-compositions.pl) iterates
Perl hashes whose order is RANDOMIZED per process, so its build-ests.txt is
not unique: re-running the reference with different PERL_HASH_SEED values
produces different (all valid) outputs, differing in external exon boundary
choices.  The deterministic invariants across all members of that
equivalence class — verified empirically against multi-seed reference runs —
are:

  * the 4-line absolute-coordinate header,
  * the number of compositions,
  * the multiset of (intron chain, supporting-EST count) per composition,
  * the genomic-exonforCCDS.txt content (RefSeq exons, input order).

This test checks those invariants against the golden build-ests.txt.  Full
end-to-end validity (feeding our build-ests.txt through downstream stages
yields final JSON/GTF inside the reference's own seed-variant set) was
verified against the reference binaries for all 18 regression cases.
"""

import shutil

import pytest

from pintron_tpu.stages.compact import run_compact_compositions

CASES = ["test-788", "test-AMBN", "test-CPB2", "test_gtf5"]


def parse_build_ests(path):
    lines = path.read_text().splitlines()
    hdr = lines[:4]
    ncomp = int(lines[4])
    nex = int(lines[5])
    exons = [tuple(map(int, l.split(":"))) for l in lines[7:7 + nex]]
    i = 7 + nex
    comps = []
    while i < len(lines) and lines[i] != "#":
        header = lines[i]
        i += 1
        chain = [int(x) for x in lines[i].split(".")]
        i += 1
        i += len(chain)  # skip exon sequences
        ests = int(header.split(".")[1])
        coords = [exons[j] for j in chain]
        if len(coords) > 1:
            ichain = tuple([coords[0][1]]
                           + [c for e in coords[1:-1] for c in e[:2]]
                           + [coords[-1][0]])
        else:
            ichain = (-1, coords[0][0], coords[0][1])
        comps.append((ichain, ests))
    return hdr, ncomp, sorted(comps)


@pytest.mark.parametrize("case", CASES)
def test_compact_invariants_match_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    out = work / "build-ests.txt"
    ccds = work / "genomic-exonforCCDS.txt"
    with open(gold / "out-after-intron-agree.txt") as fin, open(out, "w") as fout:
        run_compact_compositions(fin, fout, str(gold / "genomic.txt"),
                                 str(ccds))
    g_hdr, g_n, g_comps = parse_build_ests(gold / "build-ests.txt")
    m_hdr, m_n, m_comps = parse_build_ests(out)
    assert m_hdr == g_hdr, f"{case}: header differs"
    assert m_n == g_n, f"{case}: composition count differs"
    assert m_comps == g_comps, f"{case}: (intron-chain, EST-count) multiset differs"
    assert ccds.read_bytes() == (gold / "genomic-exonforCCDS.txt").read_bytes()


@pytest.mark.parametrize("case", ["test-788"])
def test_compact_is_deterministic(case, golden, tmp_path):
    gold = golden(case)
    outs = []
    for i in range(2):
        out = tmp_path / f"be{i}.txt"
        with open(gold / "out-after-intron-agree.txt") as fin, \
                open(out, "w") as fout:
            run_compact_compositions(fin, fout, str(gold / "genomic.txt"),
                                     str(tmp_path / f"ccds{i}.txt"))
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
