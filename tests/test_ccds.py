"""Stage 7 (cds-annotation) byte equality against golden outputs."""

import shutil

import pytest

from pintron_tpu.stages.ccds import run_cds_annotation

CASES = ["test-788", "test-AMBN", "test-CPB2", "test_gtf5"]


@pytest.mark.parametrize("case", CASES)
def test_cds_annotation_matches_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["isoforms.txt", "predicted-introns.txt",
                 "genomic-exonforCCDS.txt", "genomic.txt"]:
        shutil.copy(gold / name, work / name)
    run_cds_annotation(str(work))
    for name in ["CCDS_transcripts.txt", "VariantGTF.txt"]:
        assert (work / name).read_bytes() == (gold / name).read_bytes(), \
            f"{case}/{name} differs"


import os


def _orf_case(tmp_path, exon_seqs, name="cc"):
    """Drive designed exon sequences through stages 4-6 to a real
    isoforms.txt, then return the workdir for run_cds_annotation.
    Exons are separated by 100 nt canonical GT..AG introns."""
    from pintron_tpu.stages.compact import run_compact_compositions
    from pintron_tpu.stages.intron_agreement import run_intron_agreement
    from pintron_tpu.stages.transcripts import run_maximal_transcripts

    intron = "GT" + "C" * 96 + "AG"
    gen = intron.join(exon_seqs)   # exon1 intron exon2 ...
    work = tmp_path / name
    work.mkdir()
    (work / "genomic.txt").write_text(
        f">chr2:200000:{200000 + len(gen) - 1}:1\n" + gen + "\n")
    rows, pos, gpos = [], 0, 0
    for k, e in enumerate(exon_seqs):
        s = gpos + 1
        rows.append(f"{pos + 1}\t {pos + len(e)}\t {s}\t "
                    f"{s + len(e) - 1}\n")
        pos += len(e)
        gpos += len(e) + (len(intron) if k < len(exon_seqs) - 1 else 0)
    seq = "".join(exon_seqs)
    (work / "out-agree.txt").write_text(
        ">/gb=E1/gb=E1.0/clone_end=3'\n#polya=0\n#polyad=0\n"
        + "".join(rows))
    (work / "processed-ests.txt").write_text(
        f">/gb=E1/gb=E1.0/clone_end=3'\n{seq}\n")
    run_intron_agreement(str(work))
    with open(work / "out-after-intron-agree.txt") as fi, \
            open(work / "build-ests.txt", "w") as fo:
        run_compact_compositions(
            fi, fo, str(work / "genomic.txt"),
            str(work / "genomic-exonforCCDS.txt"))
    run_maximal_transcripts(str(work))
    import shutil as _sh
    _sh.copy(work / "TRANSCRIPTS1_1.txt", work / "isoforms.txt")
    return work


def _parse_ccds(work):
    """Parse CCDS_transcripts.txt into (header_fields, exon_rows)."""
    lines = (work / "CCDS_transcripts.txt").read_text().splitlines()
    trs = []
    cur = None
    for ln in lines:
        if ln.startswith(">"):
            cur = (ln[1:].split(":"), [])
            trs.append(cur)
        elif cur is not None and ":" in ln and ln[0].isdigit():
            cur[1].append(ln.split(":"))
    return lines, trs


def test_orf_and_utrs_across_splice(tmp_path):
    """A designed ORF (ATG at mRNA position 10, stop in exon 2) must
    annotate with the right per-exon 5'/3' UTR lengths (CCDS.c
    GetLongestORF + per-exon UTR bookkeeping)."""
    # mRNA: 9 nt 5'UTR, ATG, 46 GCT codons, TAA at 151..153, C-tail
    mrna = "C" * 9 + "ATG" + "GCT" * 46 + "TAA" + "C" * 47
    assert len(mrna) == 200
    exon1, exon2 = mrna[:100], mrna[100:]
    work = _orf_case(tmp_path, [exon1, exon2])
    from pintron_tpu.stages.ccds import run_cds_annotation
    run_cds_annotation(str(work), gene="T", organism="human")
    _, trs = _parse_ccds(work)
    assert len(trs) == 1
    hdr, exons = trs[0]
    assert len(exons) == 2
    # per-exon rows: abs_s:abs_e:rel_s:rel_e:polya:5utr:3utr
    assert exons[0][5] == "9"         # 5'UTR entirely in exon 1
    assert exons[0][6] == "0"
    assert exons[1][5] == "0"
    assert exons[1][6] == "47"        # 3'UTR tail of exon 2


def test_no_orf_aborts_like_the_reference(tmp_path):
    """With no ATG anywhere, no transcript is electable as reference;
    the reference's SetREFToLongestTranscript exits EXIT_FAILURE on
    exactly this condition (CCDS.c:3186-3189) and the fuzz
    (tools/fuzz_downstream.py) confirms the equivalence against the
    real binary — here we pin our matching abort."""
    import pytest as _pytest
    mrna = "C" * 200
    work = _orf_case(tmp_path, [mrna[:100], mrna[100:]], name="cc2")
    from pintron_tpu.stages.ccds import run_cds_annotation
    with _pytest.raises(RuntimeError, match="no reference transcript"):
        run_cds_annotation(str(work), gene="T", organism="human")


def test_single_exon_orf_no_utr_bleed(tmp_path):
    """An ORF wholly inside exon 1 must leave exon 2 entirely 3'UTR
    and keep exon 1's UTR split exact."""
    exon1 = "C" * 9 + "ATG" + "GCT" * 60 + "TAA" + "C" * 6   # 201 nt
    exon2 = "C" * 80
    work = _orf_case(tmp_path, [exon1, exon2], name="cc3")
    from pintron_tpu.stages.ccds import run_cds_annotation
    run_cds_annotation(str(work), gene="T", organism="human")
    _, trs = _parse_ccds(work)
    assert len(trs) == 1
    _, exons = trs[0]
    assert exons[0][5] == "9"
    assert exons[0][6] == "6"
    assert exons[1][5] == "0"
    assert exons[1][6] == "80"
