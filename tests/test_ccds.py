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
