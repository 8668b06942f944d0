"""Stage 8 (JSON/GTF emission) byte equality against golden outputs."""

import shutil
import subprocess

import pytest

from pintron_tpu.stages.emit import compute_json, json2gtf

CASES = [("test-788", "AAMP"), ("test-AMBN", "AMBN"),
         ("test-CPB2", "AAMP"), ("test_gtf5", "AAMP")]


@pytest.mark.parametrize("case,gene", CASES)
def test_emit_matches_reference(case, gene, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["genomic.txt", "out-after-intron-agree.txt",
                 "VariantGTF.txt", "CCDS_transcripts.txt",
                 "predicted-introns.txt"]:
        shutil.copy(gold / name, work / name)
    compute_json(str(work), str(work / "full.json"))
    json2gtf(str(work / "full.json"),
             str(work / "pintron-all-isoforms.gtf"), gene, True)
    for name in ["full.json", "pintron-all-isoforms.gtf"]:
        assert (work / name).read_bytes() == (gold / name).read_bytes(), \
            f"{case}/{name} differs"
