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
