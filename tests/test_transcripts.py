"""Stage 6 (maximal-transcripts) byte equality against golden outputs."""

import shutil

import pytest

from pintron_tpu.stages.transcripts import run_maximal_transcripts

CASES = ["test-788", "test-AMBN", "test-CPB2", "test_gtf5"]


@pytest.mark.parametrize("case", CASES)
def test_maximal_transcripts_matches_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["build-ests.txt", "predicted-introns.txt"]:
        shutil.copy(gold / name, work / name)
    run_maximal_transcripts(str(work))
    for p in range(1, 5):
        for pref in ["TRANSCRIPTS1_", "TEMP_COMPOSITION_TRANS1_"]:
            name = f"{pref}{p}.txt"
            assert (work / name).read_bytes() == (gold / name).read_bytes(), \
                f"{case}/{name} differs"
