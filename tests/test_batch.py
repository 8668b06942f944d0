"""Multi-locus batch driver: concurrent pipelines, per-job isolation."""

import json
import os
import subprocess
import sys
import pathlib

import pytest

REF = pathlib.Path("/root/reference/regressionTest")


@pytest.mark.skipif(not REF.is_dir(), reason="reference not available")
def test_batch_two_loci(tmp_path):
    manifest = tmp_path / "jobs.tsv"
    rows = []
    for case, gene in (("test-788", "AAMP"), ("test-AMBN", "AMBN")):
        rows.append("\t".join([str(tmp_path / case),
                               str(REF / case / "genomic.txt"),
                               str(REF / case / "ests.txt"), gene,
                               "human"]))
    manifest.write_text("\n".join(rows) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "pintron_tpu.batch", "--manifest",
         str(manifest), "--jobs", "2", "--summary",
         str(tmp_path / "sum.jsonl")],
        capture_output=True, timeout=600,
        cwd=str(pathlib.Path(__file__).resolve().parent.parent))
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    lines = [json.loads(l) for l in
             (tmp_path / "sum.jsonl").read_text().splitlines()]
    summary = lines[-1]
    assert summary["ok"] == 2 and summary["failed"] == 0
    for case in ("test-788", "test-AMBN"):
        assert (tmp_path / case / "pintron-full-output.json").exists()
        assert (tmp_path / case / "pintron-all-isoforms.gtf").exists()
