"""Full-pipeline end-to-end equality: genomic.txt + ests.txt -> JSON/GTF
using ONLY pintron_tpu stages (no reference binaries)."""

import shutil

import pytest

from pintron_tpu.pipeline import pintron_pipeline

# byte-identical e2e cases (golden gene labels; the CPB2 golden was
# generated with the default AAMP label)
CASES = [("test-788", "AAMP"), ("test-AMBN", "AMBN"), ("test-CPB2", "AAMP")]


@pytest.mark.parametrize("case,gene", CASES)
def test_pipeline_end_to_end(case, gene, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["genomic.txt", "ests.txt"]:
        shutil.copy(gold / name, work / name)
    pintron_pipeline(workdir=str(work), output_filename="full.json",
                     gtf_filename="pintron-all-isoforms.gtf",
                     gene=gene, organism="human", keep_intermediate=True)
    for name in ["full.json", "pintron-all-isoforms.gtf"]:
        assert (work / name).read_bytes() == (gold / name).read_bytes(), \
            f"{case}/{name} differs"
    # cleanup-mode smoke: intermediates kept because keep_intermediate=True
    assert (work / "predicted-introns.txt").exists()


def test_e2e_gate_rejects_perturbed_outputs(golden, tmp_path):
    """Pin the check_e2e classification gate: a correct run classifies
    as byte-identical, and the SAME run with a deliberately perturbed
    final GTF (one coordinate changed) must classify as diff — the
    stage-5-class branches must not absorb a genuine output change."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from check_e2e import classify_case

    case, gene = "test-788", "AAMP"
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["genomic.txt", "ests.txt"]:
        shutil.copy(gold / name, work / name)
    pintron_pipeline(workdir=str(work), output_filename="full.json",
                     gtf_filename="pintron-all-isoforms.gtf",
                     gene=gene, organism="human", keep_intermediate=True)
    _, bucket = classify_case(str(work), str(gold), gene)
    assert bucket == "byte"

    gtf = work / "pintron-all-isoforms.gtf"
    lines = gtf.read_text().splitlines(keepends=True)
    cols = lines[0].split("\t")
    cols[3] = str(int(cols[3]) + 1)  # shift one exon start
    lines[0] = "\t".join(cols)
    gtf.write_text("".join(lines))
    label, bucket = classify_case(str(work), str(gold), gene)
    assert bucket == "diff", label


def test_cli_flags_observable(golden, tmp_path):
    """The orchestrator-parity flags must be observable in output:
    --extended-gtf writes the unrestricted GTF variant, -l/--logfile
    records per-step begin/ok lines, --general-logfile captures DEBUG+
    dual-sink logging, and --bin-dir warns that it has no effect."""
    import subprocess
    import sys

    case, gene = "test-788", "AAMP"
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["genomic.txt", "ests.txt"]:
        shutil.copy(gold / name, work / name)
    r = subprocess.run(
        [sys.executable, "-m", "pintron_tpu.pipeline",
         "--workdir", str(work), "-o", "full.json",
         "-t", "strict.gtf", "--strict-GTF-compliance",
         "--extended-gtf", "ext.gtf",
         "-l", "plog.txt", "--general-logfile", "glog.txt",
         "-b", "/no/such/bin", f"--gene={gene}", "--organism=human"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]
    # extended GTF = the all-isoforms variant, byte-equal to the golden
    # (unrestricted) GTF even though the main output is CDS-restricted
    assert (work / "ext.gtf").read_bytes() == \
        (gold / "pintron-all-isoforms.gtf").read_bytes()
    assert (work / "strict.gtf").exists()
    plog = (work / "plog.txt").read_text()
    assert "[cmd-2-est-fact] begin" in plog
    assert "[cmd-8-compute-json] ok" in plog
    glog = (work / "glog.txt").read_text()
    assert "STEP" in glog
    assert "--bin-dir=/no/such/bin ignored" in r.stderr
