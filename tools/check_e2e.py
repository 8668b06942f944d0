#!/usr/bin/env python
"""Run the full pipeline end-to-end on every golden case that ships
inputs, and classify the final outputs against golden:
byte-identical / canonical (numbering-invariant) / stage-5 class.

"stage-5 class" is a VERIFIED label, not a catch-all.  Two proofs:

  * (verified)      — golden ships build-ests.txt: membership in the
                      stage-5 equivalence class is tested directly
                      (header, composition count, intron-chain/EST-
                      support multiset, internal-exon multiset, CCDS
                      exon set — pintron_tpu.regression.stage5_class_equal).
  * (replay-proven) — golden ships no intermediates: OUR build-ests.txt
                      is fed through the REFERENCE's own binaries
                      (maximal-transcripts, cds-annotation,
                      compute_json/json2gtf — tools/ref_replay.py) and
                      every downstream artifact must match OURS
                      byte-for-byte, proving the divergence from golden
                      is attributable solely to stage-5 hash-order
                      nondeterminism.  Stage-4 byte-identity (where
                      golden carries it) is still required.

Anything that fails those is reported as DIFF and the script exits
nonzero.  tests/test_pipeline.py pins this gate: a deliberately
perturbed GTF must classify as DIFF.

The gene label passed to cds-annotation must match the one the golden
run used (it is embedded in the GTF); the table below records those.
"""

import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# golden gene labels (most cases were generated with the default AAMP)
GENES = {"test-AMBN": "AMBN", "test-TP53": "TP53"}


def classify_case(work: str, gold: str, gene: str):
    """Classify one case's outputs-vs-golden.  Returns (label, bucket)
    where bucket is one of byte/canonical/stage5-class/diff.

    The stage-5 branches BOTH require the reference-binary replay proof
    (tools/ref_replay.py): even when build-ests.txt membership is
    directly verified, the finals still differ from golden, and only the
    replay proves that divergence is attributable to stage-5 hash order
    rather than a downstream bug.  tests/test_pipeline.py pins this: a
    deliberately perturbed final GTF must come back as diff."""
    from pintron_tpu.regression import compare_outputs, stage5_class_equal
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from ref_replay import replay_stage5_proof

    res = compare_outputs(work, gold)
    if res["json_byte"] and res["gtf_byte"]:
        return "byte-identical", "byte"
    if res["json_canonical"] and res["gtf_canonical"]:
        return "canonical", "canonical"
    s5 = stage5_class_equal(work, gold)
    membership = s5["ok"]
    no_inter = (s5.get("no_golden_intermediates")
                and s5["input_byte"] is not False)
    if not (membership or no_inter):
        bad = [k for k, v in s5.items() if v is False and k != "ok"]
        return f"DIFF (failed: {', '.join(bad) or 'finals'})", "diff"
    try:
        rp = replay_stage5_proof(work, gene)
    except Exception as e:  # noqa: BLE001 - report, not crash
        rp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    if rp["ok"]:
        label = ("stage5-class (verified+replay)" if membership
                 else "stage5-class (replay-proven)")
        return label, "stage5-class"
    bad = [k for k, v in rp.items() if v is False and k != "ok"]
    err = rp.get("error", "")
    return f"DIFF (replay failed: {', '.join(bad) or err})", "diff"


def main():
    golden_dir = os.path.join(REPO, "tests", "golden")
    cases = sorted(fn[:-7] for fn in os.listdir(golden_dir)
                   if fn.endswith(".tar.gz"))
    counts = {"byte": 0, "canonical": 0, "stage5-class": 0, "diff": 0,
              "skipped": 0}
    for case in cases:
        gold = tempfile.mkdtemp(prefix=f"e2e-g-{case}-")
        with tarfile.open(os.path.join(golden_dir, f"{case}.tar.gz")) as tf:
            tf.extractall(gold)
        if not os.path.exists(os.path.join(gold, "genomic.txt")):
            ref = f"/root/reference/regressionTest/{case}"
            if os.path.exists(os.path.join(ref, "genomic.txt")):
                for fn in ("genomic.txt", "ests.txt"):
                    shutil.copy(os.path.join(ref, fn), gold)
            else:
                print(f"SKIP {case}: no inputs")
                counts["skipped"] += 1
                continue
        work = tempfile.mkdtemp(prefix=f"e2e-w-{case}-")
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(os.path.join(gold, fn), work)
        gene = GENES.get(case, "AAMP")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pintron_tpu.pipeline",
             "--workdir", work, "-g", "genomic.txt", "-s", "ests.txt",
             "-o", "full.json", "-t", "pintron-all-isoforms.gtf",
             f"--gene={gene}", "--organism=human", "-k"],
            cwd=REPO, capture_output=True, text=True)
        dt = time.time() - t0
        if r.returncode:
            print(f"FAIL {case}: pipeline rc={r.returncode}")
            print(r.stderr[-800:])
            counts["diff"] += 1
            continue
        cls, bucket = classify_case(work, gold, gene)
        counts[bucket] += 1
        print(f"{case:45s} {cls:40s} {dt:5.1f}s")
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(gold, ignore_errors=True)
    print(counts)
    sys.exit(1 if counts["diff"] else 0)


if __name__ == "__main__":
    main()
