#!/usr/bin/env python
"""Batch-driver sweep check: run EVERY golden case through the
multi-locus batch driver (`python -m pintron_tpu.batch`) in ONE sweep,
then byte-compare each job's outputs against an individually-run
pipeline for the same locus.

This is the production many-locus entry point exercised at real scale:
all regression loci in one manifest, two concurrent locus jobs (the
machine's core count), per-locus outputs proven identical to one-at-a-
time runs.  Exits nonzero on any mismatch or failed job.

Usage: python tools/check_batch_sweep.py [case ...]
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tarfile
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"
GENES = {"test-AMBN": "AMBN", "test-TP53": "TP53"}
OUTS = ("pintron-full-output.json", "pintron-all-isoforms.gtf")


def gather_inputs(case: str, dest: pathlib.Path) -> bool:
    tgz = GOLDEN / f"{case}.tar.gz"
    tmp = tempfile.mkdtemp(prefix=f"bs-x-{case}-")
    with tarfile.open(tgz) as tf:
        tf.extractall(tmp)
    ref = pathlib.Path("/root/reference/regressionTest") / case
    for fn in ("genomic.txt", "ests.txt"):
        src = os.path.join(tmp, fn)
        if not os.path.exists(src):
            src = ref / fn
        if not os.path.exists(src):
            shutil.rmtree(tmp, ignore_errors=True)
            return False
        shutil.copy(src, dest / fn)
    shutil.rmtree(tmp, ignore_errors=True)
    return True


def main():
    args = [a for a in sys.argv[1:] if a != "--device"]
    device = "--device" in sys.argv[1:]
    cases = args or sorted(
        p.name[:-7] for p in GOLDEN.glob("test*.tar.gz"))
    root = pathlib.Path(tempfile.mkdtemp(prefix="batch-sweep-"))
    manifest = root / "jobs.tsv"
    usable = []
    with open(manifest, "w") as mf:
        for case in cases:
            cdir = root / "in" / case
            cdir.mkdir(parents=True)
            if not gather_inputs(case, cdir):
                print(f"SKIP {case}: no inputs")
                continue
            gene = GENES.get(case, "AAMP")
            wd = root / "batch" / case
            mf.write(f"{wd}\t{cdir / 'genomic.txt'}\t"
                     f"{cdir / 'ests.txt'}\t{gene}\thuman\n")
            usable.append((case, gene, cdir, wd))

    env = dict(os.environ)
    jobs = "2"
    if device:
        # device mode: PINTRON_DEVICE=1 makes the batch driver spawn
        # the chip-owning service and route every worker's DP batches
        # through it; outputs must stay byte-identical to the CPU path
        env["PINTRON_DEVICE"] = "1"
        jobs = "0"   # let the driver oversubscribe to hide round trips
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pintron_tpu.batch",
         "--manifest", str(manifest), "--jobs", jobs,
         "--summary", str(root / "summary.jsonl")],
        cwd=REPO, capture_output=True, text=True, env=env)
    dt = time.time() - t0
    if r.returncode:
        print(f"BATCH FAILED rc={r.returncode}")
        print(r.stdout[-1500:])
        print(r.stderr[-1500:])
        sys.exit(1)
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    print(f"batch sweep{' (device)' if device else ''}: "
          f"{summary['jobs']} loci in {dt:.1f}s "
          f"({summary['ok']} ok)")

    fails = 0
    for case, gene, cdir, wd in usable:
        solo = root / "solo" / case
        solo.mkdir(parents=True)
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(cdir / fn, solo / fn)
        rr = subprocess.run(
            [sys.executable, "-m", "pintron_tpu.pipeline",
             "--workdir", str(solo), "-g", "genomic.txt", "-s",
             "ests.txt", "-o", "pintron-full-output.json", "-t",
             "pintron-all-isoforms.gtf", f"--gene={gene}",
             "--organism=human"],
            cwd=REPO, capture_output=True, text=True)
        if rr.returncode:
            print(f"FAIL {case}: solo pipeline rc={rr.returncode}")
            fails += 1
            continue
        bad = []
        for fn in OUTS:
            a = (wd / fn)
            b = (solo / fn)
            if not a.exists() or not b.exists() \
                    or a.read_bytes() != b.read_bytes():
                bad.append(fn)
        status = "OK " if not bad else "FAIL"
        print(f"{status} {case:45s}"
              + (f" batch!=solo: {', '.join(bad)}" if bad else ""))
        fails += bool(bad)
    if not fails:
        shutil.rmtree(root, ignore_errors=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
