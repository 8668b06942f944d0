#!/usr/bin/env python
"""Benchmark: ESTs aligned/sec on the AMBN locus (pipeline hot path).

Runs the est-fact stage (seeding + MEG + factorization + refinement — the
stage that dominates reference pipeline time) on the test-AMBN regression
workload and reports throughput.

Baseline: the reference C est-fact binary (single core, -O2, this repo's
gengetopt shim build) processes the same workload — 25 ESTs, 8.5 kb locus
— in 0.143 s wall ≈ 175 ESTs/s (measured on the dev machine, see
BASELINE.md).  `vs_baseline` is our ESTs/s divided by that number.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "ESTs/s", "vs_baseline": N}
"""

import json
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import time

# Fallback baseline when the reference cannot be built on this machine:
# reference C est-fact, single core, measured 25/0.143s (round-1 box).
BASELINE_ESTS_PER_S = 175.0

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def measure_reference(workdir_src: str, n_ests: int):
    """Build (cached) and time the reference's single-core est-fact on
    the same workload, so vs_baseline is a same-machine ratio.  Returns
    ESTs/s or None when the reference can't be built here."""
    ref_bin = "/tmp/refsrc/bin/est-fact"
    try:
        if not os.path.exists(ref_bin):
            script = os.path.join(REPO, "tools", "refbuild",
                                  "build_reference.sh")
            if not (os.path.exists(script)
                    and os.path.isdir("/root/reference")):
                return None
            subprocess.run(["sh", script], capture_output=True,
                           timeout=900, check=True)
        work = tempfile.mkdtemp(prefix="pintron-bench-ref-")
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(os.path.join(workdir_src, fn), work)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            subprocess.run([ref_bin], cwd=work, capture_output=True,
                           timeout=600, check=True)
            best = min(best, time.perf_counter() - t0)
        shutil.rmtree(work, ignore_errors=True)
        return n_ests / best
    except Exception:
        return None


def main():
    from pintron_tpu.stages.est_fact import run_est_fact

    golden = os.path.join(REPO, "tests", "golden", "test-AMBN.tar.gz")
    src = tempfile.mkdtemp(prefix="pintron-bench-src-")
    with tarfile.open(golden) as tf:
        tf.extractall(src)

    n_ests = 0
    with open(os.path.join(src, "ests.txt")) as f:
        for line in f:
            if line.startswith(">"):
                n_ests += 1

    # warm-up (native lib build, imports, worker pool)
    work = tempfile.mkdtemp(prefix="pintron-bench-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(src, fn), work)
    run_est_fact(work)

    # Honest headline: fresh-locus work per repetition.  The framework
    # keeps a persistent result memo across runs on the same locus;
    # repeating the identical input would let later reps degenerate to
    # cache hits, which the single-process reference binary cannot do.
    # PINTRON_FRESH_MEMO wipes the memo and rebuilds the index each
    # run, so best-of-N de-noises without changing the work measured.
    reps = 9
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    try:
        run_est_fact(work)  # one fresh-mode warm-up (scratch growth)
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_est_fact(work)
            dt = min(dt, time.perf_counter() - t0)
    finally:
        del os.environ["PINTRON_FRESH_MEMO"]

    # secondary: warm-repeat throughput (persistent memo retained),
    # i.e. re-running the same locus — reported but not the headline
    dt_warm = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_est_fact(work)
        dt_warm = min(dt_warm, time.perf_counter() - t0)

    ests_per_s = n_ests / dt
    ref_rate = measure_reference(src, n_ests)
    baseline = ref_rate if ref_rate else BASELINE_ESTS_PER_S
    out = {
        "metric": "est-fact throughput (AMBN locus, fresh-locus work)",
        "value": round(ests_per_s, 2),
        "unit": "ESTs/s",
        "vs_baseline": round(ests_per_s / baseline, 3),
        "baseline_ests_per_s": round(baseline, 1),
        "baseline_source": "measured" if ref_rate else "stored",
        "warm_repeat_ests_per_s": round(n_ests / dt_warm, 2),
    }
    print(json.dumps(out))

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
