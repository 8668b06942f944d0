#!/usr/bin/env python
"""Data-parallel scaling of the est-fact stage across host workers.

Runs the same workload with 1..N workers and reports throughput and
parallel efficiency (vs the 1-worker rate).  The EST units are
independent (shared read-only index), so this is the host-level
realization of the data-parallel axis that `pintron_tpu.parallel` shards
across devices/hosts.

Usage: python tools/bench_scaling.py [case] [max_workers]
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

RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pintron_tpu.stages.est_fact import run_est_fact
run_est_fact({work!r})          # warm-up (native build, tree, memos)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    run_est_fact({work!r})
    best = min(best, time.perf_counter() - t0)
print(best)
"""


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "test_gtf6"
    max_w = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 1)
    tgz = REPO / "tests" / "golden" / f"{case}.tar.gz"
    src = tempfile.mkdtemp(prefix="scal-src-")
    with tarfile.open(tgz) as tf:
        tf.extractall(src)
    ref = pathlib.Path("/root/reference/regressionTest") / case
    work = tempfile.mkdtemp(prefix="scal-work-")
    for fn in ("genomic.txt", "ests.txt"):
        p = os.path.join(src, fn)
        if not os.path.exists(p):
            p = ref / fn
        shutil.copy(p, work)
    n_ests = sum(1 for line in open(os.path.join(work, "ests.txt"))
                 if line.startswith(">"))

    rates = {}
    for w in range(1, max_w + 1):
        env = dict(os.environ)
        env["PINTRON_EST_WORKERS"] = str(w)
        r = subprocess.run(
            [sys.executable, "-c", RUNNER.format(repo=str(REPO), work=work)],
            env=env, capture_output=True, timeout=1800)
        if r.returncode != 0:
            print(r.stderr.decode()[-1000:], file=sys.stderr)
            sys.exit(1)
        dt = float(r.stdout.strip().splitlines()[-1])
        rates[w] = n_ests / dt

    base = rates[1]
    rows = []
    for w, rate in rates.items():
        eff = rate / (base * w)
        rows.append({"workers": w, "ests_per_s": round(rate, 1),
                     "speedup": round(rate / base, 2),
                     "efficiency": round(eff, 3)})
    print(json.dumps({"case": case, "n_ests": n_ests, "scaling": rows}))
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
