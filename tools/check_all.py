#!/usr/bin/env python
"""One-shot validation runner: every correctness gate in sequence.

    python tools/check_all.py [--quick]

Runs (in order):
  1. unit + golden test suite           (pytest tests/)
  2. stage-2 byte check, CPU path       (tools/check_stage2.py)
  3. stage-2 byte check, device path    (tools/check_stage2.py --device)
  4. full-pipeline e2e classification   (tools/check_e2e.py)
  5. batch-driver sweep                 (tools/check_batch_sweep.py)
  6. batch-driver sweep, device service (tools/check_batch_sweep.py --device)
  7. seeding-evidence invariant         (tools/seeding_evidence.py)
  8. downstream-stage fuzz vs reference (tools/fuzz_downstream.py)

--quick limits 2/3 to three representative cases, skips 5/6 and
runs 8 with fewer seeds.
Exits nonzero if any gate fails; prints one summary line per gate.
"""

import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
QUICK_CASES = ["test-AMBN", "test-788", "test_gtf6"]


def run(name, cmd, env=None):
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True,
                       text=True)
    dt = time.time() - t0
    ok = r.returncode == 0
    print(f"{'OK ' if ok else 'FAIL'} {name:40s} {dt:7.1f}s")
    if not ok:
        print(r.stdout[-1200:])
        print(r.stderr[-800:])
    return ok


def main():
    quick = "--quick" in sys.argv
    cases = QUICK_CASES if quick else []
    py = sys.executable
    gates = [
        ("pytest tests/", [py, "-m", "pytest", "tests/", "-q"], None),
        ("stage-2 bytes (CPU path)",
         [py, "tools/check_stage2.py", *cases], None),
        ("stage-2 bytes (device path)",
         [py, "tools/check_stage2.py", "--device", *cases], None),
        ("full-pipeline e2e classification",
         [py, "tools/check_e2e.py"], None),
    ]
    if not quick:
        gates.append(("batch-driver sweep",
                      [py, "tools/check_batch_sweep.py"], None))
        gates.append(("batch-driver sweep (device service)",
                      [py, "tools/check_batch_sweep.py", "--device"],
                      None))
    gates.append(("seeding evidence",
                  [py, "tools/seeding_evidence.py"], None))
    gates.append(("downstream fuzz vs reference binaries",
                  [py, "tools/fuzz_downstream.py",
                   "6" if quick else "30"], None))

    bad = 0
    for name, cmd, env in gates:
        bad += not run(name, cmd, env)
    print(f"{len(gates) - bad}/{len(gates)} gates passed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
