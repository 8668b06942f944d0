#!/usr/bin/env python
"""Scale-stress: synthesize a large locus + EST set, run our est-fact
and (when buildable) the reference's, byte-compare every stage-2
artifact, and report throughput.

Usage: python tools/scale_stress.py [glen] [n_ests] [seed]
  defaults: 100_000 nt, 2000 ESTs, seed 7
"""

import os
import random
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHECK_FILES = ["raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
               "processed-megs.txt", "meg-edges.txt"]


def make_case(tmpdir, glen, n_ests, seed):
    rng = random.Random(seed)
    gen = "".join(rng.choice("ACGT") for _ in range(glen))
    with open(os.path.join(tmpdir, "genomic.txt"), "w") as f:
        f.write(f">chr5:{50_000}:{50_000 + glen - 1}:+1\n{gen}\n")

    def rc(s):
        comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
        return "".join(comp.get(c, c) for c in reversed(s))

    with open(os.path.join(tmpdir, "ests.txt"), "w") as f:
        made = 0
        while made < n_ests:
            n_exons = rng.randrange(1, 7)
            pos = rng.randrange(0, glen - 2000)
            parts = []
            for _ in range(n_exons):
                elen = rng.randrange(40, 400)
                if pos + elen >= glen:
                    break
                parts.append(gen[pos:pos + elen])
                pos += elen + rng.randrange(50, 2000)
                if pos >= glen:
                    break
            if not parts:
                continue
            seq = "".join(parts)
            s = list(seq)
            for _ in range(rng.randrange(0, 6)):
                s[rng.randrange(len(s))] = rng.choice("ACGT")
            seq = "".join(s)
            if rng.random() < 0.3:
                seq = rc(seq)
            if rng.random() < 0.3:
                seq += "A" * rng.randrange(8, 35)
            f.write(f">gi|S{seed}E{made}| /gb=S{seed}E{made}\n{seq}\n")
            made += 1
    return made


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_ests = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    src = tempfile.mkdtemp(prefix="scale-src-")
    make_case(src, glen, n_ests, seed)
    print(f"case: {glen} nt locus, {n_ests} ESTs, seed {seed}")

    # ours
    work = tempfile.mkdtemp(prefix="scale-ours-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(src, fn), work)
    from pintron_tpu.stages.est_fact import run_est_fact
    t0 = time.perf_counter()
    run_est_fact(work)
    ours = time.perf_counter() - t0
    print(f"ours: est-fact {ours:.2f}s ({n_ests / ours:.0f} ESTs/s)")

    # reference
    ref_bin = "/tmp/refsrc/bin/est-fact"
    if not os.path.exists(ref_bin):
        script = os.path.join(REPO, "tools", "refbuild",
                              "build_reference.sh")
        if os.path.exists(script) and os.path.isdir("/root/reference"):
            subprocess.run(["sh", script], capture_output=True,
                           timeout=900)
    if os.path.exists(ref_bin):
        rwork = tempfile.mkdtemp(prefix="scale-ref-")
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(os.path.join(src, fn), rwork)
        t0 = time.perf_counter()
        subprocess.run([ref_bin], cwd=rwork, capture_output=True,
                       timeout=36000, check=True)
        refs = time.perf_counter() - t0
        print(f"reference: est-fact {refs:.2f}s "
              f"({n_ests / refs:.0f} ESTs/s); speedup {refs / ours:.1f}x")
        bad = [fn for fn in CHECK_FILES
               if open(os.path.join(work, fn), "rb").read()
               != open(os.path.join(rwork, fn), "rb").read()]
        print("stage-2 artifacts:",
              "byte-identical" if not bad else f"DIFF {bad}")
        shutil.rmtree(rwork, ignore_errors=True)
    else:
        print("reference: not buildable here, skipped")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
