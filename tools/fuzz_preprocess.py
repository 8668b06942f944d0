#!/usr/bin/env python
"""Fuzz the native worker path (C-side FASTA parse + gb/strand/RC/polyA
preprocessing + per-unit processing) against the pure-host path on
attribute-rich random inputs: RefSeq NM_/NR_ ids, /clone_end and
/fixed_strand attributes, polyA/polyT tails, lowercase bases, CRLF and
lone-CR line endings, '#\\#' record separators, N runs, multi-line
sequences.  Stage-2 outputs must be byte-identical.

Usage: python tools/fuzz_preprocess.py [n_seeds] [start_seed]
"""

import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNNER = r"""
import os, sys
sys.path.insert(0, {repo!r})
from pintron_tpu.stages.est_fact import run_est_fact
run_est_fact({work!r})
"""

CHECK_FILES = ["raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
               "processed-megs.txt", "meg-edges.txt"]


def make_case(tmpdir, seed):
    rng = random.Random(seed)
    glen = rng.randrange(2500, 8000)
    gen = "".join(rng.choice("ACGT") for _ in range(glen))
    if rng.random() < 0.3:
        gen = "N" * rng.randrange(1, 30) + gen
    if rng.random() < 0.3:
        gen = gen + "N" * rng.randrange(1, 30)
    strand = rng.choice(["+1", "-1", "1"])
    newline = rng.choice(["\n", "\r\n", "\r"])

    def rc(s):
        comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
        return "".join(comp.get(c, c) for c in reversed(s))

    ests = []
    for e in range(rng.randrange(4, 12)):
        n_exons = rng.randrange(1, 5)
        pos = rng.randrange(0, max(1, glen // 3))
        parts = []
        for _ in range(n_exons):
            elen = rng.randrange(25, 300)
            if pos + elen >= glen:
                break
            parts.append(gen[pos:pos + elen])
            pos += elen + rng.randrange(45, 500)
            if pos >= glen:
                break
        if not parts:
            continue
        seq = "".join(parts)
        # sequencing noise
        s = list(seq)
        for _ in range(rng.randrange(0, 4)):
            if s:
                s[rng.randrange(len(s))] = rng.choice("ACGT")
        seq = "".join(s)
        if rng.random() < 0.3:
            seq = rc(seq)  # opposite-orientation read
        if rng.random() < 0.35:
            seq = seq + "A" * rng.randrange(8, 40)
        if rng.random() < 0.2:
            seq = "T" * rng.randrange(8, 30) + seq
        if rng.random() < 0.15:
            seq = seq.lower() if rng.random() < 0.5 else (
                seq[:len(seq) // 2].lower() + seq[len(seq) // 2:])
        if rng.random() < 0.15:
            seq = "N" * rng.randrange(1, 5) + seq
        kind = rng.random()
        if kind < 0.2:
            gb = rng.choice(["NM_", "NR_"]) + str(rng.randrange(10**5))
            hdr = f"gi|{seed}{e}|ref|{gb}| /gb={gb}"
        else:
            gb = f"XX{seed}{e}"
            hdr = f"gi|{seed}{e}|gb|{gb}| /gb={gb}"
            if rng.random() < 0.6:
                hdr += f" /clone_end={rng.choice(['3', '5', '7', 'x'])}"
                if rng.random() < 0.7:
                    hdr += f" /fixed_strand={rng.choice(['0', '1'])}"
        ests.append((hdr, seq))
    if not ests:
        return 0
    with open(os.path.join(tmpdir, "genomic.txt"), "w", newline="") as f:
        f.write(f">chr9:{10_000}:{10_000 + glen - 1}:{strand}{newline}")
        # multi-line sequence
        k = rng.choice([60, 70, 10**9])
        for i in range(0, len(gen), k):
            f.write(gen[i:i + k] + newline)
    with open(os.path.join(tmpdir, "ests.txt"), "w", newline="") as f:
        for j, (hdr, seq) in enumerate(ests):
            f.write(f">{hdr}{newline}")
            k = rng.choice([50, 80, 10**9])
            for i in range(0, len(seq), k):
                f.write(seq[i:i + k] + newline)
            if rng.random() < 0.15:
                f.write("#\\#" + newline)
    return len(ests)


def run_one(seed, workers="1"):
    import tempfile
    td = tempfile.mkdtemp(prefix=f"ppfz{seed}-")
    if make_case(td, seed) == 0:
        return True
    outs = {}
    for mode, extra in (("native", {}),
                        ("host", {"PINTRON_NO_NATIVE_EST_PROCESS": "1"})):
        work = os.path.join(td, mode)
        os.makedirs(work)
        for fn in ("genomic.txt", "ests.txt"):
            with open(os.path.join(td, fn), "rb") as s, \
                    open(os.path.join(work, fn), "wb") as d:
                d.write(s.read())
        env = dict(os.environ)
        env.pop("PINTRON_NO_NATIVE_EST_PROCESS", None)
        env.update(extra)
        env["PINTRON_EST_WORKERS"] = workers
        r = subprocess.run(
            [sys.executable, "-c",
             RUNNER.format(repo=REPO, work=work)],
            env=env, capture_output=True, timeout=600)
        if r.returncode != 0:
            print(f"seed {seed} {mode} CRASH:\n{r.stderr.decode()[-2000:]}")
            return False
        outs[mode] = {}
        for fn in CHECK_FILES:
            with open(os.path.join(work, fn), "rb") as f:
                outs[mode][fn] = f.read()
    ok = True
    for fn in CHECK_FILES:
        if outs["native"][fn] != outs["host"][fn]:
            print(f"seed {seed}: {fn} DIFFERS")
            ok = False
    import shutil
    if ok:
        shutil.rmtree(td, ignore_errors=True)
    else:
        print(f"  kept inputs at {td}")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    bad = 0
    for seed in range(start, start + n):
        workers = "2" if seed % 3 == 0 else "1"
        if not run_one(seed, workers):
            bad += 1
        else:
            print(f"seed {seed} ok (workers={workers})", flush=True)
    print(f"DONE bad={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
