#!/usr/bin/env python
"""Randomized downstream-stage fuzz vs the reference binaries.

Stage 2 has a dedicated fuzz ladder against the reference's est-fact
binary (VALIDATION.md); this tool extends the randomized comparison to
every later stage on synthetic spliced loci (tools/scale_stress.py's
generator, the same family the stage-2 fuzz uses):

  * stage 3: OUR out-agree.txt vs the reference
    `min-factorization < raw-multifasta-out.txt` (byte compare;
    reference: src/min_factorization.c, main-min-factorization.c);
  * stage 4: OUR out-after-intron-agree.txt AND predicted-introns.txt
    vs the reference `intron-agreement` run on the same stage-3 inputs
    (byte; src/main-intron-agreement.c, agree-introns.c,
    classify-intron.c);
  * stages 6-8: the reference replay proof on OUR build-ests.txt
    (tools/ref_replay.py): the reference's own maximal-transcripts,
    cds-annotation and compute_json/json2gtf must reproduce OUR
    isoforms.txt / CCDS_transcripts.txt / VariantGTF.txt / full.json /
    GTF byte-for-byte (src/MaximalTranscripts.c, src/CCDS.c).  Stage
    5's Perl-hash-order nondeterminism makes a direct stage-5 byte
    compare meaningless; the replay is the strong proof that the
    divergence class is exactly stage 5.

The quirk replications documented in stages/transcripts.py and
stages/ccds.py (boolean-index and head-removal list bugs,
feof double-count, "(null)" printf) are exactly what this fuzz
confirms or falsifies off the golden distribution.

Usage: python tools/fuzz_downstream.py [n_seeds] [seed_base]
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from ref_replay import ensure_reference, replay_stage5_proof  # noqa: E402
from scale_stress import make_case  # noqa: E402


def _same(a: str, b: str) -> bool:
    if not (os.path.exists(a) and os.path.exists(b)):
        return False
    with open(a, "rb") as fa, open(b, "rb") as fb:
        return fa.read() == fb.read()


def run_one(seed: int, gen_len: int, n_ests: int, keep: bool = False):
    """One fuzz case; returns (ok, detail string)."""
    bin_dir = ensure_reference()
    work = tempfile.mkdtemp(prefix=f"fuzzds-{seed}-")
    try:
        make_case(work, gen_len, n_ests, seed)
        r = subprocess.run(
            [sys.executable, "-m", "pintron_tpu.pipeline",
             "--workdir", work, "-g", "genomic.txt", "-s", "ests.txt",
             "-o", "full.json", "-t", "pintron-all-isoforms.gtf",
             "--gene=FUZZ", "--organism=human", "-k"],
            cwd=REPO, capture_output=True, text=True)
        stage7_abort = (r.returncode
                        and "no reference transcript electable"
                        in r.stderr)
        if r.returncode and not stage7_abort:
            return False, f"pipeline rc={r.returncode}: {r.stderr[-400:]}"

        # reference stages 3+4 on OUR stage-2 artifacts, in a replica
        # dir so the reference's outputs never clobber ours
        ref = tempfile.mkdtemp(prefix=f"fuzzds-ref-{seed}-")
        try:
            for fn in ("genomic.txt", "processed-ests.txt",
                       "raw-multifasta-out.txt"):
                shutil.copy(os.path.join(work, fn), ref)
            with open(os.path.join(ref, "raw-multifasta-out.txt")) as fi, \
                    open(os.path.join(ref, "out-agree.txt"), "w") as fo:
                subprocess.run(
                    [os.path.join(bin_dir, "min-factorization")],
                    stdin=fi, stdout=fo, cwd=ref, check=True,
                    stderr=subprocess.DEVNULL)
            if not _same(os.path.join(work, "out-agree.txt"),
                         os.path.join(ref, "out-agree.txt")):
                return False, "stage-3 out-agree.txt differs"
            subprocess.run(
                [os.path.join(bin_dir, "intron-agreement")],
                cwd=ref, check=True, capture_output=True)
            for fn in ("out-after-intron-agree.txt",
                       "predicted-introns.txt"):
                if not _same(os.path.join(work, fn),
                             os.path.join(ref, fn)):
                    return False, f"stage-4 {fn} differs"
        finally:
            shutil.rmtree(ref, ignore_errors=True)

        if stage7_abort:
            # no transcript carries an ORF: the reference's
            # SetREFToLongestTranscript exits EXIT_FAILURE on exactly
            # this condition (CCDS.c:3186-3189, "Error!"); equivalence
            # means the reference's cds-annotation must FAIL too on
            # our stage-6 input
            ref = tempfile.mkdtemp(prefix=f"fuzzds-s7-{seed}-")
            try:
                for fn in ("genomic.txt", "build-ests.txt",
                           "predicted-introns.txt",
                           "genomic-exonforCCDS.txt"):
                    src = os.path.join(work, fn)
                    if os.path.exists(src):
                        shutil.copy(src, ref)
                with open(os.path.join(ref, "build-ests.txt")) as fi:
                    subprocess.run(
                        [os.path.join(bin_dir, "maximal-transcripts")],
                        stdin=fi, cwd=ref, check=True,
                        capture_output=True)
                shutil.copy(os.path.join(ref, "TRANSCRIPTS1_1.txt"),
                            os.path.join(ref, "isoforms.txt"))
                rr = subprocess.run(
                    [os.path.join(bin_dir, "cds-annotation"),
                     "./", "./", "FUZZ", "human"],
                    cwd=ref, capture_output=True)
                if rr.returncode == 0:
                    return False, ("we abort at stage 7 but the "
                                   "reference succeeds")
                return True, "ok (equivalent stage-7 abort: no ORF)"
            finally:
                shutil.rmtree(ref, ignore_errors=True)

        # stages 6-8 replay proof on OUR build-ests.txt
        rp = replay_stage5_proof(work, "FUZZ")
        if not rp["ok"]:
            bad = [k for k, v in rp.items() if v is False and k != "ok"]
            return False, f"replay failed: {', '.join(bad)}"
        return True, "ok"
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    n_seeds = int(argv[0]) if argv else 30
    seed_base = int(argv[1]) if len(argv) > 1 else 1000
    fails = 0
    for k in range(n_seeds):
        seed = seed_base + k
        # vary the locus scale so short/medium/long intron regimes and
        # transcript-graph sizes are all exercised
        gen_len = (30_000, 60_000, 120_000)[k % 3]
        n_ests = (40, 90, 160)[(k // 3) % 3]
        ok, detail = run_one(seed, gen_len, n_ests)
        status = "OK " if ok else "FAIL"
        print(f"{status} seed={seed} gen={gen_len} ests={n_ests}"
              f"  {detail}", flush=True)
        if not ok:
            fails += 1
    print(f"{n_seeds - fails}/{n_seeds} clean")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
