#!/usr/bin/env python
"""Reference-binary replay proof for the stage-5 equivalence class.

The reference's stage 5 (compact-compositions.pl) iterates Perl hashes
in a randomized order, so our build-ests.txt is generally a *different
member of the same equivalence class* than the golden one — and every
downstream artifact (isoforms, CCDS, GTF, JSON) legitimately differs in
representative choices.  For golden cases that ship no intermediate
artifacts, class membership cannot be tested directly; instead this
module proves the downstream stages faithful by REPLAY:

  feed OUR build-ests.txt through the REFERENCE's own binaries
  (maximal-transcripts, cds-annotation — reference pintron.py:925-946)
  and the REFERENCE's own compute_json/json2gtf (pintron.py:276-761,
  232-273), then byte-compare every produced artifact against ours.

If the reference, starting from our stage-5 output, reproduces our
CCDS_transcripts.txt, VariantGTF.txt, full.json and GTF byte-for-byte,
then our stages 6-8 are byte-faithful to the reference on this input,
and the final-output divergence from golden is attributable solely to
stage-5 hash-order nondeterminism (stage-4 byte-identity is checked
separately by the caller).

The reference tree is built on demand with
tools/refbuild/build_reference.sh (cached at /tmp/refsrc).
"""

import importlib.util
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BUILD = "/tmp/refsrc"


def ensure_reference(build_dir: str = REF_BUILD) -> str:
    """Return the reference bin dir, building the tree if needed."""
    bin_dir = os.path.join(build_dir, "bin")
    for exe in ("maximal-transcripts", "cds-annotation"):
        if not os.path.exists(os.path.join(bin_dir, exe)):
            break
    else:
        return bin_dir
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "refbuild",
                            "build_reference.sh"), build_dir],
        check=True, capture_output=True, text=True)
    return bin_dir


def _load_ref_pintron(build_dir: str):
    """Import the reference's dist-scripts/pintron.py as a module."""
    path = os.path.join(build_dir, "dist-scripts", "pintron.py")
    spec = importlib.util.spec_from_file_location("ref_pintron", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def replay_stage5_proof(work_dir: str, gene: str,
                        organism: str = "human",
                        pas_tolerance: int = 30,
                        json_name: str = "full.json",
                        gtf_name: str = "pintron-all-isoforms.gtf"
                        ) -> dict:
    """Run the reference stages 6-8 on work_dir's build-ests.txt and
    byte-compare each artifact.  Returns per-artifact booleans plus
    "ok"; raises on missing inputs or a reference-stage failure."""
    bin_dir = ensure_reference()
    replay = tempfile.mkdtemp(prefix="ref-replay-")
    try:
        for fn in ("genomic.txt", "build-ests.txt",
                   "predicted-introns.txt", "genomic-exonforCCDS.txt",
                   "out-after-intron-agree.txt"):
            src = os.path.join(work_dir, fn)
            if os.path.exists(src):
                shutil.copy(src, replay)
            elif fn in ("genomic.txt", "build-ests.txt"):
                raise FileNotFoundError(src)

        with open(os.path.join(replay, "build-ests.txt")) as fin:
            subprocess.run([os.path.join(bin_dir, "maximal-transcripts")],
                           stdin=fin, cwd=replay, check=True,
                           capture_output=True)
        shutil.copy(os.path.join(replay, "TRANSCRIPTS1_1.txt"),
                    os.path.join(replay, "isoforms.txt"))
        subprocess.run([os.path.join(bin_dir, "cds-annotation"),
                        "./", "./", gene, organism],
                       cwd=replay, check=True, capture_output=True)

        # reference stage 8 in-process (compute_json/json2gtf read
        # their side inputs from the cwd)
        ref = _load_ref_pintron(REF_BUILD)
        # compute_json reads the module-global `options.version` (set by
        # the reference's own main); pin it to the version string our
        # run emitted so the byte-compare tests structure, not banner
        import json as _json

        class _Opt:
            version = ""
        try:
            with open(os.path.join(work_dir, json_name)) as f:
                _Opt.version = _json.load(f).get("program_version", "")
        except Exception:
            pass
        ref.options = _Opt
        old_cwd = os.getcwd()
        os.chdir(replay)
        try:
            ref.compute_json(ccds_file="CCDS_transcripts.txt",
                             variant_file="VariantGTF.txt",
                             output_file=json_name,
                             pas_tolerance=pas_tolerance,
                             genomic_seq="genomic.txt")
            ref.json2gtf(json_name, gtf_name, gene, True)
        finally:
            os.chdir(old_cwd)

        def same(fn):
            a, b = os.path.join(work_dir, fn), os.path.join(replay, fn)
            if not (os.path.exists(a) and os.path.exists(b)):
                return False
            with open(a, "rb") as fa, open(b, "rb") as fb:
                return fa.read() == fb.read()

        res = {fn: same(fn) for fn in
               ("isoforms.txt", "CCDS_transcripts.txt",
                "VariantGTF.txt", json_name, gtf_name)}
        res["ok"] = all(res.values())
        return res
    finally:
        shutil.rmtree(replay, ignore_errors=True)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("usage: ref_replay.py <work_dir> <gene> [organism]")
        return 2
    res = replay_stage5_proof(argv[0], argv[1],
                              argv[2] if len(argv) > 2 else "human")
    print(res)
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
