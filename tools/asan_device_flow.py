#!/usr/bin/env python
"""ASan/UBSan exercise for the DEVICE-FLOW natives (collects, lookaside,
op-stream decode, memo fills).

ASan's interceptors conflict with JAX's C++ runtime in-process, so the
run is split: phase A (clean python, JAX on CPU) runs the real device
flow on a golden case and dumps every device batch result it fed to the
natives; phase B (ASan build of dp.c, no JAX) replays the SAME flow —
est_collect_noisy/endpoints/gaps/introns, epm_fill_*, ri_lookaside_set
+ the full cascade consuming the lookaside — against the recorded
results, under the sanitizers, and byte-compares the stage artifacts.

Usage:
  gcc -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
      -fPIC -shared pintron_tpu/native/dp.c -o /tmp/libdp_asan.so -lm
  python tools/asan_device_flow.py dump  <case> <state.pkl>
  LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
      ASAN_OPTIONS=detect_leaks=0 \
      python tools/asan_device_flow.py replay <case> <state.pkl>
Or simply `python tools/asan_device_flow.py <case>` to run both phases
(the replay in a child process with the preload).
"""

import os
import pickle
import shutil
import subprocess
import sys
import tarfile
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = ("raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
         "processed-megs.txt", "meg-edges.txt")


def _work_for(case: str):
    gold = tempfile.mkdtemp(prefix="asandev-gold-")
    with tarfile.open(
            os.path.join(REPO, "tests", "golden",
                         f"{case}.tar.gz")) as tf:
        tf.extractall(gold)
    work = tempfile.mkdtemp(prefix="asandev-work-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(gold, fn), work)
    return gold, work


def dump(case: str, out_path: str) -> None:
    """Phase A: run the forced-family device flow, recording every
    eval_* result the natives consumed."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PINTRON_DEVICE"] = "1"
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    os.environ["PINTRON_EST_WORKERS"] = "1"
    for fam in ("GAP", "NW", "RB"):
        os.environ[f"PINTRON_DEVICE_{fam}"] = "1"
    import pintron_tpu.ops.offload as off
    from pintron_tpu.stages.est_fact import run_est_fact

    recorded = {"kband": [], "nw": [], "rb": [], "gap": []}
    for name in ("eval_kband", "eval_nw", "eval_rb", "eval_gap"):
        orig = getattr(off, name)
        key = name.split("_", 1)[1]

        def wrap(orig=orig, key=key):
            def f(problems):
                r = orig(problems)
                recorded[key].append((problems, r))
                return r
            return f
        setattr(off, name, wrap())

    gold, work = _work_for(case)
    run_est_fact(work)
    with open(out_path, "wb") as f:
        pickle.dump(recorded, f)
    shutil.rmtree(gold, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    print(f"dumped {sum(len(v) for v in recorded.values())} device "
          f"batches to {out_path}")


def replay(case: str, state_path: str) -> int:
    """Phase B: the same flow with the natives under ASan, every device
    eval answered from the recording (matched by problem list)."""
    import ctypes

    import pintron_tpu.native as native

    _orig = native._build_and_load

    def _asan_load():
        lib = ctypes.CDLL("/tmp/libdp_asan.so")
        ref = _orig()
        for name in dir(ref):
            if name.startswith("_"):
                continue
            fn = getattr(ref, name, None)
            if hasattr(fn, "argtypes"):
                g = getattr(lib, name, None)
                if g is not None:
                    g.argtypes = fn.argtypes
                    g.restype = fn.restype
        return lib

    native._build_and_load = _asan_load
    native._LIB = None
    native._TRIED = False

    os.environ["PINTRON_DEVICE"] = "1"
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    os.environ["PINTRON_EST_WORKERS"] = "1"
    for fam in ("GAP", "NW", "RB"):
        os.environ[f"PINTRON_DEVICE_{fam}"] = "1"

    with open(state_path, "rb") as f:
        recorded = pickle.load(f)
    cursors = {k: 0 for k in recorded}

    import pintron_tpu.ops.offload as off

    def player(key):
        def f(problems):
            batches = recorded[key]
            # match by problem list (collect order can interleave
            # slightly differently run to run; search forward first)
            for i in range(cursors[key], len(batches)):
                if batches[i][0] == problems:
                    cursors[key] = i + 1
                    return batches[i][1]
            for i in range(len(batches)):
                if batches[i][0] == problems:
                    return batches[i][1]
            return None   # unseen batch: host path computes it
        return f

    off.eval_kband = player("kband")
    off.eval_nw = player("nw")
    off.eval_rb = player("rb")
    off.eval_gap = player("gap")

    from pintron_tpu.stages.est_fact import run_est_fact
    gold, work = _work_for(case)
    run_est_fact(work)
    bad = []
    for name in NAMES:
        gp = os.path.join(gold, name)
        if not os.path.exists(gp):
            continue
        with open(gp, "rb") as fa, \
                open(os.path.join(work, name), "rb") as fb:
            if fa.read() != fb.read():
                bad.append(name)
    print(case, "ASAN-DEVICE-OK" if not bad else f"DIFF {bad}")
    return 1 if bad else 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "dump":
        dump(argv[1], argv[2])
        return 0
    if argv and argv[0] == "replay":
        return replay(argv[1], argv[2])
    case = argv[0] if argv else "test-AMBN"
    state = tempfile.mktemp(suffix=".pkl")
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "dump", case, state], check=True)
    asan = subprocess.run(
        ["gcc", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    env = dict(os.environ)
    env["LD_PRELOAD"] = asan
    env["ASAN_OPTIONS"] = "detect_leaks=0"
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "replay", case, state], env=env)
    try:
        os.unlink(state)
    except OSError:
        pass
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
