#!/usr/bin/env python
"""Randomized device-flow fuzz: est-fact with EVERY offload family
forced (kband + rb + nw + gap, speculative chains + lookaside) must be
byte-identical to the plain host path on random spliced loci — off the
golden distribution, where small factors make refine-intron mutations
shift later pairs' windows and exercise the lookaside MISS fallbacks.

Usage: python tools/fuzz_device.py [n_seeds] [seed_base]
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

NAMES = ("raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
         "processed-megs.txt", "meg-edges.txt")


def run_case(seed: int, gen_len: int, n_ests: int) -> str:
    from scale_stress import make_case
    base = tempfile.mkdtemp(prefix=f"fuzzdev-{seed}-")
    make_case(base, gen_len, n_ests, seed)
    outs = {}
    for mode in ("host", "device"):
        work = os.path.join(base, mode)
        os.makedirs(work)
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(os.path.join(base, fn), work)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env["PINTRON_FRESH_MEMO"] = "1"
        if mode == "device":
            env["PINTRON_DEVICE"] = "1"
            for fam in ("GAP", "NW", "RB"):
                env[f"PINTRON_DEVICE_{fam}"] = "1"
        else:
            env.pop("PINTRON_DEVICE", None)
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.argv=['x']; "
             "from pintron_tpu.stages.est_fact import run_est_fact; "
             f"run_est_fact({work!r})"],
            env=env, capture_output=True, text=True, cwd=REPO)
        if r.returncode:
            shutil.rmtree(base, ignore_errors=True)
            return f"{mode} run failed: {r.stderr[-300:]}"
        outs[mode] = {
            fn: open(os.path.join(work, fn), "rb").read()
            for fn in NAMES if os.path.exists(os.path.join(work, fn))}
    shutil.rmtree(base, ignore_errors=True)
    bad = [fn for fn in outs["host"]
           if outs["host"][fn] != outs["device"].get(fn)]
    return "ok" if not bad else f"bytes differ: {', '.join(bad)}"


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    n_seeds = int(argv[0]) if argv else 15
    seed_base = int(argv[1]) if len(argv) > 1 else 4000
    fails = 0
    for k in range(n_seeds):
        seed = seed_base + k
        gen_len = (20_000, 50_000, 100_000)[k % 3]
        n_ests = (30, 60, 120)[(k // 3) % 3]
        detail = run_case(seed, gen_len, n_ests)
        ok = detail == "ok"
        print(f"{'OK ' if ok else 'FAIL'} seed={seed} gen={gen_len} "
              f"ests={n_ests}  {detail}", flush=True)
        fails += not ok
    print(f"{n_seeds - fails}/{n_seeds} clean")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
