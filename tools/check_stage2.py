#!/usr/bin/env python
"""Run the est-fact stage on every golden regression case and compare all
stage-2 artifacts byte-for-byte against the golden reference outputs.

Usage: python tools/check_stage2.py [--device] [case ...]
Exits nonzero on any mismatch.  This is the guard used while porting
per-EST work into the native library.

--device (or PINTRON_DEVICE=1 in the environment) runs the TPU-offload
flow: the cascade's K-band checks are batched across the EST set and
evaluated on the default JAX device (pintron_tpu/ops/offload.py), then
pre-filled into the native memo.  The check additionally asserts that
problems were genuinely evaluated on device (no silent CPU fallback).
"""

import os
import pathlib
import shutil
import sys
import tarfile
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"

CHECK_FILES = ["raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
               "processed-megs.txt", "meg-edges.txt"]


def main():
    from pintron_tpu.stages.est_fact import run_est_fact

    args = sys.argv[1:]
    device = "--device" in args or bool(os.environ.get("PINTRON_DEVICE"))
    args = [a for a in args if a != "--device"]
    if device:
        os.environ["PINTRON_DEVICE"] = "1"
        # force the K-band family: this sweep certifies the DEVICE
        # path's bytes, so the link self-tuner must not quietly turn
        # the flow into a host run on slow attachments
        os.environ.setdefault("PINTRON_DEVICE_KBAND", "1")
        import pintron_tpu.ops.offload as offload
        mesh_n = int(os.environ.get("PINTRON_DEVICE_MESH", "0") or 0)
        if mesh_n > 1:
            # a sitecustomize may have pinned a 1-chip backend; the mesh
            # check needs n virtual CPU devices (conftest pattern)
            from pintron_tpu.parallel.devices import \
                ensure_virtual_cpu_devices
            got = ensure_virtual_cpu_devices(mesh_n)
            if got < mesh_n:
                print(f"cannot provision {mesh_n} devices (got {got})")
                sys.exit(2)
    cases = args or sorted(
        p.name[:-7] for p in GOLDEN.glob("test*.tar.gz"))
    fails = 0
    for case in cases:
        tgz = GOLDEN / f"{case}.tar.gz"
        gold = tempfile.mkdtemp(prefix=f"gold-{case}-")
        with tarfile.open(tgz) as tf:
            tf.extractall(gold)
        work = tempfile.mkdtemp(prefix=f"work-{case}-")
        ref_case = pathlib.Path("/root/reference/regressionTest") / case
        missing_input = False
        for fn in ("genomic.txt", "ests.txt"):
            src = os.path.join(gold, fn)
            if not os.path.exists(src):
                src = ref_case / fn
            if not os.path.exists(src):
                missing_input = True
                break
            shutil.copy(src, work)
        if missing_input:
            print(f"SKIP {case:44s} (no inputs)")
            continue
        if device:
            offload.reset_stats()
        t0 = time.perf_counter()
        run_est_fact(work)
        dt = time.perf_counter() - t0
        bad = []
        if device and offload.STATS.get("device_runs", 0) == 0:
            bad.append("(device path fell back to CPU)")
        for name in CHECK_FILES:
            gp = os.path.join(gold, name)
            wp = os.path.join(work, name)
            if not os.path.exists(gp):
                continue
            with open(gp, "rb") as f:
                g = f.read()
            with open(wp, "rb") as f:
                w = f.read()
            if g != w:
                bad.append(name)
        status = "OK " if not bad else "FAIL"
        print(f"{status} {case:45s} {dt:7.2f}s"
              + (f"  differs: {', '.join(bad)}" if bad else ""))
        if bad:
            fails += 1
            print(f"     work dir kept: {work}")
            print(f"     gold dir kept: {gold}")
        else:
            shutil.rmtree(work, ignore_errors=True)
            shutil.rmtree(gold, ignore_errors=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
