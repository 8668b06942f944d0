#!/usr/bin/env python
"""Run the est-fact stage against the ASan/UBSan build of the native lib."""
import ctypes, os, sys, shutil, tarfile, tempfile
sys.path.insert(0, "/root/repo")
import pintron_tpu.native as native

# monkeypatch the loader to use the asan .so
_orig = native._build_and_load
def _asan_load():
    lib = ctypes.CDLL("/tmp/libdp_asan.so")
    # reuse the original's argtype declarations by re-running them on this lib
    import types
    src = _orig.__code__
    # simplest: call original then copy argtypes onto asan lib
    ref = _orig()
    for name in dir(ref):
        if name.startswith("_"):
            continue
        f = getattr(ref, name, None)
        if hasattr(f, "argtypes"):
            g = getattr(lib, name, None)
            if g is not None:
                g.argtypes = f.argtypes
                g.restype = f.restype
    return lib
native._build_and_load = _asan_load
native._LIB = None
native._TRIED = False

from pintron_tpu.stages.est_fact import run_est_fact

case = sys.argv[1]
gold = tempfile.mkdtemp()
with tarfile.open(f"/root/repo/tests/golden/{case}.tar.gz") as tf:
    tf.extractall(gold)
work = tempfile.mkdtemp()
ref = f"/root/reference/regressionTest/{case}"
for fn in ("genomic.txt", "ests.txt"):
    src = os.path.join(gold, fn)
    if not os.path.exists(src):
        src = os.path.join(ref, fn)
    shutil.copy(src, work)
run_est_fact(work)
bad = []
for name in ("raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
             "processed-megs.txt", "meg-edges.txt"):
    gp = os.path.join(gold, name)
    if os.path.exists(gp) and open(gp,"rb").read() != open(os.path.join(work,name),"rb").read():
        bad.append(name)
print(case, "ASAN-OK" if not bad else f"DIFF {bad}")
# Usage:
#   gcc -O1 -g -fsanitize=address,undefined -fPIC -shared \
#       pintron_tpu/native/dp.c -o /tmp/libdp_asan.so -lm
#   LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
#       ASAN_OPTIONS=detect_leaks=0 PINTRON_EST_WORKERS=1 \
#       python tools/asan_run.py test-AMBN
