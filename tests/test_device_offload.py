"""Device-offload path (PINTRON_DEVICE=1): the batched K-band verdicts
must match the native ep_kband routing exactly, and the full est-fact
stage with the device flag on must produce byte-identical artifacts."""

import os
import shutil
import tarfile
import tempfile

import numpy as np
import pytest

from pintron_tpu.native import get_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")

ALPHA = np.array(list("ACGT"))


def _host_ep_kband_ok(lib, g: bytes, e: bytes, ub: int) -> int:
    """Reference reimplementation of ep_kband's *ok flag (dp.c) using
    the native scalar kernels."""
    if len(g) == len(e) and g == e:
        return 1
    if ub == 0:
        return 0
    a, b = (g, e) if len(g) >= len(e) else (e, g)
    n, m = len(a), len(b)
    if n - m > ub:
        return 0
    if 2 * ub + 1 >= n:
        return int(int(lib.edit_total(a, n, b, m)) <= ub)
    r = int(lib.kband_core(a, n, b, m, ub))
    return int(0 <= r <= ub)


def test_eval_kband_matches_native():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    from pintron_tpu.ops.offload import eval_kband

    rng = np.random.default_rng(11)
    problems = []
    for _ in range(120):
        n = int(rng.integers(1, 300))
        g = "".join(rng.choice(ALPHA, n)).encode()
        mode = int(rng.integers(0, 4))
        if mode == 0:          # identical
            e = g
        elif mode == 1:        # few mutations, similar length
            el = list(g.decode())
            for _ in range(int(rng.integers(0, 8))):
                el[int(rng.integers(0, n))] = str(rng.choice(ALPHA))
            e = "".join(el).encode()
        elif mode == 2:        # truncated
            e = g[: max(1, n - int(rng.integers(0, 12)))]
        else:                  # unrelated
            e = "".join(rng.choice(ALPHA,
                                   int(rng.integers(1, 300)))).encode()
        ub = int(rng.integers(0, 12))
        problems.append((g, e, ub))
    # shapes the production path sees: a few long-exon problems too
    for n in (800, 1500):
        g = "".join(rng.choice(ALPHA, n)).encode()
        el = list(g.decode())
        for _ in range(20):
            el[int(rng.integers(0, n))] = str(rng.choice(ALPHA))
        problems.append((g, "".join(el).encode(), 30))
    # masked/ambiguous characters exactly as the pipeline produces them:
    # polyA/T masking rewrites EST tails to '*'/'#' and loci carry 'N's;
    # both kernels compare raw bytes, so these must round-trip too
    MASKED = np.array(list("ACGTN*#n"))
    for _ in range(40):
        n = int(rng.integers(10, 200))
        g = "".join(rng.choice(MASKED, n)).encode()
        el = list(g.decode())
        for _ in range(int(rng.integers(0, 10))):
            el[int(rng.integers(0, n))] = str(rng.choice(MASKED))
        e = "".join(el).encode()[: max(1, n - int(rng.integers(0, 6)))]
        problems.append((g, e, int(rng.integers(0, 10))))

    got = eval_kband(problems)
    for i, (g, e, ub) in enumerate(problems):
        assert int(got[i]) == _host_ep_kband_ok(lib, g, e, ub), \
            (i, len(g), len(e), ub)


def test_device_stage2_byte_identical():
    """est-fact with PINTRON_DEVICE=1 must reproduce the golden stage-2
    artifacts byte-for-byte, with the K-band verdicts actually coming
    from the device batch."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "est_collect_noisy"):
        pytest.skip("native collect entry unavailable")
    import pintron_tpu.ops.offload as off
    from pintron_tpu.stages.est_fact import run_est_fact

    tgz = os.path.join(GOLDEN, "test-AMBN.tar.gz")
    gold = tempfile.mkdtemp(prefix="dev-gold-")
    with tarfile.open(tgz) as tf:
        tf.extractall(gold)
    work = tempfile.mkdtemp(prefix="dev-work-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(gold, fn), work)

    off.reset_stats()
    off.KBAND_SELF_TUNED_OFF = False   # order-independence vs the tuner
    os.environ["PINTRON_DEVICE"] = "1"
    # fresh memo: an earlier in-process test on the same locus would
    # otherwise leave nothing for the device batch to compute
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    try:
        run_est_fact(work)
    finally:
        del os.environ["PINTRON_DEVICE"]
        del os.environ["PINTRON_FRESH_MEMO"]

    assert off.STATS["device_problems"] > 0, \
        "device path fell back to CPU silently"
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "processed-megs.txt", "meg-edges.txt"):
        gp = os.path.join(gold, name)
        if not os.path.exists(gp):
            continue
        with open(gp, "rb") as f:
            g = f.read()
        with open(os.path.join(work, name), "rb") as f:
            w = f.read()
        assert g == w, f"{name} differs under PINTRON_DEVICE=1"
    shutil.rmtree(gold, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


def test_device_stage4_pwm_byte_identical():
    """Stage 4 with PINTRON_DEVICE=1: the registry's BPS sweeps run as
    one device batch (f32 sweep + f64 exact finishing) and the stage
    outputs — including the printed PWM/BPS doubles in
    predicted-introns.txt — stay byte-identical to golden."""
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    import pintron_tpu.factorize.classify as cl
    import pintron_tpu.ops.offload as off
    from pintron_tpu.stages.est_fact import run_est_fact
    from pintron_tpu.stages.intron_agreement import run_intron_agreement
    from pintron_tpu.stages.min_factorization import run_min_factorization

    tgz = os.path.join(GOLDEN, "test-AMBN.tar.gz")
    gold = tempfile.mkdtemp(prefix="pwm-gold-")
    with tarfile.open(tgz) as tf:
        tf.extractall(gold)
    work = tempfile.mkdtemp(prefix="pwm-work-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(gold, fn), work)

    cl._BPS_OVERRIDE.clear()
    cl.classify_genomic_intron_start_end.cache_clear()
    off.STATS.pop("pwm_windows", None)
    os.environ["PINTRON_DEVICE"] = "1"
    os.environ["PINTRON_DEVICE_RB"] = "1"   # force rb on small batches
    os.environ["PINTRON_DEVICE_NW"] = "1"   # force endpoint NW too
    os.environ["PINTRON_FRESH_MEMO"] = "1"  # warm memo = nothing to collect
    try:
        run_est_fact(work)
        with open(os.path.join(work, "raw-multifasta-out.txt")) as fin, \
                open(os.path.join(work, "out-agree.txt"), "w") as fout:
            run_min_factorization(fin, fout)
        run_intron_agreement(work)
    finally:
        del os.environ["PINTRON_DEVICE"]
        del os.environ["PINTRON_DEVICE_RB"]
        del os.environ["PINTRON_DEVICE_NW"]
        del os.environ["PINTRON_FRESH_MEMO"]

    assert off.STATS.get("pwm_windows", 0) > 0, \
        "PWM sweep never reached the device"
    assert off.STATS.get("rb_problems", 0) > 0, \
        "refine-borders problems never reached the device"
    assert off.STATS.get("nw_problems", 0) > 0, \
        "endpoint NW problems never reached the device"
    assert off.STATS.get("edit_problems", 0) > 0, \
        "predicted-introns edit stats never reached the device"
    for name in ("out-after-intron-agree.txt", "predicted-introns.txt"):
        with open(os.path.join(gold, name), "rb") as f:
            g = f.read()
        with open(os.path.join(work, name), "rb") as f:
            w = f.read()
        assert g == w, f"{name} differs under PINTRON_DEVICE=1"
    shutil.rmtree(gold, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


def test_wedged_device_degrades_to_cpu_byte_identical(monkeypatch):
    """A hung device dispatch must not hang STEP 2: eval_kband's
    watchdog times out, the wedge latch flips, the memo pre-fill is
    skipped, and the native cascade recomputes every K-band verdict on
    host — stage-2 artifacts stay byte-identical."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "est_collect_noisy"):
        pytest.skip("native collect entry unavailable")
    import threading

    import pintron_tpu.ops.offload as off
    from pintron_tpu.stages.est_fact import run_est_fact

    tgz = os.path.join(GOLDEN, "test-788.tar.gz")
    gold = tempfile.mkdtemp(prefix="wedge-gold-")
    with tarfile.open(tgz) as tf:
        tf.extractall(gold)
    work = tempfile.mkdtemp(prefix="wedge-work-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(gold, fn), work)

    release = threading.Event()

    def fake_hang(problems):
        release.wait(30)  # far beyond the 1s test timeout
        return None

    off.reset_stats()
    monkeypatch.setattr(off, "_eval_kband_device", fake_hang)
    monkeypatch.setenv("PINTRON_DEVICE", "1")
    # force the family: an earlier test's slow CPU-backend batch may
    # have self-tuned kband off, which would skip the dispatch entirely
    monkeypatch.setenv("PINTRON_DEVICE_KBAND", "1")
    monkeypatch.setenv("PINTRON_FRESH_MEMO", "1")
    monkeypatch.setenv("PINTRON_DEVICE_TIMEOUT_S", "1")
    try:
        run_est_fact(work)
    finally:
        release.set()           # unblock the daemon worker thread
        off._WEDGED = False     # reset the process-wide latch

    assert off.STATS["device_timeouts"] >= 1, \
        "the fake-hung dispatch never hit the watchdog"
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "processed-megs.txt", "meg-edges.txt"):
        gp = os.path.join(gold, name)
        if not os.path.exists(gp):
            continue
        with open(gp, "rb") as f:
            g = f.read()
        with open(os.path.join(work, name), "rb") as f:
            w = f.read()
        assert g == w, f"{name} differs after device-wedge fallback"
    shutil.rmtree(gold, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


def test_device_gap_family_byte_identical():
    """est-fact with the intron-refinement (gap-align) family forced
    (PINTRON_DEVICE_GAP=1) must stay byte-identical to golden, with
    real gap problems evaluated on device through the chain rounds."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "est_collect_introns"):
        pytest.skip("native intron collect entry unavailable")
    import pintron_tpu.ops.offload as off
    from pintron_tpu.stages.est_fact import run_est_fact

    tgz = os.path.join(GOLDEN, "test-AMBN.tar.gz")
    gold = tempfile.mkdtemp(prefix="gap-gold-")
    with tarfile.open(tgz) as tf:
        tf.extractall(gold)
    work = tempfile.mkdtemp(prefix="gap-work-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(gold, fn), work)

    off.reset_stats()
    off.GAP_SELF_TUNED_OFF = False
    off.KBAND_SELF_TUNED_OFF = False
    os.environ["PINTRON_DEVICE"] = "1"
    os.environ["PINTRON_DEVICE_GAP"] = "1"
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    try:
        run_est_fact(work)
    finally:
        del os.environ["PINTRON_DEVICE"]
        del os.environ["PINTRON_DEVICE_GAP"]
        del os.environ["PINTRON_FRESH_MEMO"]

    assert off.STATS.get("gap_problems", 0) > 0, \
        "gap family fell back to CPU silently"
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "processed-megs.txt", "meg-edges.txt"):
        gp = os.path.join(gold, name)
        if not os.path.exists(gp):
            continue
        with open(gp, "rb") as f:
            g = f.read()
        with open(os.path.join(work, name), "rb") as f:
            w = f.read()
        assert g == w, f"{name} differs with PINTRON_DEVICE_GAP=1"
    shutil.rmtree(gold, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


def test_self_tune_latch_recovers_on_warm_link():
    """The self-tuning latch must not be a life sentence: while latched
    OFF, every TUNE_REPROBE_EVERY-th opportunity runs as a re-probe,
    and a probe that beats the host estimate CLEARS the latch (a link
    that was only cold during first compiles recovers the family)."""
    import pintron_tpu.ops.offload as off

    old = off.GAP_SELF_TUNED_OFF
    old_skips = dict(off._TUNE_SKIPS)
    try:
        # a slow measured batch latches the family off
        off.GAP_SELF_TUNED_OFF = False
        off._TUNE_SKIPS["gap"] = 0
        off.tune_report("gap", elapsed=1.0, host_est=0.001)
        assert off.GAP_SELF_TUNED_OFF

        # latched: the next 7 opportunities are skipped, the 8th runs
        for _ in range(off.TUNE_REPROBE_EVERY - 1):
            assert off.tuned_off("gap")
        assert not off.tuned_off("gap"), "re-probe slot must run"

        # the re-probe measures a fast batch: latch cleared
        off.tune_report("gap", elapsed=0.0005, host_est=0.01)
        assert not off.GAP_SELF_TUNED_OFF
        assert not off.tuned_off("gap")

        # hysteresis band: a mediocre batch neither sets nor clears
        off.tune_report("gap", elapsed=0.0159, host_est=0.01)
        assert not off.GAP_SELF_TUNED_OFF
        off.GAP_SELF_TUNED_OFF = True
        off.tune_report("gap", elapsed=0.0159, host_est=0.01)
        assert off.GAP_SELF_TUNED_OFF
    finally:
        off.GAP_SELF_TUNED_OFF = old
        off._TUNE_SKIPS.update(old_skips)
