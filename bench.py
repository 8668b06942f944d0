#!/usr/bin/env python
"""Benchmark: ESTs aligned/sec on the AMBN locus (pipeline hot path).

Runs the est-fact stage (seeding + MEG + factorization + refinement — the
stage that dominates reference pipeline time) on the test-AMBN regression
workload and reports throughput.

Baseline: the reference C est-fact binary (single core, -O2, this repo's
gengetopt shim build) processes the same workload — 25 ESTs, 8.5 kb locus
— in 0.143 s wall ≈ 175 ESTs/s (measured on the dev machine, see
BASELINE.md).  `vs_baseline` is our ESTs/s divided by that number.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "ESTs/s", "vs_baseline": N}
"""

import json
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import time

# Fallback baseline when the reference cannot be built on this machine:
# reference C est-fact, single core, measured 25/0.143s (round-1 box).
BASELINE_ESTS_PER_S = 175.0

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def reference_binary():
    """Build (cached) the reference's single-core est-fact; returns the
    binary path or None when it can't be built here."""
    ref_bin = "/tmp/refsrc/bin/est-fact"
    try:
        if not os.path.exists(ref_bin):
            script = os.path.join(REPO, "tools", "refbuild",
                                  "build_reference.sh")
            if not (os.path.exists(script)
                    and os.path.isdir("/root/reference")):
                return None
            subprocess.run(["sh", script], capture_output=True,
                           timeout=900, check=True)
        return ref_bin
    except Exception:
        return None


def time_reference_once(ref_bin: str, work: str):
    t0 = time.perf_counter()
    subprocess.run([ref_bin], cwd=work, capture_output=True,
                   timeout=600, check=True)
    return time.perf_counter() - t0


def measure_device_kernel():
    """Device benchmark channel: the production K-band kernels on the
    real chip.

    Per-problem shapes are the production regime (rows M=256, band
    half-width K=16 -> band width 33, text N=272: noisy-exon windows of
    a few hundred nt with a ~3% error budget).  The batch is sized so
    the KERNEL dominates the measurement: over the remote-attached
    chip a single dispatch costs a ~25-30 ms round trip, so at the
    production batch (B~4096, ~60 us of kernel) per-call timing
    measures the tunnel, not the chip.  B=32768 with several chained
    dispatches (distinct inputs, defeating any transport-level result
    caching) puts >=80% of the wall time in the kernel.

    Reports cells/s (band cells = M * (2K+1) per problem) for the
    Pallas kernel (production default) and the XLA wavefront fallback,
    their ratio, and fractions of two ceilings.  Roofline note,
    REVISED by round-5 measurements: the naive "~200 Gcells/s" ceiling
    (30 ops/cell against 4 fully-parallel VPU ALUs) is unreachable for
    this recurrence — the DP rows form a serial dependency chain of
    vector ops, so the sustained rate is bounded by VECTOR ISSUE, not
    ALU width.  Per row-step the kernel issues ~30 ops on ~5 vregs
    (DP mins, the log2(W) sublane-rotate prefix scan, masking, the
    window shift) ~= 150 vreg-ops covering 128 problems x 33 band
    cells; at ~1 vreg-op/cycle, 940 MHz, that is ~26 Gcells/s
    (`device_pallas_issue_bound_cells_per_s`).  Round-5 experiments
    confirmed the bound empirically: 4-row and 8-row unrolling, native
    sublane rotates with constant masks, vreg-padded bands and 256-lane
    tiles all land within noise of ~9-10 Gcells/s (~35-40% of the
    issue bound — the remainder is Mosaic's per-op overhead on 5-vreg
    ragged tiles).  HBM traffic is O(B*(N+R)) int32, ~8 MB/call
    (~0.1 ms), irrelevant.  Going materially faster needs fewer ops
    per cell: int16/int8 lanes (Mosaic rejects 16-bit vector min on
    this target — probed) or an antidiagonal formulation trading the
    scan for 2x the steps (~1.5x at best).  Returns {} when no
    accelerator is attached."""
    try:
        import jax
        import numpy as np

        from pintron_tpu.ops.align import banded_edit_distance
        from pintron_tpu.ops.pallas_align import banded_edit_distance_pallas

        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return {}
        B, M, K = 32768, 256, 16
        N = M + K
        rng = np.random.default_rng(0)
        sets = []
        for _ in range(8):
            s1 = rng.integers(0, 4, (B, N), dtype=np.int8)
            s2 = np.take_along_axis(
                s1, np.broadcast_to(np.arange(M), (B, M)), axis=1).copy()
            mut = rng.integers(0, M, (B, 8))
            for b in range(0, B, 64):
                s2[b, mut[b]] = (s2[b, mut[b]] + 1) % 4
            l1 = np.full(B, N, dtype=np.int32)
            l2 = np.full(B, M, dtype=np.int32)
            band = np.full(B, K, dtype=np.int32)
            d = tuple(map(jax.device_put, (s1, l1, s2, l2, band)))
            jax.block_until_ready(d)
            sets.append(d)
        cells = B * M * (2 * K + 1)
        out = {"device_kind": str(dev.device_kind),
               "device_batch": [B, M, 2 * K + 1]}
        # deep chains: per-dispatch latency over the remote-attached
        # chip swings 20-80 ms run to run; 8 chained dispatches per
        # timing amortize it to noise
        chain, reps = 8, 4
        for name, fn in (
                ("pallas", lambda *a: banded_edit_distance_pallas(
                    *a, max_rows=M, k_max=K)),
                ("xla", lambda *a: banded_edit_distance(
                    *a, max_rows=M, k_max=K))):
            try:
                np.asarray(fn(*sets[0]))   # compile + warm
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    rs = [fn(*sets[i % 8]) for i in range(chain)]
                    for r in rs:
                        np.asarray(r)
                    best = min(best, (time.perf_counter() - t0) / chain)
                cps = cells / best
                out[f"device_{name}_cells_per_s"] = round(cps)
                out[f"device_{name}_vpu_peak_frac_est"] = round(
                    cps * 30 / 6.1e12, 4)
                if name == "pallas":
                    # serial-chain issue bound (see docstring): ~150
                    # vreg-ops per 128x33-cell row step at ~0.94 GHz
                    issue_bound = 128 * 33 / (150 / 0.94e9)
                    out["device_pallas_issue_bound_cells_per_s"] = \
                        round(issue_bound)
                    out["device_pallas_issue_bound_frac"] = round(
                        cps / issue_bound, 3)
            except Exception:
                out[f"device_{name}_cells_per_s"] = None
        if out.get("device_pallas_cells_per_s") and \
                out.get("device_xla_cells_per_s"):
            out["device_pallas_vs_xla"] = round(
                out["device_pallas_cells_per_s"]
                / out["device_xla_cells_per_s"], 2)
        return out
    except Exception:
        return {}


def measure_device_mode(workdir: str, n_ests: int):
    """Secondary channel: est-fact wall time with the TPU-offload flow
    on (PINTRON_DEVICE=1) — the production device path end-to-end on
    the real chip, in the production configuration: the chip-owning
    device service + fork-sharded device flow (host cascade on all
    cores, device batches merged on the service).  Also reports the
    honest offload fraction: device-evaluated DP cells over all
    alignment-DP cells (device + the native host census)."""
    try:
        import jax
        if jax.devices()[0].platform == "cpu":
            return {}
        import pintron_tpu.ops.offload as off
        from pintron_tpu.batch import _start_service, _stop_service
        from pintron_tpu.native import dp_census, dp_census_reset
        from pintron_tpu.stages.est_fact import run_est_fact
        os.environ["PINTRON_DEVICE"] = "1"
        os.environ["PINTRON_FRESH_MEMO"] = "1"
        svc = _start_service()
        try:
            run_est_fact(workdir)   # warm (compiles)
            off.reset_stats()
            dp_census_reset()
            best = float("inf")
            runs = 0
            for _ in range(3):
                t0 = time.perf_counter()
                run_est_fact(workdir)
                best = min(best, time.perf_counter() - t0)
                runs += 1
        finally:
            _stop_service(svc)
            del os.environ["PINTRON_DEVICE"]
            del os.environ["PINTRON_FRESH_MEMO"]
        host = dict(off.HOST_CENSUS)
        local = dp_census() or {}
        for k, v in local.items():
            host[k] = host.get(k, 0) + v
        host_cells = sum(host.values())
        dev_cells = off.STATS["device_cells"]
        frac = (dev_cells / (dev_cells + host_cells)
                if dev_cells + host_cells else 0.0)
        out = {"device_mode_ests_per_s": round(n_ests / best, 2),
               "device_mode_problems_offloaded":
                   off.STATS["device_problems"] // max(1, runs),
               "device_cell_fraction": round(frac, 4),
               "host_cells_by_family":
                   {k: v // max(1, runs) for k, v in host.items()},
               "device_cells_per_run":
                   dev_cells // max(1, runs)}

        # Forced-family run: every DP family (kband + rb + nw + gap)
        # on device regardless of the link self-tuning — the honest
        # measure of how much of the alignment DP the architecture
        # can put on the chip (the auto number above shows what the
        # tuner keeps on over THIS attachment link).
        svc = _start_service()
        os.environ["PINTRON_DEVICE"] = "1"
        os.environ["PINTRON_FRESH_MEMO"] = "1"
        for fam in ("KBAND", "GAP", "NW", "RB"):
            os.environ[f"PINTRON_DEVICE_{fam}"] = "1"
        try:
            run_est_fact(workdir)   # warm (forced-family compiles)
            off.reset_stats()
            dp_census_reset()
            t0 = time.perf_counter()
            run_est_fact(workdir)
            dt = time.perf_counter() - t0
            host = dict(off.HOST_CENSUS)
            for k, v in (dp_census() or {}).items():
                host[k] = host.get(k, 0) + v
            hc = sum(host.values())
            dc = off.STATS["device_cells"]
            out["device_cell_fraction_forced"] = round(
                dc / (dc + hc) if dc + hc else 0.0, 4)
            out["device_mode_forced_ests_per_s"] = round(n_ests / dt, 2)
        finally:
            _stop_service(svc)
            for fam in ("KBAND", "GAP", "NW", "RB"):
                os.environ.pop(f"PINTRON_DEVICE_{fam}", None)
            del os.environ["PINTRON_DEVICE"]
            del os.environ["PINTRON_FRESH_MEMO"]
        return out
    except Exception:
        return {}


def measure_device_stress():
    """Device-vs-CPU head-to-head at production scale: the 1 Mb x 5000
    synthetic stress locus (tools/scale_stress.py), fresh-locus work,
    interleaved best-of so the shared box's load drift cancels.  This is
    the scale where the device path's fixed costs (service spawn, fork
    setup, dispatch round trips) amortize; the small-locus AMBN channel
    above deliberately shows the unamortized cost."""
    try:
        import jax
        if jax.devices()[0].platform == "cpu":
            return {}
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from scale_stress import make_case

        import pintron_tpu.ops.offload as off
        from pintron_tpu.batch import _start_service, _stop_service
        from pintron_tpu.stages.est_fact import run_est_fact
        work = tempfile.mkdtemp(prefix="pintron-stress-")
        make_case(work, 1_000_000, 5000, 7)
        os.environ["PINTRON_FRESH_MEMO"] = "1"
        os.environ["PINTRON_DEVICE"] = "1"
        svc = _start_service()
        best_dev = best_kb = best_cpu = float("inf")
        dev_problems = 0
        try:
            run_est_fact(work)   # warm compiles/caches
            for _ in range(3):
                off.reset_stats()
                t0 = time.perf_counter()
                run_est_fact(work)
                best_dev = min(best_dev, time.perf_counter() - t0)
                # per-run count from the full-device config only (the
                # kband-only and CPU runs below also touch STATS)
                dev_problems = off.STATS["device_problems"]
                # K-band-only offload (rb disabled): isolates the
                # row-table transfer cost of the rb family
                os.environ["PINTRON_DEVICE_RB"] = "0"
                t0 = time.perf_counter()
                run_est_fact(work)
                best_kb = min(best_kb, time.perf_counter() - t0)
                del os.environ["PINTRON_DEVICE_RB"]
                del os.environ["PINTRON_DEVICE"]
                t0 = time.perf_counter()
                run_est_fact(work)
                best_cpu = min(best_cpu, time.perf_counter() - t0)
                os.environ["PINTRON_DEVICE"] = "1"
        finally:
            _stop_service(svc)
            del os.environ["PINTRON_DEVICE"]
            del os.environ["PINTRON_FRESH_MEMO"]
            os.environ.pop("PINTRON_DEVICE_RB", None)
        shutil.rmtree(work, ignore_errors=True)
        return {"stress_device_ests_per_s": round(5000 / best_dev, 1),
                "stress_device_kband_only_ests_per_s":
                    round(5000 / best_kb, 1),
                "stress_cpu_ests_per_s": round(5000 / best_cpu, 1),
                "stress_device_vs_cpu": round(best_cpu / best_dev, 3),
                "stress_device_problems": dev_problems}
    except Exception:
        return {}


def run_device_channels(workdir: str, n_ests: int) -> dict:
    """Run the device measurement channels in a timeout-bounded
    subprocess: first-compile latency over a remote-attached chip can
    occasionally blow up (minutes), and a hung device section must not
    prevent the headline JSON line from being printed."""
    out = ""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--device-channels", workdir, str(n_ests)],
            capture_output=True, text=True, timeout=1500)
        out = r.stdout or ""
    except subprocess.TimeoutExpired as e:
        # the child prints cumulative JSON after EACH channel, so a
        # timeout still yields the channels that finished
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
    except Exception:
        pass
    for line in reversed(out.strip().splitlines() or []):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return {"device_channels": "skipped (timeout or error)"}


def main():
    from pintron_tpu.stages.est_fact import run_est_fact

    golden = os.path.join(REPO, "tests", "golden", "test-AMBN.tar.gz")
    src = tempfile.mkdtemp(prefix="pintron-bench-src-")
    with tarfile.open(golden) as tf:
        tf.extractall(src)

    n_ests = 0
    with open(os.path.join(src, "ests.txt")) as f:
        for line in f:
            if line.startswith(">"):
                n_ests += 1

    # warm-up (native lib build, imports, worker pool)
    work = tempfile.mkdtemp(prefix="pintron-bench-")
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(src, fn), work)
    run_est_fact(work)

    # Honest headline: fresh-locus work per repetition.  The framework
    # keeps a persistent result memo across runs on the same locus;
    # repeating the identical input would let later reps degenerate to
    # cache hits, which the single-process reference binary cannot do.
    # PINTRON_FRESH_MEMO wipes the memo and rebuilds the index each
    # run, so best-of-N de-noises without changing the work measured.
    #
    # Ours and the reference are measured INTERLEAVED in blocks: on a
    # shared box, CPU frequency/load drifts over seconds, and measuring
    # the two sides in disjoint windows makes the ratio absorb that
    # drift.  Interleaving gives both sides the same spread of machine
    # states; best-of-N then compares best-case to best-case.
    ref_bin = reference_binary()
    ref_work = None
    if ref_bin:
        ref_work = tempfile.mkdtemp(prefix="pintron-bench-ref-")
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(os.path.join(src, fn), ref_work)
        try:
            time_reference_once(ref_bin, ref_work)  # warm page cache
        except Exception:
            ref_bin = None  # fall back to the stored baseline

    os.environ["PINTRON_FRESH_MEMO"] = "1"
    dt = float("inf")
    dt_ref = float("inf")
    try:
        run_est_fact(work)  # one fresh-mode warm-up (scratch growth)
        # 7 blocks spread the measurement over ~30 s of wall clock so a
        # transient external-load window cannot depress every rep of
        # either side; best-of over all blocks
        for _block in range(7):
            for _ in range(4):
                t0 = time.perf_counter()
                run_est_fact(work)
                dt = min(dt, time.perf_counter() - t0)
            if ref_bin:
                try:
                    for _ in range(2):
                        dt_ref = min(dt_ref,
                                     time_reference_once(ref_bin,
                                                         ref_work))
                except Exception:
                    # a crashing/hanging reference must not kill the
                    # benchmark: report against the stored baseline
                    if dt_ref == float("inf"):
                        ref_bin = None
    finally:
        del os.environ["PINTRON_FRESH_MEMO"]
    if ref_work:
        shutil.rmtree(ref_work, ignore_errors=True)

    # secondary: warm-repeat throughput (persistent memo retained),
    # i.e. re-running the same locus — reported but not the headline
    dt_warm = float("inf")
    for _ in range(9):
        t0 = time.perf_counter()
        run_est_fact(work)
        dt_warm = min(dt_warm, time.perf_counter() - t0)

    ests_per_s = n_ests / dt
    ref_rate = (n_ests / dt_ref) if ref_bin else None
    baseline = ref_rate if ref_rate else BASELINE_ESTS_PER_S
    out = {
        "metric": "est-fact throughput (AMBN locus, fresh-locus work)",
        "value": round(ests_per_s, 2),
        "unit": "ESTs/s",
        "vs_baseline": round(ests_per_s / baseline, 3),
        "baseline_ests_per_s": round(baseline, 1),
        "baseline_source": "measured" if ref_rate else "stored",
        "warm_repeat_ests_per_s": round(n_ests / dt_warm, 2),
    }
    out.update(run_device_channels(work, n_ests))
    print(json.dumps(out))

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--device-channels":
        res = {}
        for step in (measure_device_kernel,
                     lambda: measure_device_mode(sys.argv[2],
                                                 int(sys.argv[3])),
                     measure_device_stress):
            res.update(step())
            # cumulative line per channel: a parent-side timeout keeps
            # whatever finished
            print(json.dumps(res), flush=True)
        sys.exit(0)
    main()
