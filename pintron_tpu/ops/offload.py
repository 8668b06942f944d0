"""Device evaluation of the production K-band problem batches.

This is the bridge that makes the TPU load-bearing in the est-fact
pipeline: the native collect pass (``est_collect_noisy`` in dp.c) lists
every noisy-exon K-band check the filter cascade will need
(reference: est-factorizations.c:1828-1899 -> compute-alignments.c:319-453),
``eval_kband`` evaluates the whole cross-EST batch with the XLA/Pallas
wavefront kernels (ops/align.py, ops/pallas_align.py — bit-equal to the
C ``kband_core``), and the verdicts are pre-filled into the native memo
(``epm_fill_noisy``) so the cascade memo-hits every exon.

Routing mirrors ``ep_kband`` (dp.c) exactly:
  * equal sequences           -> ok (no DP)
  * zero error budget         -> not ok
  * length gap > budget       -> not ok
  * band covers the matrix    -> full edit distance (batched)
  * otherwise                 -> K-band DP (batched)
Problems are bucketed by padded power-of-two shapes so jit caches stay
small; within a bucket the whole batch advances in lockstep on the VPU
lanes (batch on sublanes, band/columns on lanes).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def _p2(x: int, lo: int = 16) -> int:
    v = lo
    while v < x:
        v <<= 1
    return v


def _p4(x: int, lo: int = 16) -> int:
    """Power-of-FOUR bucket: every distinct compiled shape costs a
    (potentially tens-of-seconds) remote compile and a dispatch per
    batch, so sequence-length axes use coarse buckets — padding waste
    on the device is microseconds, extra dispatches are not."""
    v = lo
    while v < x:
        v <<= 2
    return v


def _encode(seqs: Sequence[bytes], width: int, rows: int = 0):
    """Pack byte strings into a padded int8 code batch.  ``rows`` pads
    the BATCH axis too (extra all-zero problems): every distinct batch
    size is a fresh XLA compile, so callers bucket B to powers of two
    and slice the results back."""
    B = max(len(seqs), rows)
    out = np.zeros((B, width), dtype=np.int8)
    lens = np.zeros((B,), dtype=np.int32)
    for i, s in enumerate(seqs):
        b = np.frombuffer(s, dtype=np.uint8)
        out[i, : len(b)] = b.astype(np.int8)
        lens[i] = len(b)
    return out, lens


# ---- multi-chip execution ------------------------------------------------
# PINTRON_DEVICE_MESH=N shards every problem batch over an N-device
# ("data",) mesh via shard_map: the per-EST/per-problem independence axis
# of the reference (main-est-fact.c:249-291) made explicit across chips.
# Problems are padded to a multiple of N; each shard runs the same
# wavefront kernel; a psum'd ok-count rides the mesh as the deterministic
# global-merge collective (the registry-merge pattern).  Results are
# bit-identical to the single-device path (int32 DP, elementwise over
# problems), which tests/test_parallel.py asserts on real pipeline data.

_MESH = None
_SHARDED_CACHE = {}


def _mesh():
    global _MESH
    n = int(os.environ.get("PINTRON_DEVICE_MESH", "0") or 0)
    if n <= 1:
        return None
    import jax
    from jax.sharding import Mesh
    if _MESH is None or len(_MESH.devices.ravel()) != n:
        devs = jax.devices()
        if len(devs) < n:
            raise RuntimeError(
                f"PINTRON_DEVICE_MESH={n} but only {len(devs)} devices")
        _MESH = Mesh(np.array(devs[:n]), ("data",))
    return _MESH


def _sharded_fn(mesh, key, fn, nspecs):
    """Cache the jitted shard_map program per (mesh size, kernel, shape
    bucket) so repeated batches with the same bucket reuse the compiled
    executable instead of retracing a fresh lambda."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:
        from jax.sharding import shard_map
    ck = (len(mesh.devices.ravel()),) + key
    hit = _SHARDED_CACHE.get(ck)
    if hit is not None:
        return hit

    def body(*xs):
        dist = fn(*xs[:-1])
        total = jax.lax.psum(jnp.sum(dist <= xs[-1]), "data")
        return dist, total

    specs = nspecs + (P("data"),)
    prog = jax.jit(shard_map(body, mesh=mesh, in_specs=specs,
                             out_specs=(P("data"), P()),
                             check_rep=False))
    _SHARDED_CACHE[ck] = prog
    return prog


def _sharded_call(mesh, fn, arrays, ub, key=()):
    """Run fn over the mesh with every array sharded on its leading
    (problem) axis, padded to a multiple of the mesh size.  ``ub`` is the
    per-problem error budget, used to psum the global within-budget count
    — a true cross-device collective (the deterministic global-merge
    pattern).  ``key`` identifies the kernel + static shape bucket for
    the compiled-program cache.  Returns (per-problem distances, global
    count)."""
    from jax.sharding import PartitionSpec as P
    n = len(mesh.devices.ravel())
    B = arrays[0].shape[0]
    Bp = ((B + n - 1) // n) * n
    # padded problems get ub = -1 so they can never count as ok
    padded = [np.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))
              for a in arrays]
    ubp = np.pad(np.asarray(ub, dtype=np.int32), (0, Bp - B),
                 constant_values=-1)
    specs = tuple(P("data") if a.ndim == 1 else P("data", None)
                  for a in padded)
    prog = _sharded_fn(mesh, key, fn, specs)
    dist, total = prog(*padded, ubp)
    return np.asarray(dist)[:B], int(total)


# running counters for benchmarks/diagnostics: total problems seen,
# problems actually evaluated on device, and DP cells computed there
STATS = {"problems": 0, "device_problems": 0, "device_cells": 0,
         "batches": 0, "device_runs": 0, "pwm_windows": 0,
         "device_timeouts": 0, "edit_problems": 0, "rb_problems": 0,
         "nw_problems": 0, "gap_problems": 0}


# Forked device-flow children ship their native host-DP cell census
# (pintron_tpu.native.dp_census) back to the parent here, so a parent
# process can report the honest host-vs-device cell split even though
# the children's native counters die with them.
HOST_CENSUS: dict = {}


def reset_stats() -> None:
    # NOTE: deliberately leaves RB_SELF_TUNED_OFF alone — it is a
    # link-quality tuning latch, not a statistic
    for k in STATS:
        STATS[k] = 0
    HOST_CENSUS.clear()


# ---- bounded dispatch ----------------------------------------------------
# A wedged device (hung tunnel, stuck compile) must degrade STEP 2/4 to
# the CPU path instead of hanging the pipeline: every device entry point
# runs under device_call(), a wall-clock-bounded worker thread.  On
# timeout (PINTRON_DEVICE_TIMEOUT_S, default 600 s — first compiles over
# a remote-attached chip can take minutes) or error the call reports
# None, the process-wide wedge latch flips, and all later device calls
# short-circuit to None; callers treat None as "memo not filled", so the
# native cascade recomputes each miss with the byte-identical host DPs.

_WEDGED = False

# Self-tuning latch for the refine-borders offload (stages/est_fact.py):
# flipped when a measured rb device batch costs more than the host rows
# it replaces — i.e. the chip's attachment latency/bandwidth makes this
# family a net loss.  Per-process; PINTRON_DEVICE_RB=1/0 overrides.
RB_SELF_TUNED_OFF = False


def device_wedged() -> bool:
    return _WEDGED


# ---- device-service client -----------------------------------------------
# PINTRON_DEVICE_SERVICE=<unix socket> routes every device op to the
# chip-owning service process (pintron_tpu/devservice.py) instead of a
# local backend: worker processes never initialize JAX, compiled
# executables are cached once for a whole multi-locus sweep, and the
# service merges concurrent workers' batches into single dispatches.
# All service calls run under device_call, so a dead service wedges
# this worker onto the byte-identical host path.

_SERVICE_CONN = None
_SERVICE_LOCK = None

# Guards the FIRST connection: the kband batch (executor thread) and an
# rb/gap batch (main thread) can race into _service_conn while
# _SERVICE_CONN is None — without this lock both would dial, or one
# could observe the connection before its per-call lock exists, and two
# threads interleaving send/recv on one Connection corrupt the pickle
# stream (wedging the worker onto the host path for its lifetime).
import threading as _threading

_SERVICE_INIT_LOCK = _threading.Lock()


def _service_conn():
    global _SERVICE_CONN, _SERVICE_LOCK
    addr = os.environ.get("PINTRON_DEVICE_SERVICE")
    if not addr:
        return None
    if _SERVICE_CONN is None:
        with _SERVICE_INIT_LOCK:
            if _SERVICE_CONN is not None:
                return _SERVICE_CONN
            import time as _t
            from multiprocessing.connection import Client

            from pintron_tpu.devservice import AUTHKEY
            # PINTRON_SERVICE_WAIT_S: tolerate a service that is still
            # booting (multihost spawns it concurrently with the
            # workers); a missing socket after the wait raises ->
            # device_call wedges this worker onto the byte-identical
            # host path
            wait = float(os.environ.get("PINTRON_SERVICE_WAIT_S", "0"))
            deadline = _t.monotonic() + wait
            while True:
                try:
                    conn = Client(addr, family="AF_UNIX",
                                  authkey=AUTHKEY)
                    break
                except (FileNotFoundError, ConnectionRefusedError):
                    if _t.monotonic() >= deadline:
                        raise
                    _t.sleep(0.02)
            # publish the lock BEFORE the connection: a reader that
            # sees the connection must also see its lock
            _SERVICE_LOCK = _threading.Lock()
            _SERVICE_CONN = conn
    return _SERVICE_CONN


def service_eval(op: str, payload):
    """Round-trip one op through the device service.  Returns the
    result, or None when no service is configured.  Raises on service
    errors (device_call turns that into a host fallback)."""
    conn = _service_conn()
    if conn is None:
        return None
    with _SERVICE_LOCK:
        conn.send((op, payload))
        status, res = conn.recv()
    if status != "ok":
        raise RuntimeError(f"device service: {res}")
    return res


def pwm_scores_batched(rows, wpwm, den):
    """PWM scores via the service when configured, else the local op.
    Same contract as ops.pwm.pwm_scores (f32, HIGHEST precision).  The
    batch axis is padded to a power of two before the device op: every
    distinct batch size is a fresh XLA compile, ruinous over a
    remote-compile tunnel."""
    r = service_eval("pwm", (rows, wpwm, float(den)))
    if r is not None:
        return r
    enable_compile_cache()
    from pintron_tpu.ops.pwm import pwm_scores
    B = rows.shape[0]
    Bp = _p2(B, lo=64)
    if Bp != B:
        rows = np.pad(rows, ((0, Bp - B), (0, 0)))
    return np.asarray(pwm_scores(rows, wpwm,
                                 denominator=float(den)))[:B]


_CACHE_SET = False


def enable_compile_cache() -> None:
    """Point JAX at the persistent compilation cache (idempotent).
    First compiles over a remote-attached chip cost tens of seconds;
    the disk cache makes every later process warm for the standard
    shape buckets.  PINTRON_COMPILE_CACHE overrides the location;
    PINTRON_COMPILE_CACHE=0 disables."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    cache_dir = os.environ.get("PINTRON_COMPILE_CACHE",
                               "/tmp/pintron-xla-cache")
    if cache_dir in ("", "0"):
        return
    try:
        import jax
        # one cache per backend: a CPU AOT result compiled for another
        # host's ISA must never be served to this one (SIGILL risk),
        # and accelerator entries are useless to the CPU client anyway
        cache_dir = os.path.join(cache_dir, jax.default_backend())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass


def device_call(fn, *args, what: str = "device batch"):
    """Run fn(*args) bounded by the device dispatch timeout.  Returns
    its result, or None on timeout/error (wedge latch set)."""
    global _WEDGED
    if _WEDGED:
        return None
    timeout = float(os.environ.get("PINTRON_DEVICE_TIMEOUT_S", "600"))
    if timeout <= 0:  # explicit opt-out: unbounded inline call
        return fn(*args)
    import threading
    box: dict = {}

    def work():
        try:
            box["ok"] = fn(*args)
        except Exception as e:  # noqa: BLE001 - degrade, don't crash
            box["err"] = e

    t = threading.Thread(target=work, daemon=True,
                         name="pintron-device-dispatch")
    t.start()
    t.join(timeout)
    if t.is_alive():
        _WEDGED = True
        STATS["device_timeouts"] += 1
        import logging
        logging.getLogger("pintron").warning(
            "%s exceeded the %.0fs device dispatch timeout; falling "
            "back to the CPU path for the rest of this process", what,
            timeout)
        return None
    if "err" in box:
        _WEDGED = True
        import logging
        logging.getLogger("pintron").warning(
            "%s failed (%s: %s); falling back to the CPU path", what,
            type(box["err"]).__name__, box["err"])
        return None
    return box.get("ok")


def eval_edit_batch(pairs: List[Tuple[bytes, bytes]]):
    """Bounded entry point: batched full unit-cost edit distances
    (reference edit_distance, refine.c:50-83 semantics — the same
    recurrence the host ``factorize.alignments.edit_distance``
    computes).  Used for the predicted-introns donor/acceptor
    error stats (main-intron-agreement.c:804-904), where every
    (intron, supporting-EST) pair contributes two independent <=15nt
    window distances — thousands of problems, one dispatch.  Returns
    int32 distances, or None when the device is wedged/unavailable
    (callers recompute on host)."""
    return device_call(_eval_edit_batch_device, pairs,
                       what="edit-distance device batch")


def _eval_edit_batch_device(pairs: List[Tuple[bytes, bytes]]
                            ) -> np.ndarray:
    out = np.zeros(len(pairs), dtype=np.int64)
    rest = []
    for i, (a, b) in enumerate(pairs):
        if a == b:
            continue  # distance 0, no DP
        # seq1 = the longer string (columns), seq2 = rows
        if len(a) < len(b):
            a, b = b, a
        rest.append((i, a, b))
    STATS["problems"] += len(pairs)
    if not rest:
        return out

    r = service_eval("edit", [(a, b) for _, a, b in rest])
    if r is not None:
        STATS["device_problems"] += len(rest)
        STATS["edit_problems"] += len(rest)
        STATS["device_cells"] += sum(
            len(a) * len(b) for _, a, b in rest)
        for (i, _a, _b), v in zip(rest, r):
            out[i] = int(v)
        return out
    enable_compile_cache()
    from pintron_tpu.ops.align import batch_edit_distance_score

    groups = {}
    for i, a, b in rest:
        groups.setdefault((_p4(len(a)), _p4(max(len(b), 1))),
                          []).append((i, a, b))
    pending = []
    for (N, M), items in sorted(groups.items()):
        Bp = _p2(len(items), lo=64)
        s1, l1 = _encode([a for _, a, _ in items], N, rows=Bp)
        s2, l2 = _encode([b for _, _, b in items], M, rows=Bp)
        r = batch_edit_distance_score(s1, l1, s2, l2, max_rows=M)
        pending.append((items, r))
        STATS["device_problems"] += len(items)
        STATS["edit_problems"] = (STATS.get("edit_problems", 0)
                                  + len(items))
        STATS["device_cells"] += sum(
            len(a) * len(b) for _, a, b in items)
        STATS["batches"] += 1
    for items, r in pending:
        rn = np.asarray(r)
        for (i, _a, _b), dist in zip(items, rn):
            out[i] = int(dist)
    return out


NW_SELF_TUNED_OFF = False
GAP_SELF_TUNED_OFF = False

# ---- self-tuning with hysteresis ----------------------------------------
# The rb/nw/gap offload families time their own batches against a host
# cost estimate and latch OFF when the chip's attachment link makes a
# family a net loss.  The latch must not be a life sentence: the first
# batches over a remote link are the COLDEST (fresh compiles, empty
# service caches, un-warmed merge window), so every
# TUNE_REPROBE_EVERY-th skipped opportunity runs anyway as a re-probe
# and the measured cost clears or confirms the latch
# (tune_report): a latch set by a temporarily cold link recovers once
# the link warms.

TUNE_REPROBE_EVERY = 8
_TUNE_SKIPS = {"rb": 0, "nw": 0, "gap": 0, "kband": 0}
# A probe stays ARMED until a measurement lands: tuned_off may be
# consulted several times on the way to one batch (the run-level
# all-latched bypass, then the per-family gate inside the device flow)
# and the armed probe must pass through every gate, not be consumed by
# the first one.
_PROBE_PENDING = {"rb": False, "nw": False, "gap": False,
                  "kband": False}
KBAND_SELF_TUNED_OFF = False


def tuned_off(family: str) -> bool:
    """Latched-off check WITH hysteresis: while latched, every
    TUNE_REPROBE_EVERY-th opportunity ARMS a re-probe; an armed family
    keeps answering False (run the batch) until tune_report records
    the probe's timing."""
    off = {"rb": RB_SELF_TUNED_OFF, "nw": NW_SELF_TUNED_OFF,
           "gap": GAP_SELF_TUNED_OFF,
           "kband": KBAND_SELF_TUNED_OFF}[family]
    if not off:
        return False
    if _PROBE_PENDING[family]:
        return False
    _TUNE_SKIPS[family] += 1
    if _TUNE_SKIPS[family] >= TUNE_REPROBE_EVERY:
        _TUNE_SKIPS[family] = 0
        _PROBE_PENDING[family] = True
        return False
    return True


def tune_report(family: str, elapsed: float, host_est: float) -> None:
    """Record one measured batch for a family: latch it OFF when the
    batch cost at least doubled the host estimate, CLEAR the latch when
    the batch beat 1.2x the estimate (hysteresis band between the two
    thresholds: keep the current state, no flapping)."""
    _PROBE_PENDING[family] = False
    key = f"{family.upper()}_SELF_TUNED_OFF"
    if elapsed > max(2 * host_est, 0.004):
        globals()[key] = True
        _TUNE_SKIPS[family] = 0
    elif elapsed < max(1.2 * host_est, 0.002):
        globals()[key] = False


def eval_gap(problems: List[Tuple[bytes, bytes]]):
    """Bounded entry point: batched 3-matrix L/G/R gap alignments WITH
    traceback for the intron-refinement family (refine-intron.c:560-806
    — the single largest DP family in the cascade).  Each problem is a
    (est_window, gen_window) pair from est_collect_introns; returns
    (sm, ops, nsteps) — per-problem start matrix (int64), traceback op
    codes (int8, from the END backwards, stride = ops.shape[1]) and
    their counts — installed into the window-keyed lookaside
    (ri_lookaside_set) and decoded natively when refine_intron_core's
    lazy probe hits, bit-identical to the host gap_align_run +
    ri_post_align.  None when the device is wedged/unavailable/
    oversized."""
    return device_call(_eval_gap_device, problems,
                       what="gap-align device batch")


def _eval_gap_device(problems: List[Tuple[bytes, bytes]]):
    # packed direction tensors are (B, N, M) int8 in HBM: guard
    # per-problem area (the native collect already enforces this, but
    # the guard keeps direct callers safe) and sub-batch each bucket
    for e, g in problems:
        if len(e) * len(g) > (1 << 21) or len(e) + len(g) > 8192:
            return None
    r = service_eval("gap", problems)
    if r is not None:
        STATS["problems"] += len(problems)
        STATS["device_problems"] += len(problems)
        STATS["gap_problems"] = (STATS.get("gap_problems", 0)
                                 + len(problems))
        STATS["device_cells"] += sum(
            3 * (len(e) + 1) * (len(g) + 1) for e, g in problems)
        return r
    enable_compile_cache()
    from pintron_tpu.ops.align import batch_gap_traceback

    L = max((len(e) + len(g) for e, g in problems), default=1)
    all_sm = np.zeros(len(problems), dtype=np.int64)
    all_ops = np.zeros((len(problems), L), dtype=np.int8)
    all_n = np.zeros(len(problems), dtype=np.int64)
    groups = {}
    for i, (e, g) in enumerate(problems):
        groups.setdefault((_p4(max(len(e), 1)), _p4(max(len(g), 1))),
                          []).append((i, e, g))
    STATS["problems"] += len(problems)
    from pintron_tpu.ops.align import decode_gap_fused

    # launch-then-force: all buckets dispatch before any transfer
    pending = []
    for (N, M), items in sorted(groups.items()):
        sub = max(1, (1 << 28) // max(1, N * M))
        for c0 in range(0, len(items), sub):
            chunk = items[c0:c0 + sub]
            Bp = _p2(len(chunk), lo=16)
            s1, l1 = _encode([e for _, e, _ in chunk], N, rows=Bp)
            s2, l2 = _encode([g for _, _, g in chunk], M, rows=Bp)
            fused = batch_gap_traceback(
                s1, l1, s2, l2, max_n=N, max_m=M)
            pending.append((chunk, fused, N + M))
            STATS["device_problems"] += len(chunk)
            STATS["gap_problems"] = (STATS.get("gap_problems", 0)
                                     + len(chunk))
            STATS["device_cells"] += sum(
                3 * (len(e) + 1) * (len(g) + 1) for _, e, g in chunk)
            STATS["batches"] += 1
    for chunk, fused, width in pending:
        sm, ops, nsteps = decode_gap_fused(fused, width)
        for j, (i, e, g) in enumerate(chunk):
            w = min(len(e) + len(g), ops.shape[1])
            all_ops[i, :w] = ops[j, :w]
            all_sm[i] = int(sm[j])
            all_n[i] = int(nsteps[j])
    return all_sm, all_ops, all_n


def eval_nw(problems: List[Tuple[bytes, bytes]]):
    """Bounded entry point: batched NW alignments WITH traceback for
    the endpoint family (est-factorizations.c:2127-2301 head/tail
    trims).  Each problem is an (est_window, gen_window) pair; returns
    (ops, nsteps) — per-problem traceback op codes (int8, from the END
    of the alignment backwards, stride = ops.shape[1]) and their counts
    — byte-equivalent to the host nw_align_run's alignment when decoded
    (epm_fill_endpoints does that natively).  None when the device is
    wedged/unavailable/oversized."""
    return device_call(_eval_nw_device, problems,
                       what="endpoint NW device batch")


def _eval_nw_device(problems: List[Tuple[bytes, bytes]]):
    # direction tensors are (B, N, M) int8 in HBM: guard per-problem
    # area and sub-batch each bucket so a bucket never materializes
    # more than ~256 MB of directions
    for e, g in problems:
        if len(e) * len(g) > (1 << 21) or len(e) + len(g) > 8192:
            return None
    r = service_eval("nw", problems)
    if r is not None:
        STATS["problems"] += len(problems)
        STATS["device_problems"] += len(problems)
        STATS["nw_problems"] = (STATS.get("nw_problems", 0)
                                + len(problems))
        STATS["device_cells"] += sum(
            len(e) * len(g) for e, g in problems)
        return r
    enable_compile_cache()
    from pintron_tpu.ops.align import batch_nw_traceback

    L = max((len(e) + len(g) for e, g in problems), default=1)
    all_ops = np.zeros((len(problems), L), dtype=np.int8)
    all_n = np.zeros(len(problems), dtype=np.int64)
    groups = {}
    for i, (e, g) in enumerate(problems):
        if e == g:
            # all-diagonal optimum (host shortcut): len(e) diag ops
            all_n[i] = len(e)
            continue
        groups.setdefault((_p4(max(len(e), 1)), _p4(max(len(g), 1))),
                          []).append((i, e, g))
    STATS["problems"] += len(problems)
    from pintron_tpu.ops.align import decode_nw_fused

    # launch-then-force: all buckets dispatch before any transfer
    pending = []
    for (N, M), items in sorted(groups.items()):
        sub = max(1, (1 << 28) // max(1, N * M))
        for c0 in range(0, len(items), sub):
            chunk = items[c0:c0 + sub]
            Bp = _p2(len(chunk), lo=16)
            s1, l1 = _encode([e for _, e, _ in chunk], N, rows=Bp)
            s2, l2 = _encode([g for _, _, g in chunk], M, rows=Bp)
            _score, fused = batch_nw_traceback(
                s1, l1, s2, l2, max_n=N, max_m=M)
            pending.append((chunk, fused, N + M))
            STATS["device_problems"] += len(chunk)
            STATS["nw_problems"] = (STATS.get("nw_problems", 0)
                                    + len(chunk))
            STATS["device_cells"] += sum(
                len(e) * len(g) for _, e, g in chunk)
            STATS["batches"] += 1
    for chunk, fused, width in pending:
        ops, nsteps = decode_nw_fused(fused, width)
        for j, (i, e, g) in enumerate(chunk):
            w = min(len(e) + len(g), ops.shape[1])
            all_ops[i, :w] = ops[j, :w]
            all_n[i] = int(nsteps[j])
    return all_ops, all_n


def eval_rb(problems: List[Tuple[bytes, bytes]]):
    """Bounded entry point: batched refine-borders row tables.  Each
    problem is a (text_window, pattern) pair — the forward or reversed
    pass of one gap problem (refine.c:105-192); the caller submits both
    passes as independent problems.  Returns (vals, pos) int64 arrays
    of shape (n, stride), stride = max(len(pattern)) + 1: per-row
    minima and FIRST minimal positions of the (len(pattern)+1)-row edit
    DP, bit-identical to the host rows.  None when the device is
    wedged/unavailable."""
    return device_call(_eval_rb_device, problems,
                       what="refine-borders device batch")


def _eval_rb_device(problems: List[Tuple[bytes, bytes]]):
    # Size guard FIRST — before the problems can cross the service
    # socket (a None mid-merge on the service would error every merged
    # client).  The bound is on the PADDED bucket: batch_edit_rowmin's
    # argmin encoding needs C = p2(N+2) <= 2**15, and _p4 pads text
    # windows up to 16384; the int16 wire format needs every genuine
    # row value (bounded by lp + tw) below its 32000 clip.
    for t, p in problems:
        if len(t) > 16382 or len(t) + len(p) >= 32000:
            return None   # host DP path handles the oversized windows
    r = service_eval("rb", problems)
    if r is not None:
        STATS["problems"] += len(problems)
        STATS["device_problems"] += len(problems)
        STATS["rb_problems"] = (STATS.get("rb_problems", 0)
                                + len(problems))
        STATS["device_cells"] += sum(
            (len(t) + 1) * (len(p) + 1) for t, p in problems)
        return r
    enable_compile_cache()
    from pintron_tpu.ops.align import batch_edit_rowmin

    n = len(problems)
    stride = max((len(p) for _, p in problems), default=0) + 1
    vals = np.zeros((n, stride), dtype=np.int64)
    pos = np.zeros((n, stride), dtype=np.int64)
    groups = {}
    for i, (t, p) in enumerate(problems):
        groups.setdefault((_p4(max(len(t), 1)), _p4(max(len(p), 1))),
                          []).append((i, t, p))
    STATS["problems"] += len(problems)
    # launch every bucket before forcing any result: dispatch is
    # asynchronous, so the device round trips pipeline
    pending = []
    for (N, M), items in sorted(groups.items()):
        Bp = _p2(len(items), lo=64)
        s1, l1 = _encode([t for _, t, _ in items], N, rows=Bp)
        s2, l2 = _encode([p for _, _, p in items], M, rows=Bp)
        fused = batch_edit_rowmin(s1, l1, s2, l2, max_rows=M)
        pending.append((items, fused, M))
        STATS["device_problems"] += len(items)
        STATS["rb_problems"] = (STATS.get("rb_problems", 0)
                                + len(items))
        STATS["device_cells"] += sum(
            (len(t) + 1) * (len(p) + 1) for _, t, p in items)
        STATS["batches"] += 1
    for items, fused, M in pending:
        f = np.asarray(fused).astype(np.int64)   # (B, 2*(M+1)) fused
        v, q = f[:, :M + 1], f[:, M + 1:]
        for j, (i, t, p) in enumerate(items):
            lp = len(p)
            vals[i, :lp + 1] = v[j, :lp + 1]
            pos[i, :lp + 1] = q[j, :lp + 1]
    return vals, pos


def eval_kband(problems: List[Tuple[bytes, bytes, int]]):
    """Bounded entry point: evaluate the batch on device, or return
    None when the device is wedged/unavailable (the caller skips the
    memo pre-fill and the native cascade recomputes on host)."""
    return device_call(_eval_kband_device, problems,
                       what="K-band device batch")


def _eval_kband_device(problems: List[Tuple[bytes, bytes, int]]
                       ) -> np.ndarray:
    """Evaluate a batch of (gen_window, est_window, max_err) K-band
    problems on the default JAX device.  Returns int64 ok flags with
    ep_kband's exact semantics (dp.c:3862-3878)."""
    # Trivial verdicts (equal strings, zero budget, length gap over
    # budget — ep_kband's short-circuits) are answered HERE: only the
    # residue needing a real DP crosses the service socket or reaches
    # the device.
    ok = np.zeros(len(problems), dtype=np.int64)
    rest = []
    for i, (g, e, ub) in enumerate(problems):
        if len(g) == len(e) and g == e:
            ok[i] = 1
            continue
        if ub == 0:
            continue
        a, b = (g, e) if len(g) >= len(e) else (e, g)
        if len(a) - len(b) > ub:
            continue
        rest.append((i, a, b, ub))
    STATS["problems"] += len(problems)
    if not rest:
        return ok

    r = service_eval("kband", [(a, b, ub) for _, a, b, ub in rest])
    if r is not None:
        STATS["device_problems"] += len(rest)
        STATS["batches"] += 1
        STATS["device_cells"] += sum(
            len(a) * len(b) if 2 * ub + 1 >= len(a)
            else len(b) * (2 * ub + 1)
            for _, a, b, ub in rest)
        for (i, _a, _b, _ub), v in zip(rest, r):
            ok[i] = int(v)
        return ok

    enable_compile_cache()
    import jax

    from pintron_tpu.ops.align import (banded_edit_distance,
                                       batch_edit_distance_score)

    # The Pallas kernel is the production band path: its in-kernel
    # sequence window beats the XLA gather formulation by >=2x at
    # kernel-dominated batch sizes (see pallas_align.py).  On a CPU
    # backend (tests, virtual meshes, multi-process demos) the compiled
    # XLA op runs instead — interpret-mode Pallas is an equivalence-test
    # vehicle, ~100x slower than compiled code (PINTRON_DEVICE_PALLAS=
    # interpret forces it for tests).  PINTRON_DEVICE_XLA=1 opts into
    # the XLA op everywhere.
    on_cpu = jax.default_backend() == "cpu"
    force_interp = os.environ.get("PINTRON_DEVICE_PALLAS") == "interpret"
    use_pallas = (not bool(os.environ.get("PINTRON_DEVICE_XLA"))
                  and (not on_cpu or force_interp))
    pallas_interpret = on_cpu
    full_groups = {}
    band_groups = {}
    for i, a, b, ub in rest:
        n = len(a)
        # Bucketing trades padding waste (device microseconds) against
        # dispatch count (a round trip each): every problem with
        # n <= 1024 shares ONE bucket padded to 1024, and only longer
        # outliers get their own power-of-four class — so a typical
        # batch costs one band + one full dispatch, not one per length
        # class.
        key = 1024 if n <= 1024 else _p4(n)
        if 2 * ub + 1 >= n:
            full_groups.setdefault(key, []).append((i, a, b, ub))
        else:
            band_groups.setdefault(key, []).append((i, a, b, ub))

    mesh = _mesh()

    # Launch every bucket group before forcing any result: JAX dispatch
    # is asynchronous, so later groups' host-side encoding overlaps
    # earlier groups' device compute (and, over a remote-attached chip,
    # the dispatch round-trips pipeline instead of serializing).
    pending = []
    try:
        import jax
        annot = jax.profiler.TraceAnnotation
    except Exception:
        import contextlib
        annot = lambda _name: contextlib.nullcontext()  # noqa: E731

    for N, items in sorted(full_groups.items()):
        M = _p4(max(len(b) for _, _, b, _ in items))
        Bp = _p2(len(items), lo=64)
        s1, l1 = _encode([a for _, a, _, _ in items], N, rows=Bp)
        s2, l2 = _encode([b for _, _, b, _ in items], M, rows=Bp)
        if mesh is not None:
            ubv = np.full(Bp, -1, dtype=np.int32)
            ubv[:len(items)] = [ub for _, _, _, ub in items]
            r, _total = _sharded_call(
                mesh,
                lambda a, b, c, d: batch_edit_distance_score(
                    a, b, c, d, max_rows=M),
                [s1, l1, s2, l2], ubv, key=("full", N, M))
        else:
            with annot("pintron_kband_full"):
                r = batch_edit_distance_score(s1, l1, s2, l2,
                                              max_rows=M)
        pending.append((items, r))
        STATS["device_problems"] += len(items)
        STATS["device_cells"] += sum(
            len(a) * len(b) for _, a, b, _ in items)
        STATS["batches"] += 1

    for N, items in sorted(band_groups.items()):
        M = _p4(max(len(b) for _, _, b, _ in items))
        K = _p2(max(ub for _, _, _, ub in items), lo=2)
        Bp = _p2(len(items), lo=64)
        s1, l1 = _encode([a for _, a, _, _ in items], N, rows=Bp)
        s2, l2 = _encode([b for _, _, b, _ in items], M, rows=Bp)
        band = np.zeros(Bp, dtype=np.int32)
        band[:len(items)] = [ub for _, _, _, ub in items]
        if mesh is not None:
            r, _total = _sharded_call(
                mesh,
                lambda a, b, c, d, e: banded_edit_distance(
                    a, b, c, d, e, max_rows=M, k_max=K),
                [s1, l1, s2, l2, band], band, key=("band", N, M, K))
        elif use_pallas:
            from pintron_tpu.ops.pallas_align import \
                banded_edit_distance_pallas
            with annot("pintron_kband_band"):
                r = banded_edit_distance_pallas(
                    s1, l1, s2, l2, band, max_rows=M, k_max=K,
                    interpret=pallas_interpret)
        else:
            with annot("pintron_kband_band"):
                r = banded_edit_distance(
                    s1, l1, s2, l2, band, max_rows=M, k_max=K)
        pending.append((items, r))
        STATS["device_problems"] += len(items)
        STATS["device_cells"] += sum(
            len(b) * (2 * ub + 1) for _, _a, b, ub in items)
        STATS["batches"] += 1

    for items, r in pending:
        rn = np.asarray(r)
        for (i, _a, _b, ub), dist in zip(items, rn):
            ok[i] = int(dist) <= ub

    return ok
