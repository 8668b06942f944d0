"""Chip-owning device service: ONE process owns the accelerator and
aggregates DP batches from many pipeline workers.

Why: the production offload dispatches small batches (hundreds of
problems) whose device time is microseconds, but each dispatch over a
remote-attached chip costs a ~25 ms round trip, and every worker
process would separately pay backend init + first-compile (tens of
seconds over the tunnel).  In a multi-locus run
(`python -m pintron_tpu.batch`) that made PINTRON_DEVICE=1 strictly
slower than the CPU path.  The reference analogue of this shape is the
per-EST independence of main-est-fact.c:249-291 — EST/locus units share
nothing, so their device problems can ride one queue.

Design:
  * the service process (this module) initializes JAX once, listens on
    a Unix socket, and serves three batched ops — "kband" (noisy-exon
    K-band verdicts), "edit" (full unit-cost edit distances), "pwm"
    (MatInspector window scores);
  * requests arriving within a small window (PINTRON_SERVICE_WINDOW_MS,
    default 4 ms) are MERGED per op into one device batch — the
    existing shape-bucketing in ops/offload.py then turns the merged
    cross-loci problem list into a handful of dispatches;
  * workers (ops/offload.py clients) never initialize a local backend;
    compiled executables are cached in the service for the whole sweep;
  * every client call is wrapped by ops.offload.device_call, so a dead
    or wedged service degrades that worker to the byte-identical host
    DPs instead of hanging it.

Numerical contract: the service evaluates with the same kernels the
in-process path uses, so results are bit-identical regardless of how
requests were merged (each op is elementwise over problems).

CLI: python -m pintron_tpu.devservice --socket /tmp/pintron-dev.sock
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
from multiprocessing.connection import Listener

AUTHKEY = b"pintron-devservice"

STATS = {"requests": 0, "merged_batches": 0, "problems": 0,
         "kband_problems": 0, "edit_problems": 0, "pwm_windows": 0,
         "errors": 0}


def _eval_group(op: str, payloads: list):
    """Evaluate one op's merged payload list; returns per-payload
    results (same order)."""
    import numpy as np

    from pintron_tpu.ops import offload

    def merged_eval(stat_key, eval_fn, slice_fn):
        counts = [len(p) for p in payloads]
        merged = [pr for p in payloads for pr in p]
        STATS[stat_key] = STATS.get(stat_key, 0) + len(merged)
        res = eval_fn(merged)
        if res is None:
            # an evaluator declined the merged batch (e.g. an oversized
            # problem): error EVERY merged client rather than crash the
            # dispatcher — their device_call falls back to host
            raise ValueError(f"{op}: merged batch declined by evaluator")
        out, i = [], 0
        for p, c in zip(payloads, counts):
            out.append(slice_fn(res, i, c, p))
            i += c
        return out

    if op == "kband":
        return merged_eval("kband_problems", offload._eval_kband_device,
                           lambda r, i, c, p: r[i:i + c])
    if op == "edit":
        return merged_eval("edit_problems",
                           offload._eval_edit_batch_device,
                           lambda r, i, c, p: r[i:i + c])
    if op == "nw":
        def nw_slice(r, i, c, p):
            ops, nsteps = r
            w = max((len(e) + len(g) for e, g in p), default=1)
            return (ops[i:i + c, :w].copy(), nsteps[i:i + c].copy())
        return merged_eval("nw_problems", offload._eval_nw_device,
                           nw_slice)
    if op == "gap":
        def gap_slice(r, i, c, p):
            sm, ops, nsteps = r
            w = max((len(e) + len(g) for e, g in p), default=1)
            return (sm[i:i + c].copy(), ops[i:i + c, :w].copy(),
                    nsteps[i:i + c].copy())
        return merged_eval("gap_problems", offload._eval_gap_device,
                           gap_slice)
    if op == "rb":
        def rb_slice(r, i, c, p):
            vals, pos = r
            stride = max((len(pat) for _, pat in p), default=0) + 1
            return (vals[i:i + c, :stride].copy(),
                    pos[i:i + c, :stride].copy())
        return merged_eval("rb_problems", offload._eval_rb_device,
                           rb_slice)
    if op == "pwm":
        # merge payloads with identical (pwm matrix, denominator);
        # pwm_scores_batched pads the batch axis to a power of two so
        # merged sizes don't multiply compiled shapes
        groups = {}
        for idx, (rows, wpwm, den) in enumerate(payloads):
            key = (wpwm.tobytes(), float(den), rows.shape[1])
            groups.setdefault(key, []).append((idx, rows, wpwm, den))
        out = [None] * len(payloads)
        for items in groups.values():
            allrows = np.concatenate([r for _, r, _, _ in items], axis=0)
            STATS["pwm_windows"] += allrows.shape[0]
            scores = offload.pwm_scores_batched(
                allrows, items[0][2], float(items[0][3]))
            i = 0
            for idx, rows, _, _ in items:
                out[idx] = scores[i:i + rows.shape[0]]
                i += rows.shape[0]
        return out
    raise ValueError(f"unknown op {op!r}")


def _conn_reader(conn, q):
    while True:
        try:
            req = conn.recv()
        except (EOFError, OSError):
            return
        q.put((conn, req))


def serve(socket_path: str, window_ms: float = None,
          ready_file: str = None) -> None:
    if window_ms is None:
        window_ms = float(os.environ.get("PINTRON_SERVICE_WINDOW_MS",
                                         "4"))
    # never route to ourselves: the service evaluates locally even when
    # spawned from an environment that points workers at this socket
    os.environ.pop("PINTRON_DEVICE_SERVICE", None)

    # Persistent XLA compilation cache: first compiles over a
    # remote-attached chip can cost minutes; caching them on disk makes
    # every later service start warm for the standard shape buckets.
    from pintron_tpu.ops.offload import enable_compile_cache
    enable_compile_cache()
    try:
        os.unlink(socket_path)
    except OSError:
        pass
    listener = Listener(socket_path, family="AF_UNIX", authkey=AUTHKEY)

    q: "queue.Queue" = queue.Queue()
    stop = threading.Event()

    def accept_loop():
        while not stop.is_set():
            try:
                conn = listener.accept()
            except (OSError, EOFError):
                if stop.is_set():
                    return
                continue
            threading.Thread(target=_conn_reader, args=(conn, q),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()
    if ready_file:
        with open(ready_file, "w") as f:
            f.write("ready\n")

    while True:
        conn, req = q.get()
        if req[0] == "shutdown":
            try:
                conn.send(("ok", dict(STATS)))
            except OSError:
                pass
            break
        # gather more requests inside the merge window
        batch = [(conn, req)]
        deadline = time.monotonic() + window_ms / 1000.0
        while True:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                c2, r2 = q.get(timeout=left)
            except queue.Empty:
                break
            if r2[0] == "shutdown":
                q.put((c2, r2))   # handle after this batch
                break
            batch.append((c2, r2))

        STATS["requests"] += len(batch)
        by_op = {}
        for c, (op, payload) in batch:
            by_op.setdefault(op, []).append((c, payload))
        debug = os.environ.get("PINTRON_SERVICE_DEBUG")
        for op, items in by_op.items():
            STATS["merged_batches"] += 1
            t_ev = time.monotonic()
            try:
                results = _eval_group(op, [p for _, p in items])
                if debug:
                    print(f"[devservice] {op} x{len(items)} "
                          f"{time.monotonic() - t_ev:.2f}s",
                          file=sys.stderr, flush=True)
                for (c, _), res in zip(items, results):
                    try:
                        c.send(("ok", res))
                    except OSError:
                        pass
            except Exception as e:  # noqa: BLE001 - reply, don't die
                STATS["errors"] += 1
                msg = f"{type(e).__name__}: {e}"
                for c, _ in items:
                    try:
                        c.send(("err", msg))
                    except OSError:
                        pass

    stop.set()
    listener.close()
    stats_path = os.environ.get("PINTRON_SERVICE_STATS")
    if stats_path:
        with open(stats_path, "w") as f:
            json.dump(STATS, f)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pintron-devservice")
    p.add_argument("--socket", required=True)
    p.add_argument("--window-ms", type=float, default=None)
    p.add_argument("--ready-file", default=None)
    args = p.parse_args(argv)
    serve(args.socket, window_ms=args.window_ms,
          ready_file=args.ready_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
