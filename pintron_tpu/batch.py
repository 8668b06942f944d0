"""Multi-locus batch driver (`python -m pintron_tpu.batch`).

The reference processes one genomic locus per invocation; production
annotation sweeps run thousands of loci.  This driver runs the full
pipeline for many (genomic, ests) pairs concurrently — one worker
process per locus (each with its own working directory, so the stage
ABI files never collide), results summarized as one JSON line per job.

Manifest: a TSV with one job per line,
    workdir<TAB>genomic_path<TAB>ests_path<TAB>gene[<TAB>organism]
Relative input paths are interpreted against the manifest's directory.
Outputs land in each job's workdir as `pintron-full-output.json` and
`pintron-all-isoforms.gtf`.

Example:
    python -m pintron_tpu.batch --manifest jobs.tsv --jobs 4 \
        --summary results.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _run_job(job):
    """Worker entry: run one pipeline; never raise (report instead)."""
    workdir, genomic, ests, gene, organism = job
    t0 = time.time()
    try:
        os.makedirs(workdir, exist_ok=True)
        import shutil

        shutil.copyfile(genomic, os.path.join(workdir, "genomic.txt"))
        shutil.copyfile(ests, os.path.join(workdir, "ests.txt"))
        from pintron_tpu.pipeline import pintron_pipeline

        pintron_pipeline(workdir=workdir, gene=gene, organism=organism,
                         keep_intermediate=False)
        out = os.path.join(workdir, "pintron-full-output.json")
        n_isoforms = n_introns = None
        try:
            with open(out) as f:
                d = json.load(f)
            n_isoforms = len(d.get("isoforms", {}))
            n_introns = len(d.get("introns", {}))
        except Exception:
            pass
        return {"workdir": workdir, "gene": gene, "ok": True,
                "seconds": round(time.time() - t0, 2),
                "isoforms": n_isoforms, "introns": n_introns}
    except Exception as e:  # noqa: BLE001 - batch jobs must not kill peers
        return {"workdir": workdir, "gene": gene, "ok": False,
                "seconds": round(time.time() - t0, 2),
                "error": f"{type(e).__name__}: {e}"}


def _job_worker(q, job):
    """Module-level so the spawn context can pickle it."""
    q.put(_run_job(job))


def read_manifest(path: str):
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p):
        return p if os.path.isabs(p) else os.path.join(base, p)

    jobs = []
    with open(path) as f:
        for ln, raw in enumerate(f, start=1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) < 4:
                raise ValueError(f"{path}:{ln}: need workdir, genomic, "
                                 f"ests, gene[, organism]")
            workdir = resolve(parts[0])
            genomic = resolve(parts[1])
            ests = resolve(parts[2])
            gene = parts[3]
            organism = parts[4] if len(parts) > 4 else "unknown"
            jobs.append((workdir, genomic, ests, gene, organism))
    return jobs


def _start_service(timeout_s: float = 120.0):
    """Spawn the device service, wait for its socket, export
    PINTRON_DEVICE_SERVICE.  Returns the process, or None on failure
    (workers then fall back to in-process/host paths)."""
    import subprocess
    import sys
    import tempfile
    import time as _t

    sock = os.path.join(tempfile.mkdtemp(prefix="pintron-svc-"),
                        "dev.sock")
    ready = sock + ".ready"
    try:
        proc = subprocess.Popen(
            [sys.executable, "-m", "pintron_tpu.devservice",
             "--socket", sock, "--ready-file", ready])
    except OSError:
        return None
    t0 = _t.monotonic()
    while _t.monotonic() - t0 < timeout_s:
        if os.path.exists(ready) and os.path.exists(sock):
            os.environ["PINTRON_DEVICE_SERVICE"] = sock
            # drop any connection cached against a PREVIOUS service
            # (and the wedge latch a dead one may have tripped): a
            # stale socket would error every call and wedge this
            # process onto the host path for its lifetime
            import pintron_tpu.ops.offload as off
            off._SERVICE_CONN = None
            off._SERVICE_LOCK = None
            off._WEDGED = False
            return proc
        if proc.poll() is not None:
            return None
        _t.sleep(0.1)
    proc.terminate()
    return None


def _stop_service(proc) -> None:
    sock = os.environ.pop("PINTRON_DEVICE_SERVICE", None)
    try:
        import pintron_tpu.ops.offload as off
        off._SERVICE_CONN = None
        off._SERVICE_LOCK = None
    except Exception:
        pass
    if proc is None:
        return
    try:
        if sock:
            from multiprocessing.connection import Client

            from pintron_tpu.devservice import AUTHKEY
            conn = Client(sock, family="AF_UNIX", authkey=AUTHKEY)
            conn.send(("shutdown", None))
            # bounded wait: a service wedged inside a hung dispatch
            # never reaches the queued shutdown — terminate it instead
            # of hanging the driver
            if conn.poll(15):
                conn.recv()
            conn.close()
        proc.wait(timeout=15)
    except Exception:
        proc.terminate()
        try:
            proc.wait(timeout=5)
        except Exception:
            proc.kill()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pintron-batch")
    p.add_argument("--manifest", required=True,
                   help="TSV: workdir, genomic, ests, gene[, organism]")
    p.add_argument("--jobs", type=int, default=0,
                   help="concurrent loci (default: cpu count)")
    p.add_argument("--summary", default="",
                   help="write one JSON line per job to this file")
    args = p.parse_args(argv)

    jobs = read_manifest(args.manifest)
    n_jobs = args.jobs or (os.cpu_count() or 1)
    # each pipeline already data-parallelizes ESTs across workers; cap
    # the per-locus pool so locus-level and EST-level parallelism do not
    # oversubscribe the machine
    per_locus = max(1, (os.cpu_count() or 1) // max(1, min(n_jobs,
                                                           len(jobs))))
    os.environ.setdefault("PINTRON_EST_WORKERS", str(per_locus))

    # Device mode: start ONE chip-owning service for the whole sweep
    # (pintron_tpu/devservice.py) and point every worker at it.  The
    # workers' device batches merge across loci into single dispatches,
    # compiled executables are cached once, and a worker blocked on a
    # device round trip yields its core to another locus — with more
    # jobs in flight than cores, device latency hides behind host work.
    service_proc = None
    if os.environ.get("PINTRON_DEVICE") \
            and not os.environ.get("PINTRON_DEVICE_SERVICE"):
        service_proc = _start_service()
        if service_proc and args.jobs == 0:
            n_jobs = 2 * (os.cpu_count() or 1)

    import multiprocessing

    # hand-managed non-daemonic workers: each pipeline forks its own
    # guard children and EST worker pool, which multiprocessing.Pool's
    # daemonic workers are not allowed to do
    ctx = multiprocessing.get_context("spawn")
    results = []
    t0 = time.time()

    pending = list(jobs)
    procs = []
    q = ctx.Queue()
    max_conc = min(n_jobs, max(1, len(jobs)))
    while len(results) < len(jobs):
        while pending and len(procs) - len(results) < max_conc:
            job = pending.pop(0)
            proc = ctx.Process(target=_job_worker, args=(q, job))
            proc.start()
            procs.append(proc)
        try:
            res = q.get(timeout=10)
        except Exception:
            # a worker may have died before reporting (OOM kill, crash):
            # synthesize failures for dead silent workers so the driver
            # cannot hang
            alive = sum(1 for p in procs if p.is_alive())
            if alive == 0 and len(results) < len(procs):
                for _ in range(len(procs) - len(results)):
                    res = {"ok": False, "error": "worker died silently"}
                    results.append(res)
                    print(json.dumps(res), flush=True)
            continue
        results.append(res)
        print(json.dumps(res), flush=True)
    for proc in procs:
        proc.join()
    _stop_service(service_proc)
    ok = sum(1 for r in results if r["ok"])
    summary = {"jobs": len(jobs), "ok": ok, "failed": len(jobs) - ok,
               "seconds": round(time.time() - t0, 2)}
    print(json.dumps(summary))
    if args.summary:
        with open(args.summary, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")
    return 0 if ok == len(jobs) else 1


if __name__ == "__main__":
    sys.exit(main())
