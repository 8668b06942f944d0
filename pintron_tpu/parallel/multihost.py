"""Multi-process est-fact: the multi-host execution pattern, for real.

The reference is strictly single-host; its only cross-"node" channel is
files on disk (SURVEY §2.5).  This module runs est-fact as N separate
OS processes — the multi-host shape — with the three elements a real
multi-host deployment needs, each actually executed (not argued by
analogy to the fork pool):

  * **disjoint sharding**: process r owns EST units r, r+N, r+2N, ...
    (the per-EST independence axis, main-est-fact.c:249-291) and runs
    the full device flow over its shard;
  * **a global collective carrying real data**: after alignment, every
    process joins a ``jax.distributed`` cluster (Gloo over TCP — the
    DCN stand-in on a CPU platform; ICI collectives on real pods),
    forms one global Mesh, all-reduces its shard's problem/verdict
    counts, AND all-gathers its shard's candidate INTRON SET (derived
    from its own factorizations), merging the gathered sets with a
    deterministic sorted dedup — the SURVEY §2.5 registry-merge
    pattern (all-gather candidate sets -> deterministic merge)
    executed end to end.  Every rank must arrive at the identical
    merged set, and the parent verifies it equals the set derived
    from the merged artifacts (the single-process view);
  * **a deterministic merge**: the parent reassembles the per-unit
    output blobs in unit order, which is exactly the reference's file
    ABI — stage-2 artifacts must come out byte-identical to the
    single-process run for ANY N.

CLI (parent): python -m pintron_tpu.parallel.multihost <workdir> [N]
"""

from __future__ import annotations

import json
import os
import pickle
import socket
import subprocess
import sys
import tempfile
import time

NAMES = ("raw-multifasta-out.txt", "megs.txt", "processed-megs.txt",
         "processed-megs-info.txt", "processed-ests.txt",
         "meg-edges.txt")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _shard_blobs(workdir: str, shard, idx_prefix: str = ""):
    """Run the est-fact device flow over one EST shard; returns
    ([(unit_idx, six_blobs)], stats dict).  Mirrors run_est_fact's
    setup (config + genomic preprocessing + suffix tree).  When the
    parent pre-built the index (idx_prefix), ATTACH it via mmap
    instead of rebuilding — the per-worker index rebuild is the
    reference's process model (main-est-fact.c:224-240) and the
    dominant multi-process fixed cost."""
    from pintron_tpu.config import Config
    from pintron_tpu.index.gst import SuffixTree
    from pintron_tpu.io import multifasta as mf
    from pintron_tpu.stages.est_fact import _run_units_device

    ini = os.path.join(workdir, "config.ini")
    config = Config.from_ini(ini) if os.path.exists(ini) else Config()
    config.validate()
    with open(os.path.join(workdir, "genomic.txt")) as f:
        gen = mf.read_multifasta(f)[0]
    mf.parse_genomic_header(gen)
    mf.ntails_removal(gen)
    gen_seq_bytes = gen.seq.encode("latin1")
    if idx_prefix:
        tree = SuffixTree.load(idx_prefix)
    else:
        tree = SuffixTree(gen_seq_bytes)
    dev = _run_units_device(gen, tree, gen_seq_bytes, config,
                            os.path.join(workdir, "ests.txt"),
                            fresh=True, shard=shard)
    if dev is None:
        raise RuntimeError("device flow unavailable in shard worker")
    import pintron_tpu.ops.offload as off
    return dev, dict(off.STATS)


def _shard_blobs_host(workdir: str, shard, idx_prefix: str = ""):
    """JAX-free shard worker: the native host unit path (byte-identical
    to the device flow) over this rank's units.  This is the scaling
    measurement mode — a long-lived real deployment amortizes the JAX
    runtime boot to zero, so the host-path mode isolates the genuine
    per-shard compute scaling from that per-process harness cost."""
    import pintron_tpu.stages.est_fact as ef
    from pintron_tpu.config import Config
    from pintron_tpu.index.gst import SuffixTree
    from pintron_tpu.io import multifasta as mf

    ini = os.path.join(workdir, "config.ini")
    config = Config.from_ini(ini) if os.path.exists(ini) else Config()
    config.validate()
    with open(os.path.join(workdir, "genomic.txt")) as f:
        gen = mf.read_multifasta(f)[0]
    mf.parse_genomic_header(gen)
    mf.ntails_removal(gen)
    gen_seq_bytes = gen.seq.encode("latin1")
    if idx_prefix:
        tree = SuffixTree.load(idx_prefix)
    else:
        tree = SuffixTree(gen_seq_bytes)
    with open(os.path.join(workdir, "ests.txt")) as fh:
        ests = mf.read_multifasta(fh)
    units = [ef._unit_for_record(gen, e) for e in ests]
    ef._WORKER_CTX = (gen, tree, gen_seq_bytes, config)
    ef._GEN_KEEPALIVE = gen_seq_bytes
    ef._TEXT_KEEPALIVE = tree.text
    try:
        blobs = [(i, ef._process_unit(u)) for i, u in enumerate(units)
                 if i % shard[1] == shard[0]]
    finally:
        ef._WORKER_CTX = None
    return blobs, {"problems": 0, "device_problems": 0}


def _intron_candidates(blobs):
    """Candidate intron set from raw-multifasta factor rows: adjacent
    factors of one factorization with a genomic gap define a candidate
    (gen_end+1, gen_start-1) intron — the registry seed stage 4
    consumes (main-intron-agreement.c:172-287).  Returns a sorted,
    deduped (n, 2) int64 array."""
    import numpy as np
    cands = set()
    for _i, six in blobs:
        prev_ge = None
        for ln in six[0].splitlines():
            if ln.startswith(">"):
                prev_ge = None
                continue
            if not ln or not ln[0].isdigit():
                if ln.startswith("#"):
                    continue
                prev_ge = None
                continue
            parts = ln.split(" ", 4)
            if len(parts) < 4:
                continue
            gs, ge = int(parts[2]), int(parts[3])
            if prev_ge is not None and gs > prev_ge + 1:
                cands.add((prev_ge + 1, gs - 1))
            prev_ge = ge
    if not cands:
        return np.zeros((0, 2), dtype=np.int64)
    return np.array(sorted(cands), dtype=np.int64)


def child_main(argv) -> int:
    rank = int(argv[0])
    nprocs = int(argv[1])
    port = argv[2]
    workdir = argv[3]
    out_path = argv[4]
    idx_prefix = argv[5] if len(argv) > 5 else ""
    mode = argv[6] if len(argv) > 6 else "collective"
    spawn_ts = float(argv[7]) if len(argv) > 7 else 0.0

    if mode == "host":
        # scaling mode: no JAX, no cluster — pure native shard work
        t_boot = time.time() - spawn_ts if spawn_ts else 0.0
        t0 = time.monotonic()
        if idx_prefix:
            deadline = time.monotonic() + 60.0
            while (not os.path.exists(idx_prefix + ".ready")
                   and time.monotonic() < deadline):
                time.sleep(0.005)
            if not os.path.exists(idx_prefix + ".ready"):
                idx_prefix = ""
        t_wait = time.monotonic() - t0
        t0 = time.monotonic()
        blobs, stats = _shard_blobs_host(workdir, (rank, nprocs),
                                         idx_prefix)
        t_shard = time.monotonic() - t0
        with open(out_path, "wb") as f:
            pickle.dump({"rank": rank, "n_global_devices": 0,
                         "n_local_devices": 0, "blobs": blobs,
                         "local_problems": 0,
                         "global_counts": [-1, -1],
                         "timing": {"boot": round(t_boot, 3),
                                    "idx_wait": round(t_wait, 3),
                                    "shard": round(t_shard, 3)}}, f)
        return 0

    # JAX import + cluster join run on a BACKGROUND thread while this
    # thread starts the shard work (MEG enumeration is pure native/host
    # code; the first device batch naturally waits for the import).
    # The ~2 s import plus the Gloo rendezvous would otherwise sit on
    # every worker's critical path — the fixed cost that capped
    # multi-process efficiency.
    import threading
    box: dict = {}

    def _join_cluster():
        try:
            import jax
            jax.distributed.initialize(
                coordinator_address=f"127.0.0.1:{port}",
                num_processes=nprocs, process_id=rank)
            box["ok"] = True
        except BaseException as e:  # noqa: BLE001 - reported below
            box["err"] = e

    th = threading.Thread(target=_join_cluster, daemon=True)
    th.start()
    os.environ["PINTRON_JAX_DEFERRED"] = "1"

    # attach the parent's shared index once it lands (the parent builds
    # it concurrently with our interpreter start); fall back to a local
    # build if it never shows up
    if idx_prefix:
        deadline = time.monotonic() + 60.0
        while (not os.path.exists(idx_prefix + ".ready")
               and time.monotonic() < deadline):
            time.sleep(0.005)
        if not os.path.exists(idx_prefix + ".ready"):
            idx_prefix = ""

    blobs, stats = _shard_blobs(workdir, (rank, nprocs), idx_prefix)
    th.join()
    if "err" in box:
        raise box["err"]
    import jax

    # the cross-process collective: all-reduce this shard's counts over
    # a global mesh spanning every process's devices
    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devs = jax.devices()
    local = jax.local_devices()
    mesh = Mesh(np.array(devs), ("data",))
    counts = np.zeros((len(local), 2), dtype=np.int64)
    counts[0, 0] = stats.get("problems", 0)
    counts[0, 1] = stats.get("device_problems", 0)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), counts)
    gsum = jax.jit(lambda x: jnp.sum(x, axis=0))(garr)
    global_counts = [int(v) for v in np.asarray(gsum)]

    # Candidate-set reduction over the cluster: every rank derives its
    # shard's candidate intron set from its own factorizations,
    # all-gathers the REAL sets (not just counts) over the
    # jax.distributed cluster, and merges them with a deterministic
    # sorted dedup — the SURVEY §2.5 registry-merge pattern executed
    # end to end.  Every rank must arrive at the identical merged set,
    # and the parent re-derives the same set from the merged artifacts.
    from jax.experimental import multihost_utils as mhu

    cand = _intron_candidates(blobs)
    ncand = int(mhu.process_allgather(
        np.array([len(cand)], dtype=np.int64)).max())
    padded = np.full((max(ncand, 1), 2), -1, dtype=np.int64)
    padded[:len(cand)] = cand
    allc = np.asarray(mhu.process_allgather(padded))   # (N, maxn, 2)
    flat = allc.reshape(-1, 2)
    flat = flat[flat[:, 0] >= 0]
    merged = sorted({(int(a), int(b)) for a, b in flat})
    import hashlib as _hl
    merged_digest = _hl.sha256(
        np.array(merged, dtype=np.int64).tobytes()).hexdigest()

    with open(out_path, "wb") as f:
        pickle.dump({"rank": rank,
                     "n_global_devices": len(devs),
                     "n_local_devices": len(local),
                     "blobs": blobs,
                     "local_problems": int(counts[0, 0]),
                     "global_counts": global_counts,
                     "local_candidates": len(cand),
                     "merged_candidates": len(merged),
                     "merged_digest": merged_digest}, f)
    return 0


def run_est_fact_multiprocess(workdir: str, nprocs: int,
                              local_devices: int = 1,
                              timeout: float = 900.0,
                              collective: bool = True) -> dict:
    """Spawn nprocs distributed workers over disjoint EST shards, merge
    their stage-2 artifacts deterministically into ``workdir``, and
    return a report (per-rank stats + the all-reduced global counts,
    which every rank must agree on).

    ``collective=False`` runs the scaling-measurement mode: workers are
    JAX-free native host-path processes (byte-identical outputs, no
    jax.distributed cluster) — isolating shard-compute scaling from the
    per-process JAX runtime boot, which a long-lived deployment
    amortizes but which dominates short runs on a small box."""
    port = _free_port()
    outdir = tempfile.mkdtemp(prefix="pintron-mh-")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{local_devices}").strip()
    # a clean PYTHONPATH drops any accelerator-tunnel sitecustomize so
    # the children really come up on the CPU platform
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # On the CPU stand-in backend only the K-band family pays its way
    # (the gap/nw/rb offloads exist for a real accelerator; their
    # host DPs beat an XLA-CPU round trip every time, which the
    # self-tuner would also conclude — after paying first-batch cost
    # in every worker).  Callers can still force them on.
    for fam in ("GAP", "NW", "RB"):
        env.setdefault(f"PINTRON_DEVICE_{fam}", "0")

    # Shared index: workers attach the flat arrays via mmap (tmpfs
    # when available) instead of each rebuilding — the per-process
    # rebuild is the reference's model and the dominant fixed cost.
    # CONTENT-ADDRESSED by the genomic bytes: repeated runs on a locus
    # (benchmarks, production re-runs) attach instantly instead of
    # rebuilding; a fresh locus builds once, overlapped with the
    # children's interpreter start (they poll the ready sentinel).
    import hashlib

    from pintron_tpu.io import multifasta as mf
    with open(os.path.join(workdir, "genomic.txt")) as f:
        gen = mf.read_multifasta(f)[0]
    mf.parse_genomic_header(gen)
    mf.ntails_removal(gen)
    gen_seq_bytes = gen.seq.encode("latin1")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else outdir
    cache_dir = os.path.join(shm, f"pintron-idx-cache-{os.getuid()}")
    os.makedirs(cache_dir, exist_ok=True)
    idx_prefix = os.path.join(
        cache_dir, hashlib.sha256(gen_seq_bytes).hexdigest()[:24])
    idx_cached = os.path.exists(idx_prefix + ".ready")

    # One shared device service (the per-host accelerator owner in the
    # production multi-host shape): workers never initialize a local
    # JAX backend — the per-process backend init + compile-cache load
    # was the other fixed cost.  Spawned WITHOUT waiting; workers
    # tolerate the boot window (PINTRON_SERVICE_WAIT_S) and a failed
    # service degrades them to the byte-identical host DPs.
    svc_proc = None
    if collective and not env.get("PINTRON_DEVICE_SERVICE"):
        sock = os.path.join(outdir, "dev.sock")
        try:
            svc_proc = subprocess.Popen(
                [sys.executable, "-m", "pintron_tpu.devservice",
                 "--socket", sock], env=env)
            env["PINTRON_DEVICE_SERVICE"] = sock
            env["PINTRON_SERVICE_WAIT_S"] = "30"
        except OSError:
            svc_proc = None

    mode = "collective" if collective else "host"
    procs = []
    outs = []
    for r in range(nprocs):
        out_path = os.path.join(outdir, f"rank{r}.pkl")
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pintron_tpu.parallel.multihost",
             "--child", str(r), str(nprocs), str(port), workdir,
             out_path, idx_prefix, mode, repr(time.time())],
            env=env))

    if not idx_cached:
        try:
            from pintron_tpu.index.gst import SuffixTree
            SuffixTree(gen_seq_bytes).save(idx_prefix)
            with open(idx_prefix + ".ready", "w") as f:
                f.write("ok\n")
        except Exception:
            pass  # workers time out on the sentinel, rebuild locally
    try:
        report = _wait_and_merge(procs, outs, workdir, timeout, nprocs)
        report["collective"] = collective
        return report
    finally:
        # the content-addressed index cache persists (tmpfs: cleared on
        # reboot; re-runs on the same locus attach instantly)
        if svc_proc is not None:
            svc_proc.terminate()
            try:
                svc_proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                svc_proc.kill()


def _wait_and_merge(procs, outs, workdir, timeout, nprocs):
    deadline = time.monotonic() + timeout
    for p in procs:
        left = max(1.0, deadline - time.monotonic())
        try:
            rc = p.wait(timeout=left)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise RuntimeError("multihost worker timed out")
        if rc != 0:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise RuntimeError(f"multihost worker exited rc={rc}")

    merged = {}
    report = {"nprocs": nprocs, "ranks": []}
    globals_seen = set()
    digests_seen = set()
    for out_path in outs:
        with open(out_path, "rb") as f:
            d = pickle.load(f)
        for i, blobs in d["blobs"]:
            merged[i] = blobs
        report["ranks"].append(
            {"rank": d["rank"], "units": len(d["blobs"]),
             "local_problems": d["local_problems"],
             "global_counts": d["global_counts"],
             "n_global_devices": d["n_global_devices"],
             "local_candidates": d.get("local_candidates"),
             "timing": d.get("timing")})
        globals_seen.add(tuple(d["global_counts"]))
        if d.get("merged_digest") is not None:
            digests_seen.add((d["merged_candidates"],
                              d["merged_digest"]))
    if len(globals_seen) != 1:
        raise AssertionError(
            f"ranks disagree on the all-reduced counts: {globals_seen}")
    report["global_counts"] = list(globals_seen.pop())
    if digests_seen:
        # the candidate-set collective: every rank must have merged the
        # all-gathered intron sets into the identical global set, and
        # that set must equal the one derived from the merged artifacts
        # (the single-process view) — a real cross-process reduction of
        # candidate DATA, verified end to end
        if len(digests_seen) != 1:
            raise AssertionError(
                f"ranks disagree on the merged candidate introns: "
                f"{digests_seen}")
        n_merged, digest = digests_seen.pop()
        ordered_blobs = [(i, merged[i]) for i in sorted(merged)]
        ref_cand = _intron_candidates(ordered_blobs)
        import hashlib as _hl
        ref_digest = _hl.sha256(ref_cand.tobytes()).hexdigest()
        if (len(ref_cand), ref_digest) != (n_merged, digest):
            raise AssertionError(
                "collectively merged candidate introns differ from the "
                "single-process derivation")
        report["merged_candidate_introns"] = n_merged

    ordered = [merged[i] for i in sorted(merged)]
    from pintron_tpu.utils import write_text
    for k, name in enumerate(NAMES):
        write_text(os.path.join(workdir, name),
                   "".join(b[k] for b in ordered))
    return report


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "--child":
        return child_main(argv[1:])
    if not argv:
        print("usage: multihost <workdir> [nprocs]")
        return 2
    collective = "--host" not in argv
    argv = [a for a in argv if a != "--host"]
    workdir = argv[0]
    nprocs = int(argv[1]) if len(argv) > 1 else 2
    report = run_est_fact_multiprocess(workdir, nprocs,
                                       collective=collective)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
